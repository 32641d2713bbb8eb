"""Additional TPC-H-style analogues: Q6 (filter-agg), Q12 (conditional
counts), Q14 (ratio of conditional revenue), Q19 (disjunctive predicate
blocks). These exercise predicate simplification, conditional
aggregation, and OR-of-ANDs pushdown shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register

DEC = "decimal(18,2)"


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: tight scan-filter-agg — every predicate reaches the "
    "parquet scan, zero joins/shuffles beyond the final reduce.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    doc="TPC-H Q12 analogue: join + conditional-count aggregation.",
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT ROUND(
        100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                  THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
                  ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE),
        4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-07-01 00:00:00'
    """,
    doc="TPC-H Q14: conditional-revenue ratio over an AQE-sized dim join.",
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0).cast("decimal(28,4)"))
    return (
        # part is not broadcast-forced: AQE picks (at 100 TB part is tens
        # of GB; at bench SF it still auto-broadcasts under the threshold)
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 4
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q7_nation_pair_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           year(l.l_shipdate) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE cn.n_name != sn.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND cn.n_nationkey < 5 AND sn.n_nationkey < 5
    GROUP BY cust_nation, supp_nation, ship_year
    ORDER BY cust_nation, supp_nation, ship_year
    """,
    doc="TPC-H Q7 analogue: cross-nation trade volume — two aliases of "
    "the same dim joined on different keys (alias hygiene + reordering).",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation"))
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        li.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        # customer/supplier are NOT broadcast-forced: at 100 TB they are
        # hundreds of GB — let AQE pick the strategy (it still broadcasts
        # them at small SF where they fit under the threshold)
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .where(
            (F.col("cust_nation") != F.col("supp_nation"))
            & (F.col("cn_key") < 5)
            & (F.col("sn_key") < 5)
        )
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(rev).cast("double").alias("volume"))
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@register(
    "q9_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           year(o.o_orderdate) AS order_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
                    - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2)) * CAST(0.4 AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%bolt%'
    GROUP BY nation, order_year
    ORDER BY nation, order_year DESC
    """,
    doc="TPC-H Q9 analogue: profit (revenue - synthetic supply cost) per "
    "supplier nation per year; 5-way join with a LIKE-filtered part dim.",
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "orders", "nation"))
    parts = t["part"].where(F.col("p_name").like("%bolt%"))
    profit = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC) - F.col(
        "p_retailprice"
    ).cast(DEC) * F.col("l_quantity").cast(DEC) * F.lit(0.4).cast(DEC)
    return (
        t["lineitem"]
        # part/supplier sized by AQE, not forced (LIKE selectivity is
        # unknowable to the planner; a wrong forced broadcast OOMs executors)
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("order_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", F.col("order_year").desc())
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 50)
    """,
    doc="TPC-H Q19 analogue: OR-of-ANDs predicate blocks over an "
    "equi-join (tests CNF extraction of the common join key).",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))

    def block(brand: str, size_lo: int, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .where(block("Brand#1", 1, 15, 1, 21) | block("Brand#2", 10, 30, 10, 40) | block("Brand#3", 20, 50, 20, 50))
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count("*").alias("n"))
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey AND o.o_orderpriority != '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 analogue: distribution of per-customer order counts "
    "(left join keeps zero-order customers; join predicate, not WHERE, "
    "carries the priority filter) — the two-level aggregation shape.",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    o = t["orders"].where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_totalprice DESC, o.o_orderkey
    """,
    doc="TPC-H Q18 analogue: large-volume orders via IN over a grouped "
    "HAVING subquery — Catalyst plans the IN as a semi-join against the "
    "aggregated order totals (aggregate-then-join, no double scan of "
    "the join output).",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    li = t["lineitem"]
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("tq"))
        .where(F.col("tq") > 250)
        .select("l_orderkey")
    )
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(big_orders.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast(DEC).cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "q21_sole_returning_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey != l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H Q21 analogue (returnflag standing in for the reduced "
    "schema's missing receipt/commit dates): suppliers who were the "
    "SOLE returning supplier on a multi-supplier finished order — the "
    "correlated EXISTS + NOT-EXISTS double-decorrelation shape, the "
    "hardest TPC-H subquery pattern.",
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("supplier", "lineitem", "orders"))
    return spark.sql(
        """
        SELECT s.s_name, COUNT(*) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey != l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3
              WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey != l1.l_suppkey
                AND l3.l_returnflag = 'R'
          )
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        """
    )


@register(
    "q22_dormant_rich_customers",
    oracle="""
    SELECT c.c_nationkey AS nation,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
    )
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY nation
    """,
    doc="TPC-H Q22 analogue (nationkey standing in for phone country "
    "code): above-average-balance customers with no order since "
    "2000-01-01 — scalar avg subquery + anti-join, the "
    "dormant-high-value-accounts shape.",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_nationkey AS nation,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
        )
        AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c.c_nationkey
        ORDER BY nation
        """
    )


@register(
    "q4_order_priority_checking",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 analogue: priority counts for orders with at least one "
    "returned line in a quarter (EXISTS planned as a semi-join; "
    "returnflag stands in for the reduced schema's commit/receipt "
    "lateness predicate).",
)
def q4_order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    returned = t["lineitem"].where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q10_returned_item_reporting",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 analogue: top-20 customers by returned-item revenue "
    "in a half-year — 4-way join, fixed-dim broadcast on nation only, "
    "revenue rollup + global top-k.",
)
def q10_returned_item_reporting(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
               MIN(l.l_extendedprice) AS min_price
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY 1, 2
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey, ps.min_price
    FROM ps
    JOIN part p     ON p.p_partkey = ps.partkey
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size <= 5
      AND ps.min_price = (SELECT MIN(ps2.min_price) FROM ps ps2
                          WHERE ps2.partkey = ps.partkey)
    ORDER BY s.s_acctbal DESC, nation, s.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 analogue (no partsupp table in this dataset — "
    "per-(part,supplier) MIN offered price from lineitem stands in for "
    "ps_supplycost): region-filtered supplier pool, correlated MIN "
    "subquery selecting the cheapest supplier(s) per part. Spark plans "
    "the correlation as a window-MIN over the aggregated pair table — "
    "one shuffle, no re-join with a subquery.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation", "region"))
    eu_sup = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "EUROPE")),
              F.col("r_regionkey") == F.col("n_regionkey"))
    )
    ps = (
        t["lineitem"]
        .join(eu_sup.select("s_suppkey"), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.min("l_extendedprice").alias("min_price"))
    )
    best = ps.withColumn(
        "__best", F.min("min_price").over(W.partitionBy("partkey"))
    ).where(F.col("min_price") == F.col("__best"))
    return (
        best.join(t["part"].where(F.col("p_size") <= 5),
                  F.col("p_partkey") == F.col("partkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("suppkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_acctbal", "s_name", F.col("n_name").alias("nation"),
                "p_partkey", "min_price")
        .orderBy(F.col("s_acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_national_market_share",
    oracle="""
    SELECT year(o.o_orderdate) AS o_year,
           ROUND(
               CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                             THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))
                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE),
               6) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    GROUP BY o_year
    ORDER BY o_year
    """,
    doc="TPC-H Q8 analogue: one nation's share of yearly revenue for a "
    "part type sold into a region — 8-way star join (two roles for "
    "nation), conditional-sum ratio. Dims broadcast; the fact table "
    "shuffles once for the year aggregate.",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(
        spark, sf_dir,
        ("lineitem", "part", "orders", "customer", "nation", "region", "supplier"),
    )
    n1 = t["nation"].select(F.col("n_nationkey").alias("c_nkey"),
                            F.col("n_regionkey").alias("c_rkey"))
    n2 = t["nation"].select(F.col("n_nationkey").alias("s_nkey"),
                            F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount")).cast(DEC)
    nat_vol = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(F.lit(0).cast(DEC))
    return (
        t["lineitem"]
        .join(t["part"].where(F.col("p_type") == "ECONOMY"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("c_nkey") == F.col("c_nationkey"))
        .join(F.broadcast(t["region"].where(F.col("r_name") == "AMERICA")),
              F.col("r_regionkey") == F.col("c_rkey"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("s_nkey") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat_vol).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey AS partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) AS value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
        GROUP BY 1
    )
    SELECT partkey, CAST(value AS DOUBLE) AS value
    FROM val
    WHERE CAST(value AS DOUBLE) > (SELECT CAST(SUM(value) AS DOUBLE) FROM val) * 0.001
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 analogue (shipped value per part stands in for "
    "partsupp stock value): per-part value for a nation group, kept "
    "only when above a fraction of the TOTAL value — scalar aggregate "
    "subquery. The threshold compare happens in double on BOTH engines "
    "(decimal sums are exact, the double conversion is deterministic), "
    "so the boundary is engine-independent. Spark: 1-row total "
    "broadcast-crossJoined, no recompute of the val CTE.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    nat = t["nation"].where(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
    val = (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC) * F.col("l_quantity").cast(DEC)
            ).alias("__value")
        )
        .cache()
    )
    total = val.agg(F.sum("__value").cast("double").alias("__total"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("__value").cast("double") > F.col("__total") * 0.001)
        .select("partkey", F.col("__value").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), "partkey")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc="TPC-H Q15: quarterly revenue view + scalar-MAX subquery picking "
    "the top supplier(s). Exact decimal sums make the MAX-equality "
    "engine-independent. Spark: the revenue aggregate is computed once "
    "and its 1-row MAX is broadcast back against it.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    rev = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1) - F.col("l_discount")).cast(DEC)
            ).alias("__rev")
        )
        .cache()
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("__rev") == F.col("__mx"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", F.col("__rev").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%77%')
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 analogue (lineitem part-supplier pairs stand in for "
    "partsupp): distinct-supplier counts per (brand, type, size) with "
    "negated dim predicates and a NOT-IN anti-join excluding flagged "
    "suppliers. Spark: broadcast anti-join + distinct-aggregate.",
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    flagged = t["supplier"].where(F.col("s_name").like("%77%")).select("s_suppkey")
    return (
        t["lineitem"]
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(flagged), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH agg AS (
        SELECT l_partkey AS pk,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1
    )
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN agg a  ON a.pk = l.l_partkey
    WHERE p.p_brand = 'Brand#7'
      AND 5 * CAST(l.l_quantity AS DECIMAL(18,2)) * a.cnt < a.sq
    """,
    doc="TPC-H Q17: revenue from small-quantity orders, correlated "
    "per-part average-quantity threshold. The classic qty < 0.2*AVG "
    "predicate is algebraically rearranged to 5*qty*cnt < sum — all "
    "exact decimal/integer arithmetic, so the boundary cannot drift "
    "between engines (AVG-as-double would). Spark: the per-part "
    "aggregate joins back on partkey; AQE picks the join side.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    agg = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("sq"),
            F.count("*").alias("cnt"),
        )
    )
    return (
        t["lineitem"]
        .join(t["part"].where(F.col("p_brand") == "Brand#7"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(agg, F.col("pk") == F.col("l_partkey"))
        .where(
            F.lit(5) * F.col("l_quantity").cast(DEC) * F.col("cnt") < F.col("sq")
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0, 4)
            .alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q20_part_promotion_suppliers",
    oracle="""
    SELECT s.s_name, s.s_nationkey
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 140
    )
    AND s.s_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
    )
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 analogue: suppliers who shipped a large volume of a "
    "LIKE-filtered part family in a year, restricted to a nation set — "
    "nested IN subqueries (part filter inside the volume aggregate "
    "inside the supplier filter). Spark: both INs become semi-joins; "
    "the part filter broadcasts into the lineitem scan.",
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier", "nation"))
    bolt_parts = t["part"].where(F.col("p_name").like("%bolt%")).select("p_partkey")
    big_shippers = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(bolt_parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("__vol"))
        .where(F.col("__vol") > 140)
        .select("l_suppkey")
    )
    nat = (
        t["nation"]
        .where(F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11"))
        .select("n_nationkey")
    )
    return (
        t["supplier"]
        .join(big_shippers, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
        .select("s_name", "s_nationkey")
        .orderBy("s_name")
    )


@register(
    "sales_yoy_growth",
    oracle="""
    WITH rev AS (
        SELECT n.n_name AS nation,
               CAST(year(o.o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2
    )
    SELECT nation, yr,
           ROUND(revenue, 2) AS revenue,
           ROUND(revenue / LAG(revenue) OVER (
               PARTITION BY nation ORDER BY yr) - 1, 4) AS yoy_growth
    FROM rev
    ORDER BY nation, yr
    """,
    doc="Year-over-year revenue growth per nation (the TPC-DS-style "
    "period-comparison report): aggregate to (nation, year) grain "
    "FIRST, then a lag window over the tiny aggregate — the "
    "window-over-agg composition that avoids self-joining the fact "
    "table. Dimension joins broadcast; the only big shuffle is the "
    "group-by, and the window runs on |nations| x |years| rows.",
)
def sales_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    rev = (
        t["orders"]
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w = W.partitionBy("nation").orderBy("yr")
    return rev.select(
        "nation",
        "yr",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1, 4).alias(
            "yoy_growth"
        ),
    ).orderBy("nation", "yr")


@register(
    "customer_rfm_segmentation",
    oracle="""
    WITH rfm AS (
        SELECT o_custkey,
               (MAX(o_orderdate) - DATE '1970-01-01') AS last_order_d,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    cuts AS (
        SELECT quantile_disc(last_order_d, 0.75) AS r1,
               quantile_disc(last_order_d, 0.50) AS r2,
               quantile_disc(last_order_d, 0.25) AS r3,
               quantile_disc(frequency, 0.75) AS f1,
               quantile_disc(frequency, 0.50) AS f2,
               quantile_disc(frequency, 0.25) AS f3,
               quantile_disc(monetary, 0.75) AS m1,
               quantile_disc(monetary, 0.50) AS m2,
               quantile_disc(monetary, 0.25) AS m3
        FROM rfm
    ),
    scored AS (
        SELECT monetary,
               1 + CASE WHEN last_order_d < r1 THEN 1 ELSE 0 END
                 + CASE WHEN last_order_d < r2 THEN 1 ELSE 0 END
                 + CASE WHEN last_order_d < r3 THEN 1 ELSE 0 END AS r_quartile,
               1 + CASE WHEN frequency < f1 THEN 1 ELSE 0 END
                 + CASE WHEN frequency < f2 THEN 1 ELSE 0 END
                 + CASE WHEN frequency < f3 THEN 1 ELSE 0 END AS f_quartile,
               1 + CASE WHEN monetary < m1 THEN 1 ELSE 0 END
                 + CASE WHEN monetary < m2 THEN 1 ELSE 0 END
                 + CASE WHEN monetary < m3 THEN 1 ELSE 0 END AS m_quartile
        FROM rfm, cuts
    )
    SELECT r_quartile, f_quartile, m_quartile,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE), 2)
               AS segment_value
    FROM scored
    GROUP BY r_quartile, f_quartile, m_quartile
    ORDER BY r_quartile, f_quartile, m_quartile
    """,
    doc="RFM customer segmentation (recency/frequency/monetary "
    "quartiles): one aggregate to customer grain, then VALUE-BOUNDARY "
    "quartiles — exact percentile_disc cuts on each dimension "
    "broadcast back (quartile 1 = at or above the 75th percentile; "
    "ties share a segment, which is the semantically right RFM "
    "behavior — r10's NTILE split equal values across quartiles by an "
    "arbitrary id tie-break), rolled up to the 4x4x4 segment grid. "
    "Rebuilt r11 off the global NTILE windows: the plan is two "
    "aggregates and a 1-row broadcast cross — no window, no global "
    "sort, fact-to-customer-grain first as before. Recency quantiles "
    "run on epoch days (both engines compare the same integers).",
)
def customer_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    rfm = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.max("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .alias("last_order_d"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    cuts = rfm.agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY {col})"
            ).alias(f"{tag}{i}")
            for col, tag in (
                ("last_order_d", "r"),
                ("frequency", "f"),
                ("monetary", "m"),
            )
            for i, q in enumerate((0.75, 0.50, 0.25), start=1)
        ]
    )

    def quartile(col: str, tag: str):
        # when/otherwise mirrors the oracle's CASE NULL semantics
        # (a NULL dimension lands in quartile 1 on both engines;
        # a boolean cast would NULL it in Spark only — review r11)
        e = F.lit(1)
        for i in range(1, 4):
            e = e + F.when(F.col(col) < F.col(f"{tag}{i}"), 1).otherwise(0)
        return e.alias(f"{tag}_quartile")

    scored = rfm.crossJoin(F.broadcast(cuts)).select(
        "monetary",
        quartile("last_order_d", "r"),
        quartile("frequency", "f"),
        quartile("monetary", "m"),
    )
    return (
        scored.groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(
                F.sum(F.col("monetary").cast("decimal(18,2)")).cast("double"), 2
            ).alias("segment_value"),
        )
        .orderBy("r_quartile", "f_quartile", "m_quartile")
    )


@register(
    "revenue_pareto_curve",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT revenue,
               NTILE(10) OVER (ORDER BY revenue DESC, o_custkey) AS decile
        FROM cust
    ),
    per_decile AS (
        SELECT decile, COUNT(*) AS n_customers,
               CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
                   AS decile_revenue
        FROM ranked GROUP BY decile
    )
    SELECT decile, n_customers,
           ROUND(decile_revenue, 2) AS decile_revenue,
           ROUND(SUM(decile_revenue) OVER (ORDER BY decile)
                 / SUM(decile_revenue) OVER (), 6) AS cum_share
    FROM per_decile
    ORDER BY decile
    """,
    doc="Pareto / revenue-concentration curve: customers bucketed into "
    "revenue deciles (deterministic NTILE tiebreak), cumulative share "
    "per decile — the 80/20 report. Rebuilt r12 off the last "
    "data-grain global window (VERDICT r11 item 1): the customer-grain "
    "NTILE is reproduced BIT-IDENTICALLY — exact bucket-size split "
    "with the same (revenue DESC, o_custkey) tiebreak, the oracle is "
    "unchanged — by range-partitioning on the sort order and composing "
    "per-partition row_numbers with collected per-partition offsets "
    "(maintenance.assign_contiguous_ids' documented exact-global-rank "
    "path: range partition i sorts wholly before i+1, so no task ever "
    "sees more than 1/N of the customers), then applying NTILE's "
    "first-(n%10)-buckets-get-ceil(n/10) size rule as column algebra "
    "against a 1-row count broadcast. The cumulative share runs as a "
    "bounded 10x10 decile prefix cross on the 10-row aggregate instead "
    "of a global window. Decimal sums keep the decile totals exact.",
)
def revenue_pareto_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hapiy_etl_spark.operators.maintenance import assign_contiguous_ids

    t = load_tables(spark, sf_dir, ("orders",))
    cust = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    order = [F.col("revenue").desc(), F.col("o_custkey").asc()]
    ids = assign_contiguous_ids(
        cust.repartitionByRange(*order), "rid", order_within=order
    )
    # NTILE(10) as algebra over the exact global rank: with n rows the
    # first n%10 buckets hold ceil(n/10) rows, the rest floor(n/10).
    n1 = ids.agg(F.count("*").alias("__n"))
    i, n = F.col("rid"), F.col("__n")
    base, rem = F.floor(n / 10), n % 10
    big = rem * (base + F.lit(1))  # rows covered by the ceil-sized buckets
    decile = (
        F.when(i < big, F.floor(i / (base + F.lit(1))))
        # greatest() guards the n<10 division (branch provably unused
        # there: every i < big when base=0) against ANSI div-by-zero
        .otherwise(rem + F.floor((i - big) / F.greatest(base, F.lit(1))))
        + F.lit(1)
    ).cast("int")
    per_decile = (
        ids.crossJoin(F.broadcast(n1))
        .select(F.col("revenue"), decile.alias("decile"))
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(F.col("revenue").cast("decimal(18,2)"))
            .cast("double")
            .alias("decile_revenue"),
        )
    )
    # cumulative + total via a bounded 10x10 prefix cross on the decile
    # aggregate — never a global window, even a post-aggregate one
    rhs = per_decile.select(
        F.col("decile").alias("__d2"), F.col("decile_revenue").alias("__rev2")
    )
    return (
        per_decile.crossJoin(F.broadcast(rhs))
        .groupBy("decile", "n_customers", "decile_revenue")
        .agg(
            F.sum(F.when(F.col("__d2") <= F.col("decile"), F.col("__rev2")))
            .alias("__cum"),
            F.sum("__rev2").alias("__tot"),
        )
        .select(
            "decile",
            "n_customers",
            F.round("decile_revenue", 2).alias("decile_revenue"),
            F.round(F.col("__cum") / F.col("__tot"), 6).alias("cum_share"),
        )
        .orderBy("decile")
    )


@register(
    "supplier_lead_time",
    oracle="""
    WITH lt AS (
        SELECT l.l_suppkey,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS lead_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= o.o_orderdate
    )
    SELECT l_suppkey,
           COUNT(*) AS n_shipments,
           CAST(quantile_disc(lead_days, 0.5) AS BIGINT) AS p50_days,
           CAST(quantile_disc(lead_days, 0.9) AS BIGINT) AS p90_days,
           CAST(MAX(lead_days) AS BIGINT) AS max_days
    FROM lt
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
    doc="Operational lead-time SLA report: order-to-ship days per "
    "supplier with discrete p50/p90 (exact data elements — no "
    "interpolation seam). One fact-to-fact equi-join (AQE-sized) and "
    "one aggregate; datediff stays integer end to end.",
)
def supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    lt = (
        t["lineitem"]
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "l_suppkey",
            F.datediff("l_shipdate", "o_orderdate").alias("lead_days"),
        )
    )
    lt.createOrReplaceTempView("__lead_times")
    return spark.sql(
        """
        SELECT l_suppkey,
               COUNT(*) AS n_shipments,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY lead_days)
                    AS BIGINT) AS p50_days,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY lead_days)
                    AS BIGINT) AS p90_days,
               CAST(MAX(lead_days) AS BIGINT) AS max_days
        FROM __lead_times
        GROUP BY l_suppkey
        ORDER BY l_suppkey
        """
    )


@register(
    "customer_order_cadence",
    oracle="""
    WITH gaps AS (
        SELECT o_custkey,
               date_diff('day',
                         LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap_days
        FROM orders
    )
    SELECT o_custkey,
           COUNT(gap_days) AS n_gaps,
           CAST(quantile_disc(gap_days, 0.5) AS BIGINT) AS median_gap_days,
           CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
    FROM gaps
    WHERE gap_days IS NOT NULL
    GROUP BY o_custkey
    HAVING COUNT(gap_days) >= 5
    ORDER BY o_custkey
    """,
    doc="Customer purchase cadence: inter-order gap distribution per "
    "customer (lag window with deterministic tiebreak, discrete median "
    "— integer days end to end, no float seam), filtered to customers "
    "with enough history. The churn-signal / replenishment-cycle "
    "shape: one window over the per-customer order sequence, one "
    "aggregate.",
)
def customer_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = t["orders"].select(
        "o_custkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    gaps.createOrReplaceTempView("__order_gaps")
    return spark.sql(
        """
        SELECT o_custkey,
               COUNT(gap_days) AS n_gaps,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_days)
                    AS BIGINT) AS median_gap_days,
               CAST(MAX(gap_days) AS BIGINT) AS max_gap_days
        FROM __order_gaps
        GROUP BY o_custkey
        HAVING COUNT(gap_days) >= 5
        ORDER BY o_custkey
        """
    )
