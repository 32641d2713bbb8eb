"""Core relational queries: scan→filter→project→agg→sort, joins, set ops.

Covers SURVEY.md §2B "Projection / filter / predicates", "Joins",
"Sort / limit / top-k", "Set ops" rows. All Catalyst built-ins — filters
and projections reach the parquet scan (PushedFilters / ReadSchema),
joins pick broadcast-hash for the dim side, aggregates do partial
(map-side) combine automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register

# Exact, order-independent money arithmetic: DOUBLE → DECIMAL(18,2) before
# SUM so Spark and DuckDB agree bit-for-bit regardless of partial-agg order.
DEC = "decimal(18,2)"


def _money(col: F.Column) -> F.Column:
    return col.cast(DEC)


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_charge,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
        ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: filter→groupBy→8 aggs→sort (flagship).",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"]
    qty = _money(F.col("l_quantity"))
    price = _money(F.col("l_extendedprice"))
    disc = _money(F.col("l_discount"))
    one_minus_disc = _money(F.lit(1) - F.col("l_discount"))
    one_plus_tax = _money(F.lit(1) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * one_minus_disc).cast("double").alias("sum_disc_price"),
            F.sum(price * one_minus_disc * one_plus_tax).cast("double").alias("sum_charge"),
            F.round(F.sum(qty).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.round(F.sum(price).cast("double") / F.count("*"), 4).alias("avg_price"),
            F.round(F.sum(disc).cast("double") / F.count("*"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
        l.l_orderkey,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        o.o_orderdate,
        o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 style: 3-way join, filtered dims, grouped revenue, top-10.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    # orders⋈lineitem shuffles on orderkey (co-partitioned at scale via
    # bucketing on l_orderkey/o_orderkey). customer is NOT broadcast-
    # forced: AQE broadcasts it while it fits, shuffles it when it
    # doesn't (at 100 TB a forced customer broadcast OOMs executors).
    cust = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    ords = t["orders"].where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t["lineitem"].where(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_money(F.col("l_extendedprice")) * _money(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT
        n.n_name,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 style: 6-way star join with broadcast dims, regional rollup.",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem", "supplier", "nation", "region"))
    ords = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    # nation/region are 25/5 rows at ANY scale → always broadcast.
    # customer/supplier grow with the data → AQE-sized, never forced.
    return (
        t["lineitem"]
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.sum(_money(F.col("l_extendedprice")) * _money(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "filter_predicate_algebra",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_dec
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F'))
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_orderpriority LIKE '%URGENT%'
      AND NOT (o_custkey IS NULL)
      AND (o_orderkey % 2 = 0 OR o_totalprice > 150000)
    ORDER BY o_orderkey
    """,
    doc="Boolean predicate algebra: isin/between/like/null-check/and-or-not.",
)
def filter_predicate_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return (
        o.where(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000, 200000)
            & F.col("o_orderpriority").like("%URGENT%")
            & ~F.col("o_custkey").isNull()
            & ((F.col("o_orderkey") % 2 == 0) | (F.col("o_totalprice") > 150000))
        )
        .select(
            "o_orderkey",
            "o_orderstatus",
            "o_orderpriority",
            F.col("o_totalprice").cast(DEC).cast("double").alias("total_dec"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "join_semi_anti",
    oracle="""
    SELECT
        (SELECT COUNT(*) FROM customer c WHERE EXISTS
            (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
        (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
    """,
    doc="Left-semi (EXISTS) and left-anti (NOT EXISTS) joins.",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    c, o = t["customer"], t["orders"]
    ok = o.select("o_custkey")
    # one composed plan (cross of two single-row aggs) — a single action,
    # not two driver-side counts
    semi = c.join(ok, c.c_custkey == ok.o_custkey, "left_semi").agg(
        F.count("*").alias("n_with_orders")
    )
    anti = c.join(ok, c.c_custkey == ok.o_custkey, "left_anti").agg(
        F.count("*").alias("n_without_orders")
    )
    return semi.crossJoin(anti)


@register(
    "join_outer_coalesce",
    oracle="""
    SELECT
        c.c_custkey,
        c.c_name,
        COALESCE(o.cnt, 0) AS order_count,
        CAST(COALESCE(o.total, 0) AS DOUBLE) AS order_total
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, COUNT(*) AS cnt,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    ORDER BY c.c_custkey
    """,
    doc="Left-outer join with null-coalescing (REF R4 semantics, coalesce).",
)
def join_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    agg = (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("cnt"), F.sum(_money(F.col("o_totalprice"))).alias("total"))
    )
    c = t["customer"]
    return (
        c.join(agg, c.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("order_count"),
            F.coalesce(F.col("total"), F.lit(0)).cast("double").alias("order_total"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_full_outer",
    oracle="""
    WITH big_cust AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7000
    ),
    big_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders WHERE o_totalprice > 250000 GROUP BY o_custkey
    )
    SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal,
           o.n_orders,
           CASE WHEN c.c_custkey IS NULL THEN 'order_only'
                WHEN o.o_custkey IS NULL THEN 'cust_only'
                ELSE 'both' END AS side
    FROM big_cust c
    FULL OUTER JOIN big_orders o ON c.c_custkey = o.o_custkey
    ORDER BY custkey
    """,
    doc="Full-outer join with side classification and key coalescing.",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big_cust = t["customer"].where(F.col("c_acctbal") > 7000).select("c_custkey", "c_acctbal")
    big_orders = (
        t["orders"]
        .where(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        big_cust.join(big_orders, big_cust.c_custkey == big_orders.o_custkey, "full_outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            "c_acctbal",
            "n_orders",
            F.when(F.col("c_custkey").isNull(), "order_only")
            .when(F.col("o_custkey").isNull(), "cust_only")
            .otherwise("both")
            .alias("side"),
        )
        .orderBy("custkey")
    )


@register(
    "q2_min_cost_per_group",
    oracle="""
    WITH ranked AS (
        SELECT p_type, p_partkey, p_name, p_retailprice,
               RANK() OVER (PARTITION BY p_type ORDER BY p_retailprice, p_partkey) AS rnk
        FROM part
        WHERE p_size >= 10
    )
    SELECT p_type, p_partkey, p_name, p_retailprice
    FROM ranked WHERE rnk = 1
    ORDER BY p_type
    """,
    doc="TPC-H Q2 analogue: min-cost row per group (the argmin kernel — "
    "window rank over partition, no self-join).",
)
def q2_min_cost_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("part",))
    w = W.partitionBy("p_type").orderBy("p_retailprice", "p_partkey")
    return (
        t["part"]
        .where(F.col("p_size") >= 10)
        .withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") == 1)
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    ORDER BY c_mktsegment, c_acctbal DESC, c_custkey
    """,
    doc="Top-k per group via row_number window (the top-k kernel).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("customer",))
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t["customer"]
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", F.col("c_acctbal").desc(), "c_custkey")
    )


@register(
    "set_operations",
    oracle="""
    WITH hi AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         build AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT * FROM hi UNION SELECT * FROM build)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT * FROM hi INTERSECT SELECT * FROM build)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT * FROM hi EXCEPT SELECT * FROM build)
    ORDER BY op
    """,
    doc="Set ops: union-distinct, intersect, except/subtract.",
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    c = t["customer"]
    hi = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    build = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")

    def counted(df: DataFrame, op: str) -> DataFrame:
        return df.agg(F.lit(op).alias("op"), F.count("*").alias("n"))

    # one unioned plan → one action (three branches share the scan)
    return (
        counted(hi.union(build).distinct(), "union")
        .unionByName(counted(hi.intersect(build), "intersect"))
        .unionByName(counted(hi.exceptAll(build).distinct(), "except"))
        .orderBy("op")
    )


@register(
    "theta_range_join",
    oracle="""
    SELECT p.p_partkey, COUNT(*) AS n_pricier_lines
    FROM part p
    JOIN lineitem l
      ON l.l_partkey = p.p_partkey
     AND l.l_extendedprice > p.p_retailprice * 2
    GROUP BY p.p_partkey
    ORDER BY p.p_partkey
    """,
    doc="Non-equi (theta/range) join: equi key + range residual predicate.",
)
def theta_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    p, li = t["part"], t["lineitem"]
    # Equi component keeps this a hash join; the range term is a residual
    # filter — never a cartesian product at scale. part is AQE-sized, not
    # broadcast-forced (it grows with the data).
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey) & (li.l_extendedprice > p.p_retailprice * 2),
        )
        .groupBy("p_partkey")
        .agg(F.count("*").alias("n_pricier_lines"))
        .orderBy("p_partkey")
    )


@register(
    "cross_join_dims",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey = r.r_regionkey OR r.r_regionkey = 0
    ORDER BY r.r_name, n.n_name
    """,
    doc="Cross join (dims only) with post-filter.",
)
def cross_join_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("region", "nation"))
    r, n = t["region"], t["nation"]
    return (
        r.crossJoin(n)
        .where((F.col("n_regionkey") == F.col("r_regionkey")) | (F.col("r_regionkey") == 0))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT s.s_nationkey AS nationkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    ORDER BY nationkey
    """,
    doc="Skew-salted join (operators/skew.py:salted_join): the fact side "
    "gets a random salt, the dim side explodes n_salts-fold, and the "
    "shuffle key becomes (suppkey, salt) so a hot supplier spreads over "
    "16 reducers. The aggregate is salt-independent, so the plain-join "
    "oracle verifies the salting is semantics-preserving.",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hapiy_etl_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    li = t["lineitem"].select(F.col("l_suppkey").alias("suppkey"), "l_extendedprice")
    sup = t["supplier"].select(F.col("s_suppkey").alias("suppkey"), "s_nationkey")
    joined = salted_join(li, sup, on="suppkey", n_salts=16)
    return (
        joined.groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("revenue"),
        )
        .orderBy("nationkey")
    )


@register(
    "join_bucketed_colocated",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="Shuffle-FREE co-located join via writer-side bucketing (r15): "
    "orders and lineitem are stored as Hive-bucketed, per-bucket-"
    "sorted tables on the order key (8 buckets, one file per bucket — "
    "queries/index_fixtures.py:bucketed_tables, built once per "
    "session like the persisted indexes), so both scans expose "
    "HashPartitioning(orderkey, 8) and the sort-merge join runs with "
    "NO Exchange on either side — the technique every orderkey-join "
    "docstring in this file points at for the 100 TB posture, now "
    "demonstrated and plan-asserted IN the query: it raises if the "
    "plan lacks a SortMergeJoin or contains a hashpartitioning "
    "exchange on either join key. At 100 TB this turns the engine's "
    "biggest recurring shuffle (fact-fact on orderkey) into a "
    "local merge per bucket pair. The DuckDB twin is the plain join "
    "— bucketing must be semantics-invisible.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hapiy_etl_spark.queries.index_fixtures import bucketed_tables

    t_orders, t_lineitem = bucketed_tables(spark, sf_dir)
    o = spark.table(t_orders).where(F.col("o_orderstatus") == "F")
    li = spark.table(t_lineitem)
    j = (
        o.join(li.hint("merge"), o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(
                _money(F.col("l_extendedprice"))
                * _money(F.lit(1) - F.col("l_discount"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, f"bucketed join did not plan SMJ:\n{plan[:800]}"
    for key in ("o_orderkey", "l_orderkey"):
        assert f"hashpartitioning({key}" not in plan, (
            f"bucketed join shuffled on {key} — co-location lost:\n{plan[:800]}"
        )
    return j


@register(
    "join_bucket_pruned_lookup",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders WHERE o_orderkey IN (1, 3, 5)
    ORDER BY o_orderkey
    """,
    doc="Bucket-PRUNED point lookup over the bucketed orders table "
    "(r15, the read-side payoff of join_bucketed_colocated's layout): "
    "an IN-list on the bucket key lets the optimizer hash each "
    "literal to its bucket and read AT MOST 3 of the 8 bucket files — "
    "at 100 TB a keyed lookup touches 1/n_buckets of the table with "
    "no index structure at all. Plan-asserted in-query: the scan must "
    "report SelectedBucketsCount <= 3 out of 8, and raises if bucket "
    "pruning did not engage. The DuckDB twin reads the plain parquet "
    "— pruning must be semantics-invisible.",
)
def join_bucket_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    from hapiy_etl_spark.queries.index_fixtures import bucketed_tables

    t_orders, _ = bucketed_tables(spark, sf_dir)
    # DisableUnnecessaryBucketedScan drops the bucketed scan when no
    # join/agg wants the distribution — it does not credit bucket
    # FILTER pruning, so pin it off while this plan materializes (the
    # executedPlan() call below caches the plan in this DataFrame, so
    # restoring the conf afterwards cannot re-plan it)
    conf_key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf_key, "true")
    spark.conf.set(conf_key, "false")
    try:
        df = (
            spark.table(t_orders)
            .where(F.col("o_orderkey").isin(1, 3, 5))
            .select(
                "o_orderkey",
                "o_orderpriority",
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
            )
            .orderBy("o_orderkey")
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(conf_key, old)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"bucketed scan did not engage bucket pruning:\n{plan[:800]}"
    assert int(m.group(1)) <= 3 and int(m.group(2)) == 8, m.group(0)
    return df


def _morton_sql(cols: list[str], bits: int) -> str:
    """DuckDB bit-interleave expression mirroring operators/maintenance.py
    zorder_key — generated, so the oracle stays bit-for-bit in lockstep."""
    n = len(cols)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    return " | ".join(terms)


_Z_SCALE_SQL = """
    WITH src AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_partkey AS BIGINT) AS c0,
               CAST(l_suppkey AS BIGINT) AS c1,
               CAST(l_quantity AS BIGINT) AS c2
        FROM lineitem
    ),
    bounds AS (
        SELECT MIN(c0) mn0, MAX(c0) mx0,
               MIN(c1) mn1, MAX(c1) mx1,
               MIN(c2) mn2, MAX(c2) mx2
        FROM src
    ),
    scaled AS (
        SELECT l_orderkey, l_linenumber,
               LEAST(CAST(FLOOR((c0 - mn0) / (CASE WHEN mx0 > mn0 THEN mx0 - mn0 ELSE 1 END) * 255) AS BIGINT), 255) AS s0,
               LEAST(CAST(FLOOR((c1 - mn1) / (CASE WHEN mx1 > mn1 THEN mx1 - mn1 ELSE 1 END) * 255) AS BIGINT), 255) AS s1,
               LEAST(CAST(FLOOR((c2 - mn2) / (CASE WHEN mx2 > mn2 THEN mx2 - mn2 ELSE 1 END) * 255) AS BIGINT), 255) AS s2
        FROM src, bounds
        WHERE l_orderkey <= 100
    )
"""


@register(
    "maintenance_zorder_key",
    oracle=_Z_SCALE_SQL
    + f"""
    SELECT l_orderkey, l_linenumber,
           {_morton_sql(["s0", "s1", "s2"], 8)} AS zkey
    FROM scaled
    ORDER BY zkey, l_orderkey, l_linenumber
    """,
    doc="Multi-column Z-order (Morton) clustering key over 3 lineitem "
    "dims, min-max scaled to 8 bits each against FULL-table bounds "
    "(one broadcast 1-row aggregate) — the write-side layout key that "
    "makes parquet min/max row-group stats skip files on range filters "
    "over ANY participating column. The oracle recomputes the exact "
    "bit interleave in DuckDB, so scaling arithmetic and bit layout "
    "are verified end to end (operators/maintenance.py:zorder_key; "
    "zorder_sort adds repartitionByRange + sortWithinPartitions on "
    "this same key and is exercised in tests/test_scd2_maintenance.py).",
)
def maintenance_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hapiy_etl_spark.operators.maintenance import zorder_key

    t = load_tables(spark, sf_dir, ("lineitem",))
    src = t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_partkey").cast("long").alias("c0"),
        F.col("l_suppkey").cast("long").alias("c1"),
        F.col("l_quantity").cast("long").alias("c2"),
    )
    bounds = src.agg(
        *[F.min(f"c{i}").alias(f"mn{i}") for i in range(3)],
        *[F.max(f"c{i}").alias(f"mx{i}") for i in range(3)],
    )
    scaled = src.where(F.col("l_orderkey") <= 100).crossJoin(F.broadcast(bounds))
    scols = []
    for i in range(3):
        mn, mx = F.col(f"mn{i}"), F.col(f"mx{i}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1))
        scols.append(
            F.least(
                F.floor((F.col(f"c{i}") - mn) / span * 255), F.lit(255)
            ).cast("long")
        )
    return (
        scaled.select(
            "l_orderkey",
            "l_linenumber",
            zorder_key(scols, bits=8).alias("zkey"),
        )
        .orderBy("zkey", "l_orderkey", "l_linenumber")
    )


@register(
    "join_null_safe",
    oracle="""
    WITH l AS (
        SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS k
        FROM customer WHERE c_custkey <= 500
    ),
    r AS (
        SELECT s_suppkey, NULLIF(s_nationkey % 5, 0) AS k
        FROM supplier
    )
    SELECT l.k AS k,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT l.c_custkey) AS n_customers,
           COUNT(DISTINCT r.s_suppkey) AS n_suppliers
    FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    GROUP BY l.k
    ORDER BY k NULLS FIRST
    """,
    doc="Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys "
    "match each other instead of dropping out — the semantics needed "
    "when a nullable attribute (here a NULLIF-derived bucket) is a "
    "legitimate join key. Catalyst plans eqNullSafe as a HASH join "
    "(null-safe equality is still an equi-predicate), not a nested "
    "loop — worth pinning because the naive OR-of-IS-NULL rewrite "
    "degenerates to BNLJ.",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    l = (
        t["customer"]
        .where(F.col("c_custkey") <= 500)
        .select("c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("k"))
    )
    r = t["supplier"].select(
        "s_suppkey", F.nullif(F.col("s_nationkey") % 5, F.lit(0)).alias("kr")
    )
    return (
        l.join(r, l.k.eqNullSafe(F.col("kr")))
        .groupBy("k")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
        .orderBy(F.col("k").asc_nulls_first())
    )


@register(
    "scd2_point_in_time",
    oracle="""
    WITH versions AS (
        SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
               COALESCE(LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                        TIMESTAMP '9999-12-31 00:00:00') AS valid_to
        FROM (
            SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    ),
    pit AS (
        SELECT * FROM versions
        WHERE valid_from <= TIMESTAMP '1998-06-01 00:00:00'
          AND valid_to > TIMESTAMP '1998-06-01 00:00:00'
    )
    SELECT o_orderpriority AS priority_as_of,
           COUNT(*) AS n_customers,
           MIN(o_custkey) AS first_custkey
    FROM pit
    GROUP BY o_orderpriority
    ORDER BY priority_as_of
    """,
    doc="SCD2 point-in-time read (the feature-store time-travel shape): "
    "orders replayed as a CDC feed build versioned customer-priority "
    "rows (valid_from = order date, valid_to = next change, same-day "
    "collapse keeps the last order per day — scd2_apply's micro-batch "
    "rule), then the snapshot WHERE valid_from <= T < valid_to "
    "reconstructs every customer's state as of 1998-06-01. One window "
    "over the feed plus a pruned filter; at scale valid_from becomes "
    "the partition column so PIT reads prune to one era.",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("orders",))
    probe = "1998-06-01 00:00:00"
    last_per_day = (
        t["orders"]
        .select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("o_custkey", "o_orderdate").orderBy(
                    F.col("o_orderkey").desc()
                )
            ),
        )
        .where(F.col("rn") == 1)
    )
    lead_w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    versions = last_per_day.select(
        "o_custkey",
        "o_orderpriority",
        F.col("o_orderdate").alias("valid_from"),
        F.coalesce(
            F.lead("o_orderdate").over(lead_w),
            F.lit("9999-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    pit = versions.where(
        (F.col("valid_from") <= F.lit(probe)) & (F.col("valid_to") > F.lit(probe))
    )
    return (
        pit.groupBy(F.col("o_orderpriority").alias("priority_as_of"))
        .agg(
            F.count("*").alias("n_customers"),
            F.min("o_custkey").alias("first_custkey"),
        )
        .orderBy("priority_as_of")
    )
