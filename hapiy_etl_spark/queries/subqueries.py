"""Subquery-family queries: correlated EXISTS, scalar subqueries, IN
subqueries, HAVING join-back (TPC-H Q4/Q17/Q18 analogues).

Catalyst decorrelates these into joins/aggregates — the point of the
coverage is that the declarative subquery forms plan efficiently (semi
joins, broadcast aggregates), not nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register

DEC = "decimal(18,2)"


@register(
    "subq_exists_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 analogue: correlated EXISTS → left-semi join with a "
    "non-equi residual (shipped after order date).",
)
def subq_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "subq_scalar_above_avg",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > 1.03 * (SELECT AVG(p_retailprice) FROM part)
    ORDER BY p_partkey
    """,
    doc="Scalar subquery: parts priced >1.03x the global average "
    "(retail prices are uniform on [900,1000), so 1.5x selects nothing) "
    "(broadcast single-row aggregate, not a per-row loop).",
)
def subq_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part
        WHERE p_retailprice > 1.03 * (SELECT AVG(p_retailprice) FROM part)
        ORDER BY p_partkey
        """
    )


@register(
    "subq_correlated_avg_qty",
    oracle="""
    SELECT l.l_partkey,
           COUNT(*) AS n_small_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
    FROM lineitem l
    WHERE l.l_quantity < 0.5 * (
        SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY l.l_partkey
    ORDER BY l.l_partkey
    """,
    doc="TPC-H Q17 analogue: correlated scalar subquery per part "
    "(decorrelated by Catalyst into an aggregate + join).",
)
def subq_correlated_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l.l_partkey,
               COUNT(*) AS n_small_lines,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
        FROM lineitem l
        WHERE l.l_quantity < 0.5 * (
            SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
        )
        GROUP BY l.l_partkey
        ORDER BY l.l_partkey
        """
    )


@register(
    "subq_in_large_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
           CAST(q.total_qty AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
        FROM lineitem GROUP BY l_orderkey
    ) q ON q.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 analogue: IN over a HAVING aggregate, join-back for "
    "detail rows, top-20.",
)
def subq_in_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
               CAST(q.total_qty AS DOUBLE) AS total_qty
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
            FROM lineitem GROUP BY l_orderkey
        ) q ON q.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
        )
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
        """
    )


@register(
    "subq_not_in_anti",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey NOT IN (
        SELECT l_suppkey FROM lineitem
            WHERE l_quantity > 48 AND l_returnflag = 'R' AND l_discount > 0.08
    )
    ORDER BY s.s_suppkey
    """,
    doc="NOT IN subquery → null-aware anti join.",
)
def subq_not_in_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_suppkey NOT IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_quantity > 48 AND l_returnflag = 'R' AND l_discount > 0.08
        )
        ORDER BY s.s_suppkey
        """
    )


@register(
    "subq_lateral_topn",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 4) AS o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    WHERE c.c_custkey <= 100
    ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
    """,
    doc="Correlated LATERAL subquery (Spark 4 SQL): top-2 orders per "
    "customer via a per-row dependent subquery. Catalyst decorrelates "
    "this into the same window/top-k plan as the explicit "
    "topk_per_group form — the oracle proves the rewrite is exact.",
)
def subq_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 4) AS o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
        ) t
        WHERE c.c_custkey <= 100
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
        """
    )
