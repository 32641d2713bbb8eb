"""Graph-analytics queries: iterative algorithms expressed as DataFrame
loops (operators/graph.py), oracle-checked with fixed-iteration SQL
twins (the iteration count pins the computation, so DuckDB can verify
value-for-value without a fixpoint)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.operators.graph import pagerank
from hapiy_etl_spark.registry import register

_ITERS = 5


def _pagerank_oracle(iterations: int) -> str:
    """Unrolled fixed-iteration PageRank SQL (DuckDB disallows
    aggregates over the recursive reference, so each iteration is one
    chained CTE stage — same shape the Spark loop builds)."""
    stages = []
    for i in range(1, iterations + 1):
        stages.append(f"""
    pr{i} AS (
        SELECT nd.node,
               0.15 / (SELECT c FROM n) + 0.85 * COALESCE(inf.inflow, 0) AS rank
        FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node, SUM(p.rank / o.outdeg) AS inflow
            FROM edges e
            JOIN pr{i - 1} p ON p.node = e.src
            JOIN outdeg o ON o.src = e.src
            GROUP BY e.dst
        ) inf USING (node)
    )""")
    return f"""
    WITH pairs AS (
        SELECT DISTINCT o_custkey * 2 AS cust_node, l_suppkey * 2 + 1 AS supp_node
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey <= 200
    ),
    edges AS (
        SELECT cust_node AS src, supp_node AS dst FROM pairs
        UNION ALL
        SELECT supp_node AS src, cust_node AS dst FROM pairs
    ),
    outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    n AS (SELECT COUNT(*) AS c FROM nodes),
    pr0 AS (SELECT node, 1.0 / (SELECT c FROM n) AS rank FROM nodes),
    {",".join(stages)}
    SELECT node, ROUND(rank * 1000, 6) AS rank_k
    FROM pr{iterations}
    ORDER BY node
    """


@register(
    "graph_pagerank_trade",
    oracle=_pagerank_oracle(_ITERS),
    doc="Fixed-iteration PageRank (d=0.85, 5 rounds) over the "
    "bidirectional customer<->supplier trade graph (distinct pairs from "
    "orders x lineitem; customers even node ids, suppliers odd). Spark "
    "side is the operators/graph.py loop (edges cached once, one "
    "join+groupBy per round, lineage truncated every 3 rounds); the "
    "oracle unrolls the same 5 iterations as chained CTE stages — an "
    "iterative algorithm verified value-for-value, not just shape.",
)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    pairs = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("o_custkey") <= 200)
        .select(
            (F.col("o_custkey") * 2).alias("cust_node"),
            (F.col("l_suppkey") * 2 + 1).alias("supp_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
    ).unionAll(
        pairs.select(F.col("supp_node").alias("src"), F.col("cust_node").alias("dst"))
    )
    ranks = pagerank(edges, iterations=_ITERS, damping=0.85)
    return ranks.select(
        "node", F.round(F.col("rank") * 1000, 6).alias("rank_k")
    ).orderBy("node")
