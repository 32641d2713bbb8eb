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


_BASKET_CAP = 64  # parts kept per order (lowest partkey first) — the
# df_cap-style fanout cap: pair generation per order is bounded at
# C(cap,2) even against an adversarial giant order. Driver orders hold
# <= 7 lineitems, so the cap is a no-op at every driver SF and the
# oracle sees identical data.


def capped_baskets(op_df: DataFrame) -> DataFrame:
    """(order -> sorted capped part array) in ONE shuffle: collect_set
    dedups (order, part) inside the aggregation, sort+slice applies the
    fanout cap. The single source of truth for the capped basket on
    the Spark side (edges, pair supports, and the scale harness all
    derive from it)."""
    return op_df.groupBy("o").agg(
        F.slice(F.sort_array(F.collect_set("p")), 1, _BASKET_CAP).alias("parts")
    )


def basket_pairs(per_order: DataFrame) -> DataFrame:
    """All (src < dst) part pairs per capped basket, generated as a
    higher-order array expression (C(n,2) structs, n <= cap) — cheaper
    than the window-cap + self-join formulation (two extra shuffles of
    the full item list; measured ~2x slower)."""
    pair_structs = F.flatten(
        F.transform(
            "parts",
            lambda x, i: F.transform(
                F.slice(
                    F.col("parts"), i + 2, F.greatest(F.size("parts") - i - 1, F.lit(0))
                ),
                lambda y: F.struct(x.alias("src"), y.alias("dst")),
            ),
        )
    )
    return per_order.select(F.explode(pair_structs).alias("pr")).select(
        F.col("pr.src").alias("src"), F.col("pr.dst").alias("dst")
    )


def copurchase_edges_from(op_df: DataFrame) -> DataFrame:
    """Part co-purchase affinity edges from an (o, p) item DataFrame:
    (src < dst) part pairs appearing together in >= 2 distinct orders.
    Shared by the triangle / BFS queries and tools/scale_growth.py
    --graph, so the measured pipeline IS the registered one."""
    return (
        basket_pairs(capped_baskets(op_df))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
        .select("src", "dst")
    )


_EDGE_CACHE: dict[tuple[str, str], DataFrame] = {}


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase affinity edges, computed ONCE per (session, corpus)
    and cached — the graph-family twin of text.neardup_clusters: at
    100 TB the edge list is a materialized-once artifact every graph
    consumer (triangles, BFS reachability, scale tooling) reads, not a
    per-query re-derivation of the basket self-join. ~3.6k rows at
    sf0.1 (the support threshold keeps it sparse as the corpus grows).
    Released by edge_cache_clear() (bench does, between passes)."""
    key = (spark.sparkContext.applicationId, str(sf_dir))
    hit = _EDGE_CACHE.get(key)
    if hit is not None:
        return hit
    t = load_tables(spark, sf_dir, ("lineitem",))
    edges = copurchase_edges_from(
        t["lineitem"].select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        )
    ).cache()
    edges.count()
    _EDGE_CACHE[key] = edges
    return edges


def edge_cache_clear() -> None:
    """Drop the cached co-purchase edge artifacts (bench pass isolation
    / long-lived sessions that need to re-derive after data changes)."""
    for df in _EDGE_CACHE.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session may already be stopped
    _EDGE_CACHE.clear()


# Shared edge-derivation CTE: the SINGLE source of truth for the oracle
# side of the co-purchase graph (triangle + BFS) — mirrors
# copurchase_edges_from exactly, including the fanout cap.
_EDGE_CTE = f"""
    op AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    capped AS (
        SELECT o, p FROM (
            SELECT o, p, ROW_NUMBER() OVER (PARTITION BY o ORDER BY p) AS rn
            FROM op
        ) WHERE rn <= {_BASKET_CAP}
    ),
    pp AS (
        SELECT x.p AS x, y.p AS y
        FROM capped x JOIN capped y ON x.o = y.o AND x.p < y.p
    ),
    e AS (
        SELECT x AS a, y AS b FROM pp GROUP BY x, y HAVING COUNT(*) >= 2
    )"""


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_EDGE_CTE},
    deg AS (
        SELECT v, COUNT(*) AS deg
        FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
        GROUP BY v
    ),
    o AS (
        SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                    THEN e.a ELSE e.b END AS u,
               CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.a < e.b)
                    THEN e.b ELSE e.a END AS w
        FROM e JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
    ),
    tri AS (
        SELECT COUNT(*) AS t
        FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.w < e2.w
        WHERE EXISTS (SELECT 1 FROM e WHERE e.a = e1.w AND e.b = e2.w)
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM e) AS n_edges,
           CAST((SELECT SUM(deg * (deg - 1) // 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           ROUND(3.0 * (SELECT t FROM tri)
                 / (SELECT SUM(deg * (deg - 1) // 2) FROM deg), 6) AS clustering
    """,
    doc="Exactly-once triangle counting + global clustering coefficient "
    "over the part co-purchase graph (parts appearing together in >= 2 "
    "distinct orders — the market-basket affinity graph; 3.4k edges at "
    "sf0.01 and 3.6k at sf0.1, i.e. edge count stays sparse as the "
    "corpus grows because pair support concentrates). Per-order fanout "
    "capped at 64 parts; degree-ordered orientation bounds wedge work "
    "at sum C(outdeg,2) with oriented outdegree O(sqrt(E)) — the "
    "distributed-triangle formulation that survives skew "
    "(operators/graph.py:triangle_stats).",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hapiy_etl_spark.operators.graph import triangle_stats

    return triangle_stats(copurchase_edges(spark, sf_dir))


@register(
    "graph_reachability_bfs",
    oracle=f"""
    WITH RECURSIVE {_EDGE_CTE},
    und AS (
        SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e
    ),
    seeds AS (
        SELECT x AS seed FROM (SELECT DISTINCT x FROM und ORDER BY x LIMIT 5)
    ),
    walk(seed, node, depth) AS (
        SELECT seed, seed AS node, 0 AS depth FROM seeds
        UNION ALL
        SELECT w.seed, u.y, w.depth + 1
        FROM walk w JOIN und u ON u.x = w.node
        WHERE w.depth < 3
    )
    SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS hops
    FROM walk GROUP BY seed, node
    ORDER BY seed, hops, node
    """,
    doc="Bounded-depth BFS reachability (Spark 4 recursive CTE): parts "
    "within 3 affinity hops of the 5 lowest-id seed parts in the "
    "co-purchase graph, with minimum hop count — the market-basket "
    "expansion / related-items shape. Spark executes WITH RECURSIVE "
    "natively (UNION ALL + depth bound, min-aggregated after, since "
    "cycle-deduping UNION recursion is not yet supported); the sparse "
    "thresholded graph (avg degree ~1.2 at sf0.1) keeps the path "
    "frontier linear. The iterative DataFrame-loop twin of this shape "
    "is operators/graph.py:pagerank; this query pins the SQL-native "
    "route.",
)
def graph_reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The recursion references the edge view once per unrolled depth
    # (and twice more through `und`) — an uncached view re-derives the
    # edges ~8x (measured 17.8 s -> ~4 s at sf0.1). copurchase_edges
    # returns the shared session-cached artifact, already materialized.
    edges = copurchase_edges(spark, sf_dir)
    edges.createOrReplaceTempView("copurchase_edges_v")
    return spark.sql(
        """
        WITH RECURSIVE und AS (
            SELECT src AS x, dst AS y FROM copurchase_edges_v
            UNION ALL
            SELECT dst, src FROM copurchase_edges_v
        ),
        seeds AS (
            SELECT x AS seed FROM (
                SELECT DISTINCT x FROM und ORDER BY x LIMIT 5
            )
        ),
        walk(seed, node, depth) AS (
            SELECT seed, seed AS node, 0 AS depth FROM seeds
            UNION ALL
            SELECT w.seed, u.y, w.depth + 1
            FROM walk w JOIN und u ON u.x = w.node
            WHERE w.depth < 3
        )
        SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS hops
        FROM walk GROUP BY seed, node
        ORDER BY seed, hops, node
        """
    )


@register(
    "basket_pair_lift",
    oracle=f"""
    WITH {_EDGE_CTE},
    n_orders AS (SELECT COUNT(DISTINCT o) AS n FROM capped),
    part_support AS (
        SELECT p, COUNT(DISTINCT o) AS n_p FROM capped GROUP BY p
    ),
    pair_support AS (
        SELECT x AS a, y AS b, COUNT(*) AS n_ab
        FROM pp GROUP BY x, y HAVING COUNT(*) >= 2
    )
    SELECT ps.a, ps.b, CAST(ps.n_ab AS BIGINT) AS n_together,
           ROUND(ps.n_ab * 1.0 / sa.n_p, 6) AS confidence_a_to_b,
           ROUND(ps.n_ab * 1.0 * (SELECT n FROM n_orders)
                 / (sa.n_p * sb.n_p), 4) AS lift
    FROM pair_support ps
    JOIN part_support sa ON sa.p = ps.a
    JOIN part_support sb ON sb.p = ps.b
    ORDER BY lift DESC, ps.a, ps.b
    LIMIT 100
    """,
    doc="Market-basket association metrics over the co-purchase pairs "
    "(support >= 2): confidence P(b|a) and lift "
    "P(a,b)/(P(a)P(b)) for the top-100 lifted part pairs — the "
    "association-rule-mining shape sharing the SAME capped pair "
    "derivation as the triangle/BFS queries (one source of truth, "
    "Spark and oracle). Per-part supports are a second aggregate over "
    "the capped item list; the pair join touches only surviving "
    "pairs.",
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    op = t["lineitem"].select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    baskets = capped_baskets(op).cache()
    n_orders = baskets.agg(F.count("*").alias("n"))
    part_support = (
        baskets.select(F.explode("parts").alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("n_p"))
    )
    pair_support = (
        basket_pairs(baskets)
        .groupBy(F.col("src").alias("a"), F.col("dst").alias("b"))
        .agg(F.count("*").alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    sa = part_support.select(F.col("p").alias("a"), F.col("n_p").alias("n_a"))
    sb = part_support.select(F.col("p").alias("b"), F.col("n_p").alias("n_b"))
    return (
        pair_support.join(sa, "a")
        .join(sb, "b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "a",
            "b",
            F.col("n_ab").cast("long").alias("n_together"),
            F.round(F.col("n_ab") * 1.0 / F.col("n_a"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("n_ab") * 1.0 * F.col("n") / (F.col("n_a") * F.col("n_b")), 4
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "a", "b")
        .limit(100)
    )
