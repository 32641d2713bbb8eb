"""Iterative graph algorithms as DataFrame loops.

Connected components live in operators/dedup.py (dedup_clusters);
this module holds the general iterative-propagation pattern with the
same scale discipline: edges cached once, per-round join + aggregate,
lineage truncated with an eager localCheckpoint every few rounds so the
plan stays O(3^k)-free (see dedup_clusters docstring for the measured
cost of unbroken iterative lineage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns (node, rank) for every node appearing as src or dst.
    Simplified update (dangling mass not redistributed — nodes with no
    out-edges absorb it, the common simplification for fixed-iteration
    comparisons):

        PR_0(v)   = 1/N
        PR_k+1(v) = (1-d)/N + d * sum_{(u,v) in E} PR_k(u) / outdeg(u)

    Each round is one join edges⋈ranks on src + one groupBy dst — the
    shuffle carries (node, rank) pairs only. Deterministic for a fixed
    iteration count, so a fixed-iteration SQL twin (recursive CTE with
    an iteration counter) can verify it value-for-value.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    e_w = e.join(outdeg, "src").cache()

    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct().cache()
    n_total = nodes.count()  # also materializes the caches' upstream

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    for i in range(iterations):
        contribs = (
            e_w.join(ranks, e_w.src == ranks.node)
            .select("dst", (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_total)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exactly-once triangle counting via degree-ordered orientation —
    the scale-safe formulation (wedge work is bounded by sum of
    C(oriented-outdeg, 2), and orientation caps oriented outdegree at
    O(sqrt(|E|)) for any graph).

    Input: an undirected edge list (any orientation, self-loops and
    duplicates tolerated). Output: one row
    (n_nodes, n_edges, n_wedges, n_triangles, clustering) where
    clustering is the global coefficient 3*triangles / wedges.

    Plan shape: canonicalize + distinct (one shuffle on the edge),
    degree aggregate, two broadcast-sized joins to attach degrees,
    wedge self-join on the oriented source, then a semi-join against
    the canonical edge set to close triangles. No step materializes
    more than Σ C(outdeg,2) candidate rows, and the heavy self-join
    key (the wedge apex) is the LOW-degree endpoint by construction —
    degree-ordering is the skew guard.
    """
    # The canonical edge set is referenced four times (degrees, both
    # wedge sides, triangle closure) and Spark does NOT share subplans
    # across self-joins — without a cache the whole upstream edge
    # derivation re-executes per reference (measured 7.2 s -> ~3 s on
    # the co-purchase graph at sf0.1). The deduped edge list is the
    # small artifact of the pipeline, safe to cache even when the
    # input relation is huge.
    e = (
        edges.select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .cache()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    with_deg = (
        e.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("dega")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("degb")), "b")
    )
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    o = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    ).cache()
    e1, e2 = o.alias("e1"), o.alias("e2")
    # unordered out-neighbor pair (by id), closed against the canonical
    # edge set: id-canonical closure needs no rank lookup on w1/w2
    wedge_pairs = e1.join(e2, "u").where(F.col("e1.w") < F.col("e2.w"))
    triangles = wedge_pairs.join(
        e,
        (F.col("e1.w") == F.col("a")) & (F.col("e2.w") == F.col("b")),
        "left_semi",
    )
    n_tri = triangles.agg(F.count("*").alias("n_triangles"))
    # integer div keeps the wedge sum exact long arithmetic at any
    # scale (float /2 then cast rounds once the sum passes 2^53)
    n_wedge = deg.agg(
        F.sum(F.expr("deg * (deg - 1) div 2")).cast("long").alias("n_wedges")
    )
    n_nodes = deg.agg(F.count("*").alias("n_nodes"))
    n_edges = e.agg(F.count("*").alias("n_edges"))
    # four 1-row aggregates composed with crossJoin (sanctioned pattern:
    # each side is exactly one row)
    summary = (
        n_nodes.crossJoin(n_edges)
        .crossJoin(n_wedge)
        .crossJoin(n_tri)
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering"),
        )
    )
    # Returned LAZY on purpose: an eager collect-and-rewrap (tried in
    # r5) releases the e/o caches but replaces the whole plan with a
    # LocalTableScan — destroying the hash-join/no-cartesian plan
    # evidence PLANS.md extracts and making fn() construction run the
    # job. The caches are tracked in _TRIANGLE_CACHES; callers release
    # them with triangle_cache_release() once the summary is consumed
    # (bench.py does, after its timed pass) — no clearCache() needed,
    # so unrelated cached state survives.
    _TRIANGLE_CACHES.extend([e, o])
    return summary


_TRIANGLE_CACHES: list[DataFrame] = []


def triangle_cache_release() -> None:
    """Unpersist the e/o edge caches created by prior triangle_stats
    calls. The frames are tiny (deduped edges), but caches outlive the
    query in a long session — call this when the summary has been
    consumed."""
    while _TRIANGLE_CACHES:
        _TRIANGLE_CACHES.pop().unpersist()
