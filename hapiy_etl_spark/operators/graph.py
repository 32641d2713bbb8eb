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
