"""Frequent-items (heavy hitters) with bounded memory: Misra-Gries
candidates + exact recount — the 2-pass pattern for finding hot keys in
a 100 TB stream without shuffling every distinct key's count.

Why not just groupBy(key).count(): that is exact and scale-safe when
you WANT all counts, but for "which keys exceed phi of the stream" it
shuffles one record per distinct key (billions, mostly singletons).
Here pass 1 reduces each partition to at most ``capacity`` candidate
keys with O(capacity) task memory and NO shuffle; only the candidate
set (broadcast-sized by construction) is recounted exactly.

Guarantee: any key with global frequency > N/(capacity+1) survives
Misra-Gries in at least one partition (its per-partition frequencies
cannot all be below the per-partition threshold), so with
``capacity >= 2/phi`` the candidate set is a superset of every key
with frequency > phi*N, and the exact recount makes the final answer
EXACT — not an estimate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(key_col: str, capacity: int):
    """Per-partition Misra-Gries via batched merge: exact value_counts
    per Arrow batch folded into a bounded counter; when the counter
    exceeds capacity, subtract the (capacity+1)-th largest count from
    all (the batched form of MG's decrement-all) and drop non-positive
    entries. Vectorized — no per-row Python."""

    def run(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for key, c in pdf[key_col].value_counts().items():
                counts[key] = counts.get(key, 0) + int(c)
            if len(counts) > capacity:
                cut = sorted(counts.values(), reverse=True)[capacity]
                counts = {k: v - cut for k, v in counts.items() if v > cut}
        yield pd.DataFrame({key_col: list(counts.keys())})

    return run


def frequent_items(
    df: DataFrame, key_col: str, phi: float = 0.01, capacity: int | None = None
) -> DataFrame:
    """All keys with frequency > phi*N — EXACT, via MG candidates and a
    broadcast-semi-join recount. Output: (key, n, frequency) ordered by
    n desc then key."""
    if capacity is None:
        capacity = max(int(math.ceil(2.0 / phi)), 8)
    key_field = df.schema[key_col]
    candidates = (
        df.select(key_col)
        .mapInPandas(
            _mg_partition(key_col, capacity),
            schema=f"{key_col} {key_field.dataType.simpleString()}",
        )
        .distinct()
    )
    total = df.agg(F.count("*").alias("__total"))
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n") > F.lit(phi) * F.col("__total"))
        .select(
            key_col,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("frequency"),
        )
        .orderBy(F.col("n").desc(), key_col)
    )
