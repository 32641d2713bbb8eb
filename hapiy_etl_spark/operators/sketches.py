"""Mergeable distinct-count sketches beyond HLL: KMV (k-minimum-values,
the theta-sketch family's simplest member), pure column algebra.

Why alongside HLL (F.hll_sketch_agg, already used for mergeable
unions): KMV sketches also support SET-OPERATION estimates —
|A ∪ B| directly from merged sketches and |A ∩ B| via
inclusion-exclusion — which HLL union alone can't give for
intersections. The sketch is just the k smallest normalized hashes of
the distinct values, so merging = union + keep k smallest: associative,
commutative, idempotent — safe to roll up across partitions, files, or
days.

Estimator: with the k-th smallest of n uniform [0,1) hashes at value
theta, E[theta] ≈ k/n, so n̂ = (k-1)/theta (unbiased form); relative
error ~ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unit_hash(col: Column) -> Column:
    """xxhash64 → uniform double in [0, 1): top 53 bits of the unsigned
    hash (bit-exact reproducible across engines/partitions)."""
    h = F.xxhash64(col)
    # shift to 53 significant bits; map signed long to [0, 2^53)
    top = F.shiftrightunsigned(h, 11)
    return top / F.lit(float(1 << 53))


def kmv_sketch(df: DataFrame, group_cols: list[str], value_col: str, k: int = 256) -> DataFrame:
    """One KMV sketch per group: sorted array of the k smallest unit
    hashes over the DISTINCT values (duplicates collapse before the
    rank, so the sketch sees each value once).

    Shuffle shape: distinct on (group, hash) then a per-group window
    rank — the heavy reduction happens on 8-byte hashes, never values.
    """
    from pyspark.sql import Window as W

    hashed = df.select(*group_cols, _unit_hash(F.col(value_col)).alias("__h")).distinct()
    w = W.partitionBy(*group_cols).orderBy("__h")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("__h")).alias("sketch"))
    )


def kmv_estimate(sketch: Column, k: int = 256) -> Column:
    """Distinct-count estimate from a sketch array: exact when the group
    had fewer than k distinct values (the sketch IS the value set)."""
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise((F.lit(k - 1)) / F.element_at(sketch, k))


def kmv_merge(a: Column, b: Column, k: int = 256) -> Column:
    """Union two sketches: concat, dedupe, keep the k smallest — the
    mergeable-rollup operator (associative/commutative/idempotent)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_union_estimate(a: Column, b: Column, k: int = 256) -> Column:
    return kmv_estimate(kmv_merge(a, b, k), k)


def kmv_intersect_estimate(a: Column, b: Column, k: int = 256) -> Column:
    """|A ∩ B| by inclusion-exclusion over sketch estimates — the
    set-operation capability HLL-union lacks."""
    return F.greatest(
        kmv_estimate(a, k) + kmv_estimate(b, k) - kmv_union_estimate(a, b, k),
        F.lit(0.0),
    )
