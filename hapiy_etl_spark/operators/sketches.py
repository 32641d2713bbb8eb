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


# -- mergeable log-scale histogram (DDSketch-style) ------------------------
#
# Relative-error quantile sketch as a FIXED array of bucket counts over
# log10(|v|): the bucketing function is deterministic and value-local,
# so two sketches merge by element-wise addition — exactly (integer
# counts), not approximately — which makes it a valid algebraic partial
# for incremental rollups (operators/incremental_mv.py). Quantile
# estimates carry bounded RELATIVE error (one bucket width,
# 10^(1/LOGHIST_BPD) ≈ 1.33x at 8 buckets/decade), the DDSketch
# guarantee (Masson et al., VLDB 2019), unlike percentile_approx whose
# internal state Spark does not expose for external merging.
# Layout: [0] = zeros; [1 .. NB] = positive values, bucket b covers
# log10(v) ∈ [LO + b/BPD, LO + (b+1)/BPD); [NB+1 .. 2NB] = negatives,
# mirrored. |v| below 10^LO clamps to the first bucket, above 10^HI to
# the last (counts are never lost, extreme tails lose resolution).

LOGHIST_BPD = 8
LOGHIST_LO = -6
LOGHIST_HI = 12
LOGHIST_NB = (LOGHIST_HI - LOGHIST_LO) * LOGHIST_BPD
LOGHIST_SIZE = 1 + 2 * LOGHIST_NB


def _loghist_zero() -> Column:
    return F.array_repeat(F.lit(0).cast("long"), LOGHIST_SIZE)


def loghist_bin(col: Column) -> Column:
    """Bucket index for one value (null → null, excluded from sketches)."""
    a = F.abs(col)
    b = F.least(
        F.greatest(
            F.floor((F.log10(a) - F.lit(float(LOGHIST_LO))) * LOGHIST_BPD).cast("int"),
            F.lit(0),
        ),
        F.lit(LOGHIST_NB - 1),
    )
    return (
        F.when(col.isNull(), F.lit(None).cast("int"))
        .when(col == 0, F.lit(0))
        .when(col > 0, b + 1)
        .otherwise(b + 1 + LOGHIST_NB)
    )


def loghist_sketch(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """One log-histogram per group as ``loghist`` array<long>.

    Shuffle shape: the heavy reduction is groupBy(group, bucket) over
    ints — partial aggregation combines map-side, and the final
    array materialization folds at most LOGHIST_SIZE tiny structs per
    group."""
    idx = loghist_bin(F.col(value_col)).alias("__b")
    counts = (
        df.select(*group_cols, idx)
        .where(F.col("__b").isNotNull())
        .groupBy(*group_cols, "__b")
        .agg(F.count("*").alias("__c"))
    )
    return counts.groupBy(*group_cols).agg(
        F.aggregate(
            F.collect_list(F.struct(F.col("__b"), F.col("__c"))),
            _loghist_zero(),
            lambda acc, x: F.transform(
                acc,
                lambda c, i: c
                + F.when(x["__b"] == i, x["__c"]).otherwise(F.lit(0).cast("long")),
            ),
        ).alias("loghist")
    )


def loghist_merge_agg(col: str = "loghist") -> Column:
    """Aggregate expression: element-wise sum of a group's sketches —
    the EXACT merge (integer counts), so refresh-by-parts equals
    recompute bit-for-bit."""
    return F.aggregate(
        F.collect_list(F.coalesce(F.col(col), _loghist_zero())),
        _loghist_zero(),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )


def _loghist_quantile_py(h, q: float):
    """Pure-Python finalizer kernel (shared by the UDF and tests)."""
    import math

    bpd, lo, nb = LOGHIST_BPD, LOGHIST_LO, LOGHIST_NB
    if h is None:
        return None
    total = int(sum(h))
    if total == 0:
        return None
    target = max(1, math.ceil(total * q))
    cum = 0
    # negatives are the SMALLEST values: walk the negative region from
    # most-negative (largest |v|, highest bucket) down, then zero, then
    # positives ascending
    order = list(range(2 * nb, nb, -1)) + [0] + list(range(1, nb + 1))
    for i in order:
        c = int(h[i])
        if c == 0:
            continue
        cum += c
        if cum >= target:
            if i == 0:
                return 0.0
            if i <= nb:
                return 10.0 ** (lo + (i - 1 + 0.5) / bpd)
            return -(10.0 ** (lo + (i - nb - 1 + 0.5) / bpd))
    return None


def loghist_quantile(col: Column, q: float) -> Column:
    """Quantile estimate from a sketch (bucket-midpoint in log space;
    relative error one bucket width). Vectorized finalizer — partials
    and merges stay JVM-side; this runs only over the final per-group
    rows."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _q(hists):
        return pd.Series([_loghist_quantile_py(h, q) for h in hists])

    return pandas_udf(_q, DoubleType())(col)


# -- mergeable rank sketch (KLL family, deterministic MRL compaction) ------
#
# The finer-precision opt-in next to the log-histogram: the loghist's
# error is RELATIVE (one log-bucket, ~1.33x) regardless of n; this
# sketch bounds RANK error instead — exact while a group holds ≤ k
# values, O(log(n/k)/k) rank error above — so quantiles of
# narrow-range distributions (latencies clustered around one value)
# resolve far better than a 1.33x bucket can. Design:
#
# - levels of sorted buffers; items at level i carry weight 2^i
#   (Karnin-Lang-Liberty's structure with the DETERMINISTIC
#   Munro-Paterson/MRL compactor: a full level sorts, keeps every
#   other element starting at a per-level parity bit that FLIPS each
#   compaction — no randomness, so sketches, merges, and the oracle
#   twin are bit-reproducible);
# - merge = element-wise buffer concatenation, then the same
#   compaction rule: while every level stays within capacity the merge
#   is EXACT (the union multiset, weights preserved) — the algebraic
#   partial contract incremental_mv.py needs;
# - serialized as a JSON string column ({"k", "levels", "parity"}),
#   built and merged by Arrow-vectorized GROUPED_AGG pandas UDFs (one
#   python call per group, never per row).

import json as _json


def _kll_new(k: int) -> dict:
    return {"k": int(k), "levels": [[]], "parity": [0]}


def _kll_compress(s: dict) -> dict:
    k = s["k"]
    i = 0
    while i < len(s["levels"]):
        buf = s["levels"][i]
        if len(buf) <= k:
            i += 1
            continue
        buf.sort()
        p = s["parity"][i]
        # Weight conservation (KLL invariant): only an EVEN count may be
        # compacted — promoting every other of 2m items at doubled
        # weight keeps total weight exactly 2m*w. An odd buffer leaves
        # one element behind at level i (which end alternates with the
        # parity bit so the leftover isn't systematically the max);
        # compacting all of an odd buffer would drift total weight by
        # ±w per compaction (r8 advice, sketches.py).
        leftover = []
        if len(buf) % 2:
            leftover = [buf.pop() if p else buf.pop(0)]
        keep = buf[p::2]
        s["parity"][i] = p ^ 1
        s["levels"][i] = leftover
        if i + 1 == len(s["levels"]):
            s["levels"].append([])
            s["parity"].append(0)
        s["levels"][i + 1].extend(keep)
        i += 1
    return s


def _kll_insert_many(s: dict, values) -> dict:
    s["levels"][0].extend(float(v) for v in values)
    return _kll_compress(s)


def _kll_merge_py(a: dict, b: dict) -> dict:
    if a["k"] != b["k"]:
        raise ValueError(f"cannot merge rank sketches with k={a['k']} vs {b['k']}")
    out = {"k": a["k"], "levels": [], "parity": []}
    for i in range(max(len(a["levels"]), len(b["levels"]))):
        la = a["levels"][i] if i < len(a["levels"]) else []
        lb = b["levels"][i] if i < len(b["levels"]) else []
        out["levels"].append(list(la) + list(lb))
        pa = a["parity"][i] if i < len(a["parity"]) else 0
        pb = b["parity"][i] if i < len(b["parity"]) else 0
        out["parity"].append(pa ^ pb)
    return _kll_compress(out)


def _kll_quantile_py(s: dict | None, q: float):
    """Rank-q value (PERCENTILE_DISC semantics: the smallest value whose
    cumulative weight reaches ceil(q * W)) over the weighted items —
    the exact order statistic while the sketch never compacted."""
    import math

    if s is None:
        return None
    items = [
        (v, 1 << lvl)
        for lvl, buf in enumerate(s["levels"])
        for v in buf
    ]
    if not items:
        return None
    items.sort(key=lambda t: t[0])
    total = sum(w for _, w in items)
    target = max(1, math.ceil(total * q))
    cum = 0
    for v, w in items:
        cum += w
        if cum >= target:
            return v
    return items[-1][0]


def kll_partial_agg(value_col: str, k: int = 2048) -> Column:
    """GROUPED_AGG: a group's values → serialized rank sketch. NULLs
    are excluded (SQL aggregate convention, matching the loghist)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _build(v):
        s = _kll_new(k)
        _kll_insert_many(s, v.dropna().astype(float))
        return _json.dumps(s)

    # explicit GROUPED_AGG: the type-hint inference path does not
    # accept Series -> str signatures
    return pandas_udf(_build, "string", PandasUDFType.GROUPED_AGG)(
        F.col(value_col)
    )


def kll_merge_agg(col: str = "kllrank", k: int = 2048) -> Column:
    """GROUPED_AGG: merge a group's serialized sketches — exact
    (the union multiset) while no level overflows."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def _merge(v):
        acc = _kll_new(k)
        for blob in v.dropna():
            acc = _kll_merge_py(acc, _json.loads(blob))
        return _json.dumps(acc)

    return pandas_udf(_merge, "string", PandasUDFType.GROUPED_AGG)(F.col(col))


def kll_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 2048
) -> DataFrame:
    """One rank sketch per group as ``kllrank`` string — the
    join-shaped builder incremental_mv.py composes with its other
    partials (same contract as loghist_sketch).

    Scale shape: per-PARTITION partial sketches via mapInPandas
    (memory bounded at ~k·log(n/k) per live group per partition —
    Arrow batches stream through, raw values are never held), then the
    per-group merge reduces only the small serialized sketches. A
    grouped-agg UDF over the raw values would instead ship EVERY row
    of a group to one task — the loghist avoids that with map-side
    bucket counts; this is the sketch-partial equivalent."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    gcols = list(group_cols)
    src = df.select(*gcols, value_col)
    out_schema = StructType(
        [*[src.schema[c] for c in gcols], StructField("kllrank", StringType())]
    )

    def _build(batches):
        acc: dict = {}
        for pdf in batches:
            for gkey, sub in pdf.groupby(gcols, dropna=False, sort=False):
                if not isinstance(gkey, tuple):
                    gkey = (gkey,)
                s = acc.get(gkey)
                if s is None:
                    s = acc[gkey] = _kll_new(k)
                _kll_insert_many(s, sub[value_col].dropna())
        yield pd.DataFrame(
            [(*gkey, _json.dumps(s)) for gkey, s in acc.items()],
            columns=[*gcols, "kllrank"],
        )

    partials = src.mapInPandas(_build, out_schema)
    return partials.groupBy(*gcols).agg(
        kll_merge_agg("kllrank", k).alias("kllrank")
    )


def kll_quantile(col: Column, q: float) -> Column:
    """Quantile finalizer (vectorized; runs only over final per-group
    rows, like loghist_quantile)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _q(blobs):
        return pd.Series(
            [
                None if b is None else _kll_quantile_py(_json.loads(b), q)
                for b in blobs
            ]
        )

    return pandas_udf(_q, DoubleType())(col)
