"""As-of join: for each left row, the most recent right row at-or-before
(or strictly before) its timestamp, per key (SURVEY.md §2B "Joins").

Spark has no native as-of join. The naive composition (range join +
row_number) explodes to |L|x|R| pairs per key before pruning. This
implementation is the scale-correct union trick:

    union(left, right) → single shuffle on key → sort by ts
    → last(right_col, ignorenulls=True) over a running window
    → keep left rows

One shuffle, no pair blow-up, linear in |L|+|R| — survives 100 TB where
the pairwise form dies. DuckDB's native ASOF JOIN is the oracle twin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    *,
    strict: bool = False,
    how: str = "inner",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join, backward (default) or forward, with optional tolerance.

    Backward: for every left row, attach ``right_cols`` from the latest
    right row with ``right.right_ts <= left.left_ts`` (``<`` when
    ``strict``). Forward: from the EARLIEST right row with
    ``right_ts >= left_ts`` (``>`` when ``strict``) — the
    next-event-attribution shape. ``tolerance_seconds`` bounds the
    match distance ``|left_ts - right_ts|``; beyond it the left row
    counts as unmatched (dropped under ``how='inner'``, right columns
    null under ``how='left'``). Matching is on ``on`` keys.

    Both directions are the same union + running-window plan — forward
    just sorts time DESCENDING, so "last preceding right row" becomes
    "nearest following right row". Still one shuffle, linear in
    |L|+|R|, no pair blow-up.

    Right rows must be unique per (key, right_ts) for a deterministic
    result — pre-aggregate the right side otherwise.
    """
    keys = [on] if isinstance(on, str) else list(on)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")

    # All right columns travel as ONE struct: last(ignorenulls) over a
    # single payload guarantees every filled column comes from the SAME
    # right row (per-column fills could mix rows when right values are
    # null), and the struct — non-null for every right row even when all
    # its fields are null — doubles as the match marker, so a genuine
    # null right value is not conflated with "no match". The matched
    # right timestamp rides in the struct for the tolerance check.
    payload = "__asof_payload"
    mts = "__asof_matched_ts"
    lhs = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(0))
    rhs = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.struct(
            F.col(right_ts).alias(mts), *[F.col(c) for c in right_cols]
        ).alias(payload),
    ).withColumn(_SIDE, F.lit(1))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # At equal ts: non-strict → right sorts first (visible to the left
    # row); strict → left sorts first (right not yet visible). The same
    # side rule holds in both directions.
    side_order = F.col(_SIDE).desc() if not strict else F.col(_SIDE).asc()
    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    w = (
        W.partitionBy(*keys)
        .orderBy(ts_order, side_order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select("*", F.last(payload, ignorenulls=True).over(w).alias("__filled"))
    matched = F.col("__filled").isNotNull()
    if tolerance_seconds is not None:
        gap = F.col(_TS).cast("double") - F.col(f"__filled.{mts}").cast("double")
        if direction == "forward":
            gap = -gap
        matched = matched & (gap <= F.lit(float(tolerance_seconds)))
    kept = F.when(matched, F.col("__filled"))
    out = (
        filled.where(F.col(_SIDE) == 0)
        .withColumn("__kept", kept)
        .drop(_SIDE, _TS, payload, "__filled")
        .select("*", *[F.col(f"__kept.{c}").alias(c) for c in right_cols])
    )
    if how == "inner":
        out = out.where(F.col("__kept").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out.drop("__kept")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    *,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Interval overlap join: pairs where [ls, le) ∩ [rs, re) ≠ ∅, per key.

    With ``bucket_seconds``, both sides are exploded onto coarse time
    buckets and equi-joined on (key, bucket) before the exact overlap
    filter — turning a per-key cartesian into a hash join whose fan-out
    is bounded by interval_length/bucket. Use buckets ≳ the typical
    interval length. Without it, a plain conditional join (fine when
    keys are selective).

    A pair overlapping several buckets would match once per shared
    bucket; instead of deduplicating afterwards (an extra wide-key
    shuffle, and it would also collapse genuinely identical input rows)
    each pair is emitted ONLY from the bucket containing its overlap
    start, max(l_start, r_start) — every overlapping pair shares that
    bucket, so exactly one match survives.
    """
    keys = [on] if isinstance(on, str) else list(on)
    overlap = (F.col(f"l.{left_start}") < F.col(f"r.{right_end}")) & (
        F.col(f"r.{right_start}") < F.col(f"l.{left_end}")
    )
    key_eq = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in keys]
    lhs, rhs = left.alias("l"), right.alias("r")
    if bucket_seconds is None:
        cond = key_eq[0] if key_eq else overlap
        for k in key_eq[1:]:
            cond = cond & k
        return lhs.join(rhs, cond & overlap if key_eq else overlap)

    def with_buckets(df: DataFrame, start: str, end: str) -> DataFrame:
        s = (F.col(start).cast("long") / bucket_seconds).cast("long")
        e = (F.col(end).cast("long") / bucket_seconds).cast("long")
        return df.withColumn("__bucket", F.explode(F.sequence(s, e)))

    lb = with_buckets(left, left_start, left_end).alias("l")
    rb = with_buckets(right, right_start, right_end).alias("r")
    cond = F.col("l.__bucket") == F.col("r.__bucket")
    for k in key_eq:
        cond = cond & k
    overlap_start_bucket = (
        F.greatest(F.col(f"l.{left_start}"), F.col(f"r.{right_start}")).cast("long")
        / bucket_seconds
    ).cast("long")
    return (
        lb.join(rb, cond & overlap & (F.col("l.__bucket") == overlap_start_bucket))
        .drop(F.col("l.__bucket"))
        .drop(F.col("r.__bucket"))
    )
