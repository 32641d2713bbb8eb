"""Time-series operators: regular-grid resampling and gap-fill
(forward fill) — the feature-engineering companions to the window ops.

Both are pure column algebra / window compositions:
- the time spine comes from `sequence()` + `explode` (no driver loop,
  cardinality derived per group inside the plan);
- forward fill is `last(value, ignorenulls=True)` over an unbounded
  preceding window — one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def time_spine(df: DataFrame, key: str, ts: str, step_seconds: int) -> DataFrame:
    """One row per (key, grid_ts) covering [min(ts), max(ts)] per key at
    a regular step, grid-aligned to the epoch."""
    bounds = df.groupBy(key).agg(F.min(ts).alias("__lo"), F.max(ts).alias("__hi"))
    lo = (F.col("__lo").cast("long") / step_seconds).cast("long") * step_seconds
    hi = (F.col("__hi").cast("long") / step_seconds).cast("long") * step_seconds
    return bounds.select(
        key,
        F.explode(F.sequence(lo, hi, F.lit(step_seconds))).alias("__epoch"),
    ).select(key, F.timestamp_seconds("__epoch").alias("grid_ts"))


def slot_grid(
    df: DataFrame, key: str, ts: str, value: str, step_seconds: int
) -> DataFrame:
    """The shared resample scaffold: one row per (key, grid_ts) over the
    key's observed span, with ``slot_value`` = the slot's latest
    observation (max ts wins, value desc as tiebreak) or null for gap
    slots. One shuffle for the per-slot pick, one for the spine join —
    both on the group key, so downstream window fills ride the same
    partitioning."""
    slot = (F.col(ts).cast("long") / step_seconds).cast("long") * step_seconds
    per_slot = (
        df.select(key, slot.alias("__epoch"), F.col(ts).alias("__ts"), F.col(value).alias("__v"))
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy(key, "__epoch").orderBy(F.col("__ts").desc(), F.col("__v").desc())
            ),
        )
        .where(F.col("__rn") == 1)
        .select(key, "__epoch", F.col("__v").alias("slot_value"))
    )
    spine = time_spine(df, key, ts, step_seconds)
    return spine.join(
        per_slot,
        (spine[key] == per_slot[key]) & (spine.grid_ts.cast("long") == per_slot.__epoch),
        "left",
    ).select(spine[key], "grid_ts", "slot_value")


def resample_ffill(
    df: DataFrame, key: str, ts: str, value: str, step_seconds: int
) -> DataFrame:
    """Resample each key's series onto a regular grid, carrying the last
    observation forward (step-function semantics).

    Grid slot t gets the latest observation with ts <= t+step-1 within
    the slot, else the previous slot's carried value; leading slots
    before the first observation stay null.
    """
    joined = slot_grid(df, key, ts, value, step_seconds)
    ffill = W.partitionBy(key).orderBy("grid_ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    return joined.select(
        key,
        "grid_ts",
        F.last("slot_value", ignorenulls=True).over(ffill).alias("value_ffill"),
    )


def resample_interpolate(
    df: DataFrame, key: str, ts: str, value: str, step_seconds: int
) -> DataFrame:
    """Resample onto a regular grid with LINEAR interpolation across
    interior gaps: a gap slot between two observed slots gets
    prev + (next - prev) * (t - t_prev) / (t_next - t_prev); slots after
    the last observation carry it forward (no extrapolation); slots
    before the first observation stay null. ``is_observed`` marks real
    slots vs filled ones.

    Two symmetric window passes over the same key partitioning (last
    non-null looking back, first non-null looking ahead) — no self-join,
    no per-key collect; the interpolation itself is scan-local column
    arithmetic.
    """
    joined = slot_grid(df, key, ts, value, step_seconds)
    ep = F.col("grid_ts").cast("long")
    w_prev = (
        W.partitionBy(key).orderBy("grid_ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_next = (
        W.partitionBy(key).orderBy("grid_ts").rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    observed_ep = F.when(F.col("slot_value").isNotNull(), ep)
    marked = joined.select(
        key,
        "grid_ts",
        "slot_value",
        ep.alias("__ep"),
        F.last("slot_value", ignorenulls=True).over(w_prev).alias("__pv"),
        F.last(observed_ep, ignorenulls=True).over(w_prev).alias("__pe"),
        F.first("slot_value", ignorenulls=True).over(w_next).alias("__nv"),
        F.first(observed_ep, ignorenulls=True).over(w_next).alias("__ne"),
    )
    interp = (
        F.when(F.col("slot_value").isNotNull(), F.col("slot_value"))
        .when(
            F.col("__pv").isNotNull() & F.col("__nv").isNotNull(),
            F.col("__pv")
            + (F.col("__nv") - F.col("__pv"))
            * (F.col("__ep") - F.col("__pe"))
            / (F.col("__ne") - F.col("__pe")),
        )
        .when(F.col("__pv").isNotNull(), F.col("__pv"))
    )
    return marked.select(
        key,
        "grid_ts",
        interp.alias("value_interp"),
        F.col("slot_value").isNotNull().alias("is_observed"),
    )


def interval_union_stats(
    df: DataFrame, key: str, start: str, end: str
) -> DataFrame:
    """Total covered time per key after merging overlapping/touching
    intervals (the interval-union aggregate), plus the merged-segment
    count — the gaps-and-islands sweep as pure window algebra.

    Sweep: sort by (start, end) per key; an interval starts a new
    segment iff its start lies strictly after the running max of all
    prior ends; the running sum of new-segment flags is the segment id;
    min(start)/max(end) per segment give the merged spans.

    One shuffle on the key; everything else rides that partitioning.
    Durations are computed in integer MICROSECONDS (unix_micros), so
    the sum is exact long arithmetic — no float accumulation seam.
    """
    w_prev = (
        W.partitionBy(key)
        .orderBy(start, end)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy(key)
        .orderBy(start, end)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_max_end = F.max(end).over(w_prev)
    is_new = (prev_max_end.isNull() | (F.col(start) > prev_max_end)).cast("long")
    segments = (
        df.select(key, start, end)
        .withColumn("__seg", F.sum(is_new).over(w_run))
        .groupBy(key, "__seg")
        .agg(
            F.min(F.unix_micros(F.col(start))).alias("__s"),
            F.max(F.unix_micros(F.col(end))).alias("__e"),
        )
    )
    return segments.groupBy(key).agg(
        F.sum(F.col("__e") - F.col("__s")).alias("covered_micros"),
        F.count("*").alias("n_segments"),
    )
