"""SCD2 (slowly changing dimension, type 2) emulation on plain parquet.

MERGE-free CDC pattern (§2B "CDC / SCD2"): each batch of changed rows
closes the current version of changed keys (sets valid_to) and appends
new open versions. Composed from the same anti-join/union kernels as
the upsert operator — one shuffle on the business key.

With Delta/Iceberg available this is a single MERGE INTO; the emulation
keeps identical output semantics.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_TS = dt.datetime(9999, 12, 31)


def scd2_init(batch: DataFrame, keys: Sequence[str], effective_ts: str) -> DataFrame:
    """Open a first version for every row."""
    return batch.withColumn("valid_from", F.col(effective_ts)).withColumn(
        "valid_to", F.lit(OPEN_TS)
    )


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    effective_ts: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Apply a change batch to an SCD2 dimension table.

    - unchanged keys: versions pass through untouched;
    - changed keys: the open version closes at the batch's effective
      ts, a new open version appends;
    - new keys: a first open version appends.
    Rows whose compare_cols are identical to the current open version
    are no-ops (no spurious versions).

    A batch may carry several rows per key (e.g. a CDC feed replaying
    multiple updates): only the LATEST row per key by effective_ts is
    applied — micro-batch semantics collapse intermediate versions to
    the final state. Without this dedup the changed-keys inner join
    would fan out, producing multiple open versions and duplicated
    closing rows.
    """
    from hapiy_etl_spark.operators.upsert import dedup_by_key

    key_list = list(keys)
    batch = dedup_by_key(batch, key_list, order_col=effective_ts)
    open_rows = dim.where(F.col("valid_to") == F.lit(OPEN_TS))
    closed_rows = dim.where(F.col("valid_to") != F.lit(OPEN_TS))

    # detect real changes: anti-join on (keys + compare_cols) keeps
    # batch rows that differ from (or don't exist in) the open version
    changed = batch.join(
        open_rows.select(*key_list, *compare_cols),
        on=key_list + list(compare_cols),
        how="left_anti",
    )

    changed_keys = changed.select(*key_list, F.col(effective_ts).alias("__eff"))
    closing = (
        open_rows.join(changed_keys, on=key_list, how="inner")
        .withColumn("valid_to", F.col("__eff"))
        .drop("__eff")
    )
    surviving_open = open_rows.join(changed_keys.select(*key_list), on=key_list, how="left_anti")
    new_versions = scd2_init(changed, key_list, effective_ts)

    return closed_rows.unionByName(surviving_open).unionByName(closing).unionByName(new_versions)


def scd2_current(dim: DataFrame) -> DataFrame:
    """The current (open) snapshot."""
    return dim.where(F.col("valid_to") == F.lit(OPEN_TS)).drop("valid_to")


def scd2_as_of(dim: DataFrame, ts: dt.datetime) -> DataFrame:
    """Point-in-time snapshot: the version valid at ts."""
    return dim.where((F.col("valid_from") <= F.lit(ts)) & (F.col("valid_to") > F.lit(ts)))
