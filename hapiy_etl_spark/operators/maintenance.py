"""Table maintenance: small-file compaction and stratified sampling.

At 100 TB the silent killers are file-count explosions (streaming
sinks, per-batch appends) and unbalanced samples; both fixes are
one-liners that belong in the operator library so jobs reach for them.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    partition_by: Sequence[str] | None = None,
) -> int:
    """Rewrite a parquet dir into ~target_files files (per partition when
    partitioned). coalesce() avoids a shuffle when reducing; the rewrite
    goes through a temp dir + swap like the upsert sink.

    Returns the file count after compaction.
    """
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    writer = df.coalesce(target_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    tmp = tempfile.mkdtemp(prefix="compact_")
    writer.parquet(f"{tmp}/data")
    shutil.rmtree(path)
    shutil.move(f"{tmp}/data", path)
    shutil.rmtree(tmp, ignore_errors=True)
    return sum(1 for p in Path(path).rglob("*.parquet"))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (df.sampleBy) — balanced training
    subsets from skewed class distributions."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)
