"""Observability (reference R15 parity, git_etl.ts:67-71): per-batch
row counts and aggregates WITHOUT extra passes.

The reference logs counts by iterating rows it already holds; the Spark
analogue is `DataFrame.observe` — named metrics piggyback on whatever
action materializes the frame, so a pipeline gets its counts for free
instead of paying a second scan for `df.count()`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, *metrics) -> tuple[DataFrame, Observation]:
    """Attach named metrics to a frame; read ``obs.get`` after an action.

    Default metrics: row count + null count of the first column.
    """
    obs = Observation(name)
    if not metrics:
        first = df.columns[0]
        metrics = (
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col(first).isNull(), 1).otherwise(0)).alias(f"null_{first}"),
        )
    return df.observe(obs, *metrics), obs
