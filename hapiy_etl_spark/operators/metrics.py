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


class ProgressCapture:
    """StreamingQueryListener that collects per-batch progress — the
    streaming face of R15 observability (reference git_etl.ts:67-71
    logs per-poll counts; Structured Streaming surfaces the same
    numbers engine-side as StreamingQueryProgress, including any
    `observe` metrics attached to the stream, with zero extra passes).

    Usage:
        cap = ProgressCapture.attach(spark)
        ... run streaming query ...
        cap.rows_per_batch()   # [(batch_id, numInputRows), ...]
        cap.observed("name")   # observedMetrics rows for an Observation
        cap.detach(spark)
    """

    def __init__(self) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        capture = self

        class _Listener(StreamingQueryListener):
            def onQueryStarted(self, event) -> None:
                pass

            def onQueryProgress(self, event) -> None:
                capture.progress.append(event.progress)

            def onQueryIdle(self, event) -> None:
                pass

            def onQueryTerminated(self, event) -> None:
                pass

        self.progress: list = []
        self._listener = _Listener()

    @classmethod
    def attach(cls, spark) -> "ProgressCapture":
        cap = cls()
        spark.streams.addListener(cap._listener)
        return cap

    def detach(self, spark) -> None:
        spark.streams.removeListener(self._listener)

    def rows_per_batch(self) -> list[tuple[int, int]]:
        return [(p.batchId, p.numInputRows) for p in self.progress]

    def observed(self, name: str) -> list[dict]:
        out = []
        for p in self.progress:
            m = p.observedMetrics.get(name)
            if m is not None:
                out.append(m.asDict())
        return out


def watermark_drop_counts(progress_list) -> int:
    """Total rows dropped by watermark across captured progress events —
    the silent-data-loss counter a production stream must alert on
    (stateOperators[].numRowsDroppedByWatermark)."""
    total = 0
    for p in progress_list:
        for op in p.stateOperators:
            total += int(op.numRowsDroppedByWatermark or 0)
    return total
