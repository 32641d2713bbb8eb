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


FINAL_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def finalized_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions emitted ONLY when closed — either a new event
    arrives past the gap, or the event-time watermark passes
    last_event + gap (EventTimeTimeout). This is the operator
    session_window can't express in update-as-you-go form: nothing is
    emitted for a session still in flight, and idle sessions finalize
    from the timeout, not from new data.
    """
    gap_ms = gap_minutes * 60 * 1000

    def update(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        out = []
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            out.append((key[0], start_ms, last_ms + gap_ms, n))
        else:
            ts_ms: list[int] = []
            for pdf in pdfs:
                ts_ms.extend(int(v.value // 1_000_000) for v in pdf["ts"])
            ts_ms.sort()
            if not ts_ms:
                return
            if state.exists:
                start_ms, last_ms, n = state.get
            else:
                start_ms, last_ms, n = ts_ms[0], ts_ms[0], 0
            for t_ms in ts_ms:
                if t_ms - last_ms > gap_ms:
                    out.append((key[0], start_ms, last_ms + gap_ms, n))
                    start_ms, last_ms, n = t_ms, t_ms, 1
                else:
                    last_ms = max(last_ms, t_ms)
                    n += 1
            state.update((start_ms, last_ms, n))
            state.setTimeoutTimestamp(last_ms + gap_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "session_start_ms", "session_end_ms", "n_events"]
            )

    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=FINAL_SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def idle_flush_totals(events: DataFrame, idle_seconds: int = 2) -> DataFrame:
    """Per-user accumulator flushed on PROCESSING-time idleness — the
    third GroupState timeout mode next to EventTimeTimeout
    (`finalized_sessions`) and NoTimeout (`running_user_totals`).

    Rows accumulate (n, total) per key; nothing is emitted while data
    keeps arriving. Once a key sees no new data for `idle_seconds` of
    wall-clock time, the next micro-batch invokes the function with
    `hasTimedOut`, the snapshot is emitted, and state is cleared — the
    pattern for flushing per-key buffers to a sink when an upstream
    producer goes quiet, independent of event time (the reference's
    cron-driven "write what you have" flush, keyed). Unlike event-time
    timeouts this needs no watermark: the clock is the engine's, so an
    idle key flushes even if NO key ever advances event time. State is
    keyed and checkpointed, sharding across executors like a shuffle.

    Operational cost: while any processing-time state exists the engine
    self-schedules no-data micro-batches to evaluate the clock
    (shouldRunAnotherBatch is unconditionally true for this timeout
    mode), so an ASAP trigger busy-loops; production jobs should pair
    this operator with a processingTime trigger ≥ the desired clock
    resolution. `processAllAvailable()` consequently never settles —
    drive tests by polling the sink.
    """
    timeout_ms = idle_seconds * 1000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
            )
        else:
            n, total = state.get if state.exists else (0, 0.0)
            for pdf in pdfs:
                n += len(pdf)
                total += float(pdf["value"].sum())
            state.update((n, total))
            state.setTimeoutDuration(timeout_ms)

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
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


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Spark 4 `transformWithStateInPandas` twin of `running_user_totals`.

    Same semantics (per-user running (n, total) across micro-batches,
    update-mode emission), expressed in the new StatefulProcessor API —
    the successor to applyInPandasWithState: typed state handles
    (ValueState/ListState/MapState) instead of one opaque tuple, state
    TTL support, and per-processor init/close lifecycle. Kept alongside
    the GroupState form so both stateful surfaces stay covered.

    Runtime requirements (enforced by Spark, not this module): the
    RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass = ...RocksDBStateStoreProvider``)
    and the ``protobuf`` package for the transformWithState Python
    runner. This container lacks protobuf, so the execution test is
    skip-gated (tests/test_streaming_stateful.py); the plan construction
    itself is exercised unconditionally.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
