"""Stateful streaming operator + late-data watermark behavior +
bucketed/partitioned write paths (scale posture)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hapiy_etl_spark.io import read_table, write_partitioned
from hapiy_etl_spark.streaming.jobs import read_events_stream, run_to_memory
from hapiy_etl_spark.streaming.stateful import running_user_totals


def test_stateful_running_totals_matches_batch(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    run_to_memory(running_user_totals(events), "running_out", output_mode="update")
    # last update per user must equal the batch aggregate
    stream = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
              FROM running_out) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r.user_id: (r.n, r.total)
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    assert set(stream) == set(batch)
    for u in batch:
        assert stream[u][0] == batch[u][0], u
        assert abs(stream[u][1] - batch[u][1]) < 1e-6, u


def test_watermark_drops_late_rows(spark, tmp_path):
    """A row older than (max_event_time - watermark) arriving in a later
    micro-batch is dropped from append-mode windowed aggregation."""
    import datetime as dt

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows, name):
        spark.createDataFrame(rows, "ts timestamp, k string").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    # batch 1: events up to 12:00 → watermark advances to 11:50
    write_batch([(t0, "a"), (t0 + dt.timedelta(hours=2), "a")], "b1")

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "30 minutes").alias("w"), "k")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "k", "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    # batch 2: a very late row at 10:05 — far behind the 11:50 watermark
    write_batch([(t0 + dt.timedelta(minutes=5), "a")], "b2")
    q.processAllAvailable()
    q.stop()
    rows = {(r.ws, r.n) for r in spark.sql("SELECT ws, k, n FROM late_out").collect()}
    # the 10:00 window closed with n=1; the late row did NOT bump it to 2
    assert (t0, 1) in rows
    assert (t0, 2) not in rows


def test_event_time_timeout_finalizes_idle_session(spark, tmp_path):
    """A session with no further events must finalize when the event-time
    watermark (advanced by OTHER keys' data) passes last_event + gap."""
    import datetime as dt

    from hapiy_etl_spark.streaming.stateful import finalized_sessions

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def write(rows):
        spark.createDataFrame(rows, "ts timestamp, user_id long").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # user 1: two events 10:00, 10:10 → session [10:00, 10:40) once closed
    write([(t0, 1), (t0 + dt.timedelta(minutes=10), 1)])

    stream = (
        spark.readStream.schema("ts timestamp, user_id long").parquet(src)
    )
    q = (
        finalized_sessions(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT * FROM sessions_out").count() == 0  # in flight: nothing emitted

    # user 2 far in the future pushes the watermark past user 1's gap
    write([(t0 + dt.timedelta(hours=5), 2)])
    q.processAllAvailable()
    # one more batch so the timeout (evaluated against the new watermark) fires
    write([(t0 + dt.timedelta(hours=6), 2)])
    q.processAllAvailable()
    q.stop()

    rows = {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    start_ms = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    end_ms = start_ms + 40 * 60 * 1000  # last event 10:10 + 30m gap
    assert (1, start_ms, end_ms, 2) in rows, rows


def test_processing_time_timeout_flushes_idle_key(spark, tmp_path):
    """A key with NO further data must flush once wall-clock idleness
    exceeds the timeout — emitted from `hasTimedOut`, not from new data
    for that key, and with no watermark in the plan at all.

    NOTE the harness shape: with ProcessingTimeTimeout the engine
    self-schedules no-data micro-batches to evaluate the clock
    (FlatMapGroupsWithState.shouldRunAnotherBatch is always true), so
    `processAllAvailable()` never settles — the test POLLS the memory
    sink instead, and needs no driver data to make the timeout fire."""
    import time

    from hapiy_etl_spark.streaming.stateful import idle_flush_totals

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, 10.0), (1, 5.5)], "user_id long, value double"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    q = (
        idle_flush_totals(stream, idle_seconds=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("idle_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    t0 = time.time()
    # nothing may be emitted before idle_seconds of wall-clock pass
    if time.time() - t0 < 1.5:
        assert spark.sql("SELECT * FROM idle_out").count() == 0
    flushed = []
    deadline = time.time() + 60
    while time.time() < deadline and not flushed:
        flushed = spark.sql(
            "SELECT user_id, n_events, total_value FROM idle_out WHERE user_id = 1"
        ).collect()
        if not flushed:
            time.sleep(0.5)
    q.stop()
    assert flushed, "idle key never flushed"
    assert (flushed[0].n_events, flushed[0].total_value) == (2, 15.5)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    write_partitioned(read_table(spark, sf_dir, "events"), out, partition_by=["event_type"])
    back = spark.read.parquet(out).where(F.col("event_type") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    n_click = read_table(spark, sf_dir, "events").where(F.col("event_type") == "click").count()
    assert back.count() == n_click


def test_bucketed_table_join_avoids_shuffle(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    # warehouse.dir is static — point each table at tmp via path option
    orders.write.mode("overwrite").option("path", str(tmp_path / "ob")).bucketBy(
        8, "o_orderkey"
    ).sortBy("o_orderkey").saveAsTable("orders_bucketed")
    li.write.mode("overwrite").option("path", str(tmp_path / "lb")).bucketBy(
        8, "l_orderkey"
    ).sortBy("l_orderkey").saveAsTable("lineitem_bucketed")
    ob = spark.table("orders_bucketed")
    lb = spark.table("lineitem_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy("o_orderstatus").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        join_section = plan.split("SortMergeJoin")[0] if "SortMergeJoin" in plan else plan
        # bucketed-on-key join: no Exchange (shuffle) below the join
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")

def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_tws_plan_constructs(spark, sf_dir):
    """transformWithStateInPandas plan builds against the streaming
    source (API wiring check — execution needs protobuf + RocksDB)."""
    from hapiy_etl_spark.streaming.stateful import running_user_totals_tws

    out = running_user_totals_tws(read_events_stream(spark, sf_dir))
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["user_id", "n_events", "total_value"]


import pytest as _pytest


@_pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithState Python runner requires protobuf (absent in container)",
)
def test_tws_running_totals_matches_batch(spark, sf_dir):
    """transformWithStateInPandas (Spark 4 StatefulProcessor) produces
    the same final per-user totals as the GroupState form and the batch
    aggregate."""
    from hapiy_etl_spark.streaming.stateful import running_user_totals_tws

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    events = read_events_stream(spark, sf_dir)
    run_to_memory(running_user_totals_tws(events), "tws_out", output_mode="update")
    stream = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql(
            """
            SELECT user_id, n_events, total_value FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
              FROM tws_out) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r.user_id: (r.n, r.total)
        for r in read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    }
    assert set(stream) == set(batch)
    for u in batch:
        assert stream[u][0] == batch[u][0], u
        assert abs(stream[u][1] - batch[u][1]) < 1e-6, u


def test_watermark_drop_counter_surfaces(spark, tmp_path):
    """The dropped-late-row count is observable engine-side
    (numRowsDroppedByWatermark) through ProgressCapture — the
    silent-data-loss alert hook."""
    import datetime as dt
    import time

    from hapiy_etl_spark.operators.metrics import ProgressCapture, watermark_drop_counts

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(rows):
        spark.createDataFrame(rows, "ts timestamp, k string").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    write_batch([(t0, "a"), (t0 + dt.timedelta(hours=2), "a")])

    cap = ProgressCapture.attach(spark)
    try:
        stream = (
            spark.readStream.schema("ts timestamp, k string")
            .parquet(src)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "30 minutes").alias("w"), "k")
            .agg(F.count("*").alias("n"))
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("dropcount_out")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        write_batch([(t0 + dt.timedelta(minutes=5), "a")])  # far behind watermark
        q.processAllAvailable()
        q.stop()
        deadline = time.time() + 15
        while time.time() < deadline and watermark_drop_counts(cap.progress) == 0:
            time.sleep(0.3)
        assert watermark_drop_counts(cap.progress) == 1
    finally:
        cap.detach(spark)
