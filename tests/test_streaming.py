"""Structured Streaming smoke + batch-equivalence tests (SURVEY.md §5.5).

DuckDB can't run streams, so the checks are: (a) the streaming query
completes on the real events data via AvailableNow micro-batches, and
(b) its result equals the batch twin that IS oracle-checked."""

from __future__ import annotations

from pyspark.sql import functions as F

from hapiy_etl_spark.queries.events import window_tumbling
from hapiy_etl_spark.streaming.jobs import (
    foreach_batch_upsert,
    read_events_stream,
    run_to_memory,
    stream_dedup_within_watermark,
    stream_tumbling_counts,
)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    run_to_memory(stream_tumbling_counts(events), "tumbling_out", output_mode="append")
    stream_rows = {
        (r.window_start, r.event_type): r.n for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch_rows = {
        (r.window_start, r.event_type): r.n
        for r in window_tumbling(spark, sf_dir).select("window_start", "event_type", "n").collect()
    }
    # watermark may hold back the final in-flight windows in append mode;
    # everything emitted must match the batch twin exactly
    assert stream_rows
    for k, n in stream_rows.items():
        assert batch_rows.get(k) == n, k
    assert len(stream_rows) >= len(batch_rows) - 5


def test_stream_dedup_within_watermark(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    run_to_memory(stream_dedup_within_watermark(events, ["event_id"]), "dedup_out")
    n_stream = spark.sql("SELECT count(DISTINCT event_id) AS n FROM dedup_out").first().n
    n_total = spark.sql("SELECT count(*) AS n FROM dedup_out").first().n
    assert n_stream == n_total  # no key delivered twice


def test_foreach_batch_upsert_sink(spark, sf_dir, tmp_path):
    events = read_events_stream(spark, sf_dir)
    q = foreach_batch_upsert(
        events.select("event_id", "user_id", "value"),
        str(tmp_path / "sink"),
        keys=["event_id"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "sink"))
    src_n = read_events_stream(spark, sf_dir).sparkSession.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out.count() == src_n
    assert out.select("event_id").distinct().count() == src_n
