"""Stream-static join and sliding-window stream vs their batch twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from hapiy_etl_spark.io import read_table
from hapiy_etl_spark.queries.events import window_sliding
from hapiy_etl_spark.streaming.jobs import (
    read_events_stream,
    run_to_memory,
    sliding_counts_stream,
    stream_static_enrich,
)


def test_stream_static_join_matches_batch(spark, sf_dir):
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, category string",
    )
    events = read_events_stream(spark, sf_dir)
    run_to_memory(stream_static_enrich(events, dim), "enriched_out")
    stream_counts = {
        r.category: r.n
        for r in spark.sql(
            "SELECT category, count(*) n FROM enriched_out GROUP BY category"
        ).collect()
    }
    batch_counts = {
        r.category: r.n
        for r in read_table(spark, sf_dir, "events")
        .join(dim, "event_type", "left")
        .groupBy("category")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert stream_counts == batch_counts and len(stream_counts) >= 4


def test_sliding_stream_matches_batch(spark, sf_dir):
    events = read_events_stream(spark, sf_dir)
    run_to_memory(sliding_counts_stream(events), "sliding_out")
    stream_rows = {
        (r.window_start, r.event_type): r.n
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    batch_rows = {
        (r.window_start, r.event_type): r.n for r in window_sliding(spark, sf_dir).collect()
    }
    assert stream_rows
    for k, n in stream_rows.items():
        assert batch_rows.get(k) == n, k
