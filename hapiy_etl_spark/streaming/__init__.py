"""Structured Streaming jobs (SURVEY.md §2B "Streaming")."""

from hapiy_etl_spark.streaming.jobs import (  # noqa: F401
    EVENTS_STREAM_SCHEMA,
    foreach_batch_upsert,
    read_events_stream,
    run_to_memory,
    stream_dedup_within_watermark,
    stream_session_counts,
    stream_tumbling_counts,
)
