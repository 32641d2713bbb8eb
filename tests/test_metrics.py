"""observe()-based metrics: counts without extra passes (R15 parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hapiy_etl_spark.io import read_table
from hapiy_etl_spark.operators.metrics import observed


def test_observed_counts_piggyback_on_action(spark, sf_dir, tmp_path):
    src = read_table(spark, sf_dir, "orders")
    df, obs = observed(
        src,
        "orders_batch",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )
    # ONE action (the write) produces both the data and the metrics
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == src.count()
    assert got["total"] > 0


def test_streaming_progress_capture_and_observe(spark, sf_dir, tmp_path):
    """R15 streaming flavor: listener sees per-batch input rows, and
    observe() metrics ride the stream into observedMetrics."""
    import time

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.metrics import ProgressCapture
    from hapiy_etl_spark.streaming.jobs import read_events_stream

    cap = ProgressCapture.attach(spark)
    try:
        from pyspark.sql import Observation

        events = read_events_stream(spark, sf_dir)
        obs_stream = events.observe(
            "ingest", F.count(F.lit(1)).alias("n_rows"), F.max("value").alias("max_value")
        )
        q = (
            obs_stream.groupBy("event_type")
            .count()
            .writeStream.format("memory")
            .queryName("obs_out")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener events are delivered asynchronously
        deadline = time.time() + 15
        while time.time() < deadline and not cap.observed("ingest"):
            time.sleep(0.3)
        total_expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        seen = cap.observed("ingest")
        assert seen, "no observed metrics delivered"
        assert sum(m["n_rows"] for m in seen) == total_expected
        assert sum(n for _, n in cap.rows_per_batch()) == total_expected
    finally:
        cap.detach(spark)
