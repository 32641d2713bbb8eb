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
