"""Invariant tests for approximate aggregates (no DuckDB oracle —
sketches are engine-specific, so bounds are asserted instead)."""

from __future__ import annotations

from hapiy_etl_spark.queries.aggregates import agg_approx_count_distinct, agg_percentile_approx


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    row = agg_approx_count_distinct(spark, sf_dir).first()
    # rsd=0.01 → generous 5% band
    assert abs(row.approx_orders - row.exact_orders) <= max(1, 0.05 * row.exact_orders)


def test_percentile_approx_near_exact(spark, sf_dir):
    """The registered query runs GK in its exact regime (oracle-checked
    vs PERCENTILE_DISC); this invariant pins the APPROXIMATE regime the
    oracle can't see: at accuracy=100 on ~1.5k rows the rank error is
    bounded by n/accuracy, so the returned element stays within a few
    percent of the exact median."""
    from pyspark.sql import functions as F

    from hapiy_etl_spark.io import load_tables

    row = agg_percentile_approx(spark, sf_dir).first()
    t = load_tables(spark, sf_dir, ("orders",))
    approx_small, exact = t["orders"].agg(
        F.percentile_approx("o_totalprice", 0.5, 100),
        F.percentile("o_totalprice", 0.5),
    ).first()
    assert abs(row.approx_median - exact) / exact < 0.01  # exact regime
    assert abs(approx_small - exact) / exact < 0.05  # GK bound regime
    assert row.approx_q1 < row.approx_median < row.approx_q99


def test_approx_top_k_small_sketch_keeps_true_heavy_hitter(spark, sf_dir):
    """The registered agg_approx_top_k_freq runs the sketch in its exact
    regime (maxItemsTracked >> NDV, oracle-checked). This pins the
    APPROXIMATE regime the oracle can't see: a sketch tracking only 10
    items over a stream of 1 dominant key (500 hits) + 200 singletons
    must still surface the dominant key as top-1 with a count within
    the frequent-items error bound (<= n/maxItemsTracked over-/under-
    estimate), and combine() of two half-stream sketches must agree."""
    from pyspark.sql import functions as F

    rows = [(7,)] * 500 + [(1000 + i,) for i in range(200)]
    df = spark.createDataFrame(rows, "k bigint").repartition(8)
    est = (
        df.agg(F.expr("approx_top_k_accumulate(k, 10)").alias("sk"))
        .select(F.explode(F.expr("approx_top_k_estimate(sk, 1)")).alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
        .first()
    )
    n = 700
    assert est.item == 7
    assert abs(est["cnt"] - 500) <= n / 10

    # merge path: two disjoint half-streams, combined sketch sees the union
    halves = df.withColumn("h", F.col("k") % 2)
    combined = (
        halves.groupBy("h")
        .agg(F.expr("approx_top_k_accumulate(k, 10)").alias("sk"))
        .agg(F.expr("approx_top_k_combine(sk, 10)").alias("sk"))
        .select(F.explode(F.expr("approx_top_k_estimate(sk, 1)")).alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
        .first()
    )
    assert combined.item == 7
    assert abs(combined["cnt"] - 500) <= n / 10
