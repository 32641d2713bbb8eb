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
