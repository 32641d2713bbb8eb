"""Invariant tests for approximate aggregates (no DuckDB oracle —
sketches are engine-specific, so bounds are asserted instead)."""

from __future__ import annotations

from hapiy_etl_spark.queries.aggregates import agg_approx_count_distinct, agg_percentile_approx


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    row = agg_approx_count_distinct(spark, sf_dir).first()
    # rsd=0.01 → generous 5% band
    assert abs(row.approx_orders - row.exact_orders) <= max(1, 0.05 * row.exact_orders)


def test_percentile_approx_near_exact(spark, sf_dir):
    row = agg_percentile_approx(spark, sf_dir).first()
    # accuracy=10000 on ~1.5k rows → GK returns an actual element near the median
    assert abs(row.approx_median - row.exact_median) / row.exact_median < 0.05
