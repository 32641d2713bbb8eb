"""Every registered query with an oracle must hash-match DuckDB locally.

This replays the driver's correctness gate at sf0.001 (fast) — the
driver runs the same comparison at sf0.01 per round.
"""

from __future__ import annotations

import pytest

from hapiy_etl_spark.registry import all_queries
from tests.oracle import compare

QUERIES = [q for q in all_queries().values() if q.oracle is not None]


@pytest.mark.parametrize("query", QUERIES, ids=[q.name for q in QUERIES])
def test_oracle_parity(spark, sf_dir, query):
    compare(spark, query, sf_dir)


def test_all_queries_runnable(spark, sf_dir):
    """Queries without an oracle still must run and return a DataFrame."""
    for q in all_queries().values():
        if q.oracle is None:
            df = q.fn(spark, sf_dir)
            assert df.count() >= 0, q.name


def test_harness_rejects_decimal_vs_float():
    """The local gate must be as dtype-strict as the driver's hash."""
    from decimal import Decimal

    import pytest as _pytest

    from tests.oracle import compare_frames

    with _pytest.raises(AssertionError, match="value mismatch"):
        compare_frames("planted", ["v"], [(Decimal("3.50"),)], ["v"], [(3.5,)])


def test_harness_rejects_int_vs_float():
    import pytest as _pytest

    from tests.oracle import compare_frames

    with _pytest.raises(AssertionError, match="value mismatch"):
        compare_frames("planted", ["v"], [(1,)], ["v"], [(1.0,)])


def test_harness_rejects_array_cells():
    import pytest as _pytest

    from tests.oracle import UnsafeOutputError, compare_frames

    with _pytest.raises(UnsafeOutputError):
        compare_frames("planted", ["v"], [([1, 2],)], ["v"], [([1, 2],)])
