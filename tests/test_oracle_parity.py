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
