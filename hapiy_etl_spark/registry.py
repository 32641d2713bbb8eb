"""Query registry: the bridge between the engine and the driver contract.

Every implemented operator from SURVEY.md §2 registers a named query
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, a
DuckDB oracle SQL twin. ``__spark_entry__.py`` exposes the registry to
the driver; ``tests/test_oracle_parity.py`` replays the same comparison
locally so mismatches are caught before the driver round.

Conventions for hash-stable oracle parity (FIXTURES.md):
- alias every computed column identically in Spark and SQL;
- monetary/double aggregates: cast to DECIMAL(18,2) before SUM (exact,
  order-independent), cast result to DOUBLE;
- averages: double(sum_decimal)/count, then round(…, 4);
- timestamps: session fixed to UTC;
- arrays kept deterministic (sort_array / list_sort).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL twin; None → driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all query modules (triggering registration) and return them."""
    import hapiy_etl_spark.queries  # noqa: F401  (side-effect: registers)

    return dict(_REGISTRY)


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
