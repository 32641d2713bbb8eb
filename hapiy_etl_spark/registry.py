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


# The driver's correctness pass covers only the FIRST 50 registered
# queries per round (CORRECTNESS_r01 == list(query_fns())[:50]), so
# ordering is evidence budget. Regenerate this list each round with
# `python tools/rotate_priority.py` (failures first, then never-checked,
# then stalest greens). Round 2 front-loads the 42 queries that
# got no r1 row (registered after the cap) plus the 5 r1 failures now
# fixed (array-output serialization + decimal/sign dtype casts); the 42
# r1-green queries keep their r1 evidence and sort after the window.
PRIORITY: tuple[str, ...] = (
    # r1 hash/canonicalizer failures, fixed this round
    "agg_collect",
    "filter_predicate_algebra",
    "fn_math",
    "fn_array",
    "fn_regexp_extract_all",
    # never-checked in r1 (driver cap): subqueries / tpch_more / text /
    # udf / vectors / windows families, in module order
    "subq_exists_priority",
    "subq_scalar_above_avg",
    "subq_correlated_avg_qty",
    "subq_in_large_orders",
    "subq_not_in_anti",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_native",
    "dedup_simhash",
    "dedup_pipeline_end_to_end",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "vocab_encode_documents",
    "data_quality_report",
    "text_pii_redaction",
    "text_fingerprint",
    "q6_forecast_revenue",
    "q12_priority_by_linestatus",
    "q14_promo_revenue_ratio",
    "q7_nation_pair_volume",
    "q9_profit_by_nation_year",
    "q19_disjunctive_predicates",
    "udf_pandas_vectorized",
    "udf_grouped_map_zscore",
    "udf_map_in_pandas",
    "udtf_explode_ranges",
    "fn_map",
    "fn_map_explode",
    "unpivot_stack",
    "sample_deterministic",
    "ann_cosine_topk",
    "ann_cosine_topk_numpy",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_neardup",
    "embedding_stats",
    "window_ranking",
    "window_analytic",
    "window_frames_running",
    "window_sessionize",
    # new in r2 — need their first driver row
    "text_sequence_pack",
    "corpus_split_sample",
    "events_funnel_conversion",
)


def all_queries() -> dict[str, Query]:
    """Import all query modules (triggering registration) and return them.

    Ordered by PRIORITY first (driver correctness window), then
    registration order.
    """
    import hapiy_etl_spark.queries  # noqa: F401  (side-effect: registers)

    rank = {n: i for i, n in enumerate(PRIORITY)}
    ordered = sorted(
        _REGISTRY, key=lambda n: (rank.get(n, len(PRIORITY)), 0)
    )
    # stable sort keeps registration order within the non-priority tail
    return {n: _REGISTRY[n] for n in ordered}


def query_fns() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
