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
# then stalest greens).
# r8 window (tools/rotate_priority.py over CORRECTNESS_r01..r07, rerun
# after EACH new registration): zero failures; the 9 never-checked r8
# queries front-load (bloom_merge_lookup, incremental_mv_kll_quantiles,
# bloom_batch_fetch, optimize_clustered_slice, the three ANN
# exact-regimes, the two portable-kernel dedups), then freshest-last
# backfill of the stalest greens (r4-era rows first).
PRIORITY: tuple[str, ...] = (
    "bloom_merge_lookup",
    "incremental_mv_kll_quantiles",
    "bloom_batch_fetch",
    "optimize_clustered_slice",
    "ann_ivf_exact_regime",
    "ann_lsh_exact_regime",
    "ann_pq_exact_regime",
    "dedup_minhash_portable",
    "dedup_simhash_portable",
    "events_rolling_distinct_users",
    "asof_forward_tolerance",
    "interval_union_coverage",
    "events_daily_anomaly",
    "events_dau_mau_stickiness",
    "graph_triangle_count",
    "graph_reachability_bfs",
    "basket_pair_lift",
    "multimodal_metadata",
    "multimodal_decode_features",
    "multimodal_frame_sample",
    "join_null_safe",
    "scd2_point_in_time",
    "subq_scalar_above_avg",
    "subq_not_in_anti",
    "text_repetition_filter",
    "corpus_mix_sample",
    "text_chunk_overlap",
    "corpus_lang_quota",
    "doc_tfidf_topterms",
    "corpus_weighted_sample",
    "text_cdc_chunking",
    "corpus_split_leakfree",
    "text_segment_dedup",
    "corpus_mix_temperature",
    "doc_novelty_score",
    "q22_dormant_rich_customers",
    "sales_yoy_growth",
    "customer_rfm_segmentation",
    "revenue_pareto_curve",
    "supplier_lead_time",
    "customer_order_cadence",
    "timeseries_ewma",
    "semdedup_assign",
    "embedding_quantize_int8",
    "agg_collect",
    "events_funnel_conversion",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "filter_predicate_algebra",
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
