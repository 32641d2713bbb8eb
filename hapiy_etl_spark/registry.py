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
# r12 window (tools/rotate_priority.py over CORRECTNESS_r01..r11, then
# hand-front-loaded): zero failures; the TEN queries registered this
# round lead as never-checked (multimodal payload/phash/frame/video
# dedup, BPE train/encode/fertility, repetition stats, the semantic
# flagship), then the MATERIALLY CHANGED set — revenue_pareto_curve
# (rebuilt off the global NTILE onto the exact range-partitioned
# rank), corpus_curriculum_order (null-safe offset joins in its
# kernel), both simhash queries (banding factored into
# signature_band_pairs). Backfill is stalest-green-first (the r7-era
# tail VERDICT r11 item 2 flags) — 10 of those 23 displaced by the
# new registrations roll to the r13 window.
PRIORITY: tuple[str, ...] = (
    "dedup_survivorship",
    "embedding_random_projection",
    "quality_linear_probe",
    "resample_interpolate",
    "events_trending_topk",
    "corpus_token_budget_plan",
    "corpus_erasure_audit",
    "events_attribution_last_touch",
    "embedding_dimension_stats",
    "quality_probe_calibration",
    "ann_recall_audit",
    "multimodal_payload_dedup",
    "multimodal_phash_neardup",
    "multimodal_frame_dedup",
    "multimodal_video_phash",
    "vocab_bpe_train",
    "vocab_bpe_encode",
    "vocab_fertility_audit",
    "text_repetition_stats",
    "flagship_semantic_e2e",
    "revenue_pareto_curve",
    "corpus_curriculum_order",
    "dedup_simhash_portable",
    "dedup_simhash",
    "dedup_cluster_assign",
    "text_bigram_logprob",
    "text_bm25_search",
    "text_bm25_query_table",
    "dedup_incremental_batch",
    "text_decontamination",
    "dedup_exact_substring",
    "bloom_point_lookup",
    "q12_priority_by_linestatus",
    "q13_order_count_distribution",
    "q18_large_volume_customers",
    "q21_sole_returning_supplier",
    "q4_order_priority_checking",
    "q10_returned_item_reporting",
    "q2_min_cost_supplier",
    "q8_national_market_share",
    "q11_important_stock",
    "q15_top_supplier",
    "q16_parts_supplier_counts",
    "q17_small_quantity_revenue",
    "q20_part_promotion_suppliers",
    "fn_variant",
    "window_time_range_frame",
    "agg_collect",
    "events_funnel_conversion",
    "events_rolling_distinct_users",
    "asof_forward_tolerance",
    "interval_union_coverage",
    "events_daily_anomaly",
    "events_dau_mau_stickiness",
    "incremental_mv_kll_quantiles",
    "optimize_clustered_slice",
    "graph_triangle_count",
    "graph_reachability_bfs",
    "basket_pair_lift",
    "multimodal_metadata",
    "multimodal_decode_features",
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
