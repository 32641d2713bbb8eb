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
# r11 window (tools/rotate_priority.py over CORRECTNESS_r01..r10, then
# hand-front-loaded): zero failures, zero unchecked — so the front of
# the window is the MATERIALLY CHANGED set: the two online-dedup sinks
# whose index schema + pruned read path were rewritten in r10 but whose
# last driver rows are r9 vintage (VERDICT r10 item 1), plus the three
# queries rebuilt scale-safe THIS round (curriculum stage cut and
# equi-depth bins off the global NTILE onto percentile_disc boundaries;
# vocab token ids off the global row_number onto the range-partitioned
# assign_contiguous_ids kernel). Backfill is stalest-green-first
# (r5/r6-era ann/window/agg rows).
PRIORITY: tuple[str, ...] = (
    "flagship_pipeline_e2e",
    "cdc_ivf_index_maintenance",
    "vocab_coverage_curve",
    "corpus_curation_funnel",
    "class_balanced_subset",
    "context_length_fit",
    "customer_rfm_segmentation",
    "stream_ingest_online_dedup",
    "stream_ingest_online_semdedup",
    "corpus_curriculum_order",
    "events_equidepth_histogram",
    "vocab_encode_documents",
    "sample_deterministic",
    "udtf_polymorphic_split",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_neardup",
    "embedding_stats",
    "ann_pq_topk",
    "window_ranking",
    "window_analytic",
    "window_frames_running",
    "window_sessionize",
    "agg_bitmap_distinct",
    "agg_listagg_disc",
    "agg_winsorized_stats",
    "incremental_agg_merge",
    "window_tumbling",
    "window_sliding",
    "window_session",
    "asof_join_events",
    "watermark_read",
    "incremental_since",
    "resample_ffill",
    "sort_null_ordering",
    "upsert_merge",
    "events_funnel_multistep",
    "events_frequent_users",
    "events_redact_props",
    "incremental_mv_multi",
    "incremental_mv_quantiles",
    "merge_pruned_upsert",
    "stats_pruned_time_slice",
    "graph_pagerank_trade",
    "join_skew_salted",
    "maintenance_zorder_key",
    "subq_lateral_topn",
    "text_fingerprint",
    "text_sequence_pack",
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
