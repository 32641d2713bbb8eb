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
# r13 window (tools/rotate_priority.py over CORRECTNESS_r01..r12, then
# hand-front-loaded): zero failures; the EIGHT queries registered this
# round lead as never-checked (IVF-PQ exact-regime twin + lossy top-k,
# the erase->retighten->erase maintenance cycle, the embedding outlier
# screen, Zipf fit, inter-arrival stats, directed shingle containment,
# the bot cadence screen), then the MATERIALLY CHANGED
# set — the three BPE queries (Arrow word-type segmenter + batched
# trainer replaced the nested-replace/1-job-per-merge forms),
# ann_pq_topk + ann_recall_audit (PQ geometry moved to the 16x256
# sweep knee; audit gained the ivfpq row), both perceptual multimodal
# queries (key_cap default + localCheckpoint), and both simhash
# queries (signature_band_pairs gained the key_cap parameter), and
# corpus_vocab_growth (its 4-row global window moved to the bounded
# collect, emptying the global-window lint allowlist). The
# remaining 32 slots backfill stalest-green-first (the r8-era tail
# VERDICT r12 item 4 flags); the ~13 displaced stale queries roll to
# the r14 window.
PRIORITY: tuple[str, ...] = (
    "ann_ivfpq_exact_regime",
    "ann_ivfpq_topk",
    "corpus_erasure_retighten",
    "embedding_vector_outliers",
    "text_zipf_slope",
    "events_interarrival_stats",
    "dedup_containment",
    "events_bot_cadence_screen",
    "vocab_bpe_train",
    "vocab_bpe_encode",
    "vocab_fertility_audit",
    "ann_pq_topk",
    "ann_recall_audit",
    "multimodal_phash_neardup",
    "multimodal_video_phash",
    "dedup_simhash",
    "dedup_simhash_portable",
    "corpus_vocab_growth",
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
    "multimodal_frame_sample",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "filter_predicate_algebra",
    "join_null_safe",
    "scd2_point_in_time",
    "subq_scalar_above_avg",
    "subq_not_in_anti",
    "dedup_minhash_portable",
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
