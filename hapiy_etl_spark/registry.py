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
# r15 window (tools/rotate_priority.py over CORRECTNESS_r01..r14):
# the TEN never-checked r15 registrations lead (persisted IVF-PQ
# probe, the audio pair, BPE-grain packing, the unigram tokenizer
# pair + bake-off + unigram-grain packing, the bucketed-join pair —
# every new registration must present in its own round to keep the
# 0-never-checked record),
# then the TWENTY-ONE r9-stale queries VERDICT r14 item 1 flags
# (5 rounds old, at the rotation gate's edge), then the two queries
# materially changed by the r15 group-commit work, then
# stalest-green-first backfill (the r10 agg_* cohort; its tail
# rotated out to fund the new-query presentations — the r10 cohort
# leads the r16 window).
PRIORITY: tuple[str, ...] = (
    "ann_ivfpq_index_probe",
    "multimodal_audio_dedup",
    "multimodal_audio_fingerprint",
    "corpus_pack_bpe",
    "vocab_unigram_train",
    "vocab_unigram_encode",
    "vocab_tokenizer_bakeoff",
    "corpus_pack_unigram",
    "join_bucketed_colocated",
    "join_bucket_pruned_lookup",
    "sample_stratified_rates",
    "doc_source_entropy",
    "subq_exists_priority",
    "subq_correlated_avg_qty",
    "subq_in_large_orders",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_native",
    "dedup_incremental_index",
    "dedup_pipeline_end_to_end",
    "text_token_stats",
    "text_quality",
    "text_lang_id",
    "text_bm25_index_probe",
    "text_decontam_index_probe",
    "corpus_shard_assignment",
    "corpus_shard_epoch_reshuffle",
    "changestream_optimize_exactly_once",
    "ann_ivf_index_probe",
    "semdedup_incremental",
    # hand-front-loaded (materially changed r15): the flagship MV
    # partial now rides the epoch group record; the online-dedup
    # sink gained the extra_appends path
    "flagship_pipeline_e2e",
    "stream_ingest_online_dedup",
    "agg_basic_stats",
    "agg_corr_covar",
    "agg_distinct",
    "agg_percentiles",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_first_last_ordered",
    "agg_bitwise_boolean",
    "agg_approx_count_distinct",
    "agg_percentile_approx",
    "agg_regression",
    "agg_filter_clause",
    "agg_kmv_distinct_sketch",
    "agg_approx_top_k_freq",
    "interval_overlap_sessions",
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
