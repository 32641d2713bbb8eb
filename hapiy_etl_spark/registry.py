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
# r14 window (tools/rotate_priority.py over CORRECTNESS_r01..r13, then
# hand-front-loaded): zero failures, zero never-checked; leads with the
# TWELVE r8-stale queries VERDICT r13 item 2 flags (5 rounds old, at
# the rotation gate's edge), then the MATERIALLY CHANGED set — the
# three BPE queries (r14 batch guard ends batches at fresh product
# strings; max-rank topological check), corpus_erasure_retighten (bloom
# resize cap) and both CDC healers (single-pass recovery rebuild) —
# then stalest-green-first backfill. New r14 registrations are
# prepended as never-checked when added.
PRIORITY: tuple[str, ...] = (
    # r14 registrations lead as never-checked
    "dedup_containment_survivorship",
    "ann_opq_exact_regime",
    "corpus_pack_sequences",
    "contrastive_hard_negatives",
    "corpus_pack_greedy",
    "ann_pq_index_probe",
    "bloom_merge_lookup",
    "bloom_batch_fetch",
    "q22_dormant_rich_customers",
    "sales_yoy_growth",
    "supplier_lead_time",
    "customer_order_cadence",
    "timeseries_ewma",
    "ann_lsh_exact_regime",
    "ann_ivf_exact_regime",
    "ann_pq_exact_regime",
    "semdedup_assign",
    "embedding_quantize_int8",
    "vocab_bpe_train",
    "vocab_bpe_encode",
    "vocab_fertility_audit",
    "corpus_erasure_retighten",
    "cdc_index_maintenance",
    "cdc_ivf_index_maintenance",
    "incremental_mv_join_refresh",
    "optimize_zorder_slice",
    "join_semi_anti",
    "join_outer_coalesce",
    "join_full_outer",
    "q2_min_cost_per_group",
    "topk_per_group",
    "set_operations",
    "theta_range_join",
    "cross_join_dims",
    "fn_string",
    "fn_datetime",
    "fn_math",
    "fn_array",
    "fn_explode_wordcount",
    "fn_json",
    "fn_json_schema",
    "fn_datetime_arith",
    "fn_regexp_extract_all",
    "fn_try_safe",
    "fn_struct",
    "fn_conditional",
    "fn_hash",
    "stat_chi2_independence",
    "stat_ab_proportion_ztest",
    "corpus_lang_drift_jsd",
    "sample_stratified_rates",
    "doc_source_entropy",
    "subq_exists_priority",
    "subq_correlated_avg_qty",
    "subq_in_large_orders",
    "dedup_exact",
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
