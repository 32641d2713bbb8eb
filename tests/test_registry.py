"""Registry integrity: every module imports, every query has unique
name, oracles reference only pre-registered tables."""

from __future__ import annotations

import re

from hapiy_etl_spark.io import TABLES
from hapiy_etl_spark.queries import IMPORT_ERRORS
from hapiy_etl_spark.registry import all_queries


def test_no_module_import_errors():
    assert IMPORT_ERRORS == {}, f"query modules failed to import: {IMPORT_ERRORS}"


def test_oracles_reference_known_tables_only():
    known = set(TABLES)
    for q in all_queries().values():
        if not q.oracle:
            continue
        # strip `--` line comments first: prose like "driven FROM totals"
        # inside a comment is not a scan (DuckDB strips them the same way)
        sql = re.sub(r"--[^\n]*", "", q.oracle)
        # crude FROM/JOIN table extraction; CTE names get defined inline
        # CTE names, incl. recursive form with a column list: name(a, b) AS (
        ctes = set(re.findall(r"(\w+)\s*(?:\([^)]*\))?\s+AS\s*\(", sql, re.IGNORECASE))
        # lookbehind: `x IS [NOT] DISTINCT FROM y` is a comparison, not a scan
        refs = re.findall(
            r"(?:(?<!DISTINCT )FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql, re.IGNORECASE
        )
        for r in refs:
            if r.lower() in {"lateral", "unnest", "range", "generate_series"}:
                continue
            assert r in known or r in ctes, f"{q.name}: oracle references unknown table {r!r}"


def test_query_count_floor():
    qs = all_queries()
    assert len(qs) >= 80, f"registry shrank: {len(qs)}"
    with_oracle = sum(1 for q in qs.values() if q.oracle)
    assert with_oracle >= 69, f"oracle coverage shrank: {with_oracle}"


def test_no_registered_query_plans_all_pairs(spark, sf_dir):
    """Scale invariant: no registered query may ship a cartesian or
    nested-loop join over data-sized inputs. 1-row aggregate cross
    joins (two single-row summary sides combined into one output row)
    are the only sanctioned nested-loop shape."""
    # queries whose nested-loop shape is sanctioned because one side is
    # bounded (1-row aggregates, a fixed query set, or fixed-size dims)
    ONE_ROW_CROSS_OK = {
        "join_semi_anti",  # 1-row x 1-row summary cross
        "q14_promo_revenue_ratio",  # same
        "events_funnel_conversion",  # same
        "events_funnel_multistep",  # three 1-row step counts crossed
        "data_quality_report",  # unioned 1-row checks
        "cross_join_dims",  # 5x25 fixed-size dims, intentional demo
        "incremental_since",  # 1-row watermark aggregate joined to facts
        "ann_cosine_topk",  # documented exact baseline: bounded broadcast
        #   query set x corpus (the scale paths are ann_lsh/ann_ivf)
        "ann_ivf_topk",  # bounded cross: |queries| x |centroids|, both
        #   broadcast, to rank probe cells
        "ann_ivf_exact_regime",  # same bounded probe-cell cross (10 x 4)
        "ann_ivf_index_probe",  # same bounded probe-cell cross against
        #   the persisted index (10 queries x 4 broadcast centroids)
        "cdc_ivf_index_maintenance",  # same bounded probe-cell cross
        #   against the HEALER-built inverted file (r11)
        "text_bm25_search",  # 1-row corpus-stats aggregate crossed in
        "text_bm25_query_table",  # same 1-row corpus-stats cross
        "text_bm25_index_probe",  # same 1-row corpus-stats cross, fed
        #   from the (tiny) meta table's sum instead of a corpus agg
        "agg_kmv_distinct_sketch",  # two 1-row sketch sides crossed
        "maintenance_zorder_key",  # 1-row min/max bounds aggregate crossed
        "q11_important_stock",  # 1-row total-value aggregate crossed
        "events_frequent_users",  # 1-row stream-total aggregate crossed
        "doc_tfidf_topterms",  # 1-row corpus-N aggregate crossed
        "graph_triangle_count",  # four 1-row graph summaries crossed
        #   into the single output row (nodes/edges/wedges/triangles)
        "corpus_mix_temperature",  # 1-row max-share aggregate crossed
        #   into the per-language rate table
        "basket_pair_lift",  # 1-row distinct-order-count aggregate
        #   crossed into the lift denominator
        "semdedup_assign",  # bounded cross: corpus x 8 broadcast centroids
        "stat_chi2_independence",  # margin grid cross: |event_types| x
        #   |day buckets| (5x7 category table), plus the 1-row total
        "corpus_lang_drift_jsd",  # 1-row totals aggregate crossed into
        #   the per-language probability table
        "corpus_curriculum_order",  # 1-row percentile_disc stage-cut
        #   aggregate broadcast back onto the scan (r11 scale-safe form)
        "events_equidepth_histogram",  # 1-row percentile_disc bin-edge
        #   aggregate broadcast back onto the scan (r11 scale-safe form)
        "customer_rfm_segmentation",  # 1-row percentile_disc quartile
        #   cuts crossed onto the customer-grain aggregate (r11 form)
        "class_balanced_subset",  # 1-row min-class-count aggregate
        #   crossed onto the per-label ranked rows (r11)
        "context_length_fit",  # 3-row length grid crossed onto the
        #   token-count scan (the cross_join_dims sanctioned shape, r11)
        "revenue_pareto_curve",  # 1-row customer-count broadcast for
        #   the NTILE size rule + bounded 10x10 decile prefix cross
        #   (r12 rebuild off the last data-grain global window)
        # vocab_bpe_train left this list in r13: the batched trainer
        #   applies driver-collected merges as literal replaces, so
        #   the per-round 1-row broadcast cross no longer exists
        "embedding_vector_outliers",  # 1-row global-moments row
        #   broadcast back onto the per-vector scan (the sanctioned
        #   scalar-cross shape, r13)
        "flagship_semantic_e2e",  # bounded probe-cell cross: 10
        #   queries x 4 broadcast centroids against the healed IVF
        #   (same shape as cdc_ivf_index_maintenance, r12)
        "quality_linear_probe",  # two 1-row crosses: the fitted-model
        #   row broadcast onto the residual scan, then model x SSE row
        #   into the single output row (r12)
        "corpus_token_budget_plan",  # two 1-row crosses: corpus total,
        #   then the quantized weight denominator (r12)
        "quality_probe_calibration",  # 1-row model + 1-row quintile
        #   cuts broadcast back onto the prediction scan (r12)
        "ann_recall_audit",  # composes the sanctioned ANN probe-cell
        #   crosses (queries x broadcast centroids/codebooks) plus the
        #   exact baseline's bounded query-set cross (r12)
        "contrastive_hard_negatives",  # bounded broadcast: 10 query
        #   vectors x corpus with a non-equi (source-differs) predicate
        #   — the ann_cosine_topk sanctioned shape plus an anti-join
        #   (r14); the corpus side is never self-joined
    }
    offenders = []
    for q in all_queries().values():
        plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        if ("CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan) and (
            q.name not in ONE_ROW_CROSS_OK
        ):
            offenders.append(q.name)
    assert not offenders, f"all-pairs join plans in: {offenders}"


def test_no_registered_query_plans_global_window(spark, sf_dir):
    """Scale invariant (r11, after the curriculum miss): no registered
    query may ship a Window with an EMPTY partition spec over
    non-aggregated data — Spark plans that as ONE window partition,
    i.e. the whole input through a single reducer. Post-aggregate
    global windows over provably tiny frames are allowlisted
    explicitly; the list should only shrink."""
    # EMPTY since r13: corpus_vocab_growth (the last entry — a running
    # sum over its 4-row slice aggregate) moved to the bounded-collect
    # posture, so no registered query plans a global window at all
    POST_AGGREGATE_OK: set[str] = set()

    def walk(node):
        yield node
        for i in range(node.children().size()):
            yield from walk(node.children().apply(i))

    offenders = []
    for q in all_queries().values():
        if q.name in POST_AGGREGATE_OK:
            continue
        opt = q.fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan()
        for node in walk(opt):
            if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
                offenders.append(q.name)
                break
    assert not offenders, f"single-partition (global) Window plans in: {offenders}"


def test_priority_window_is_well_formed():
    """The driver's correctness pass covers only the FIRST 50
    registered queries, and PRIORITY is what orders them — a typo'd
    or stale name there silently shrinks the evidence window (the
    sort treats unknown names as absent and backfills from
    registration order), so the window must be exactly 50 real,
    distinct query names."""
    from hapiy_etl_spark.registry import PRIORITY

    names = set(all_queries())
    unknown = [n for n in PRIORITY if n not in names]
    assert unknown == [], f"PRIORITY names not in registry: {unknown}"
    assert len(PRIORITY) == len(set(PRIORITY)), "duplicate PRIORITY entries"
    assert len(PRIORITY) == 50, (
        f"PRIORITY must fill the driver's 50-query window, got {len(PRIORITY)}"
    )
