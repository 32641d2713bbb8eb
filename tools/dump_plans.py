"""Generate PLANS.md: physical-plan evidence for the scale posture.

Extracts the load-bearing plan fragments (PushedFilters, ReadSchema,
join strategies, AQE markers) for representative queries so a reviewer
can see — not trust — that filters reach scans, dims broadcast, and
projections prune.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SHOWCASE = [
    ("q1_pricing_summary", ["PushedFilters", "ReadSchema"]),
    ("q3_shipping_priority", ["BroadcastHashJoin", "PushedFilters"]),
    ("q5_local_supplier_volume", ["BroadcastHashJoin"]),
    ("q6_forecast_revenue", ["PushedFilters", "ReadSchema"]),
    ("theta_range_join", ["BroadcastHashJoin"]),
    ("topk_per_group", ["Window", "Exchange"]),
    ("dedup_exact", ["HashAggregate", "Exchange"]),
    ("asof_join_events", ["Window", "Exchange"]),
    # r2: joins AQE-sized (no forced broadcast on customer/supplier/part)
    ("q7_nation_pair_volume", ["AdaptiveSparkPlan", "Join"]),
    ("q9_profit_by_nation_year", ["AdaptiveSparkPlan", "Join"]),
    # r2: sign-bucket LSH — candidate generation is an equi-join, and no
    # BroadcastNestedLoopJoin may appear anywhere in the plan
    ("embedding_cosine_neardup", ["Join", "NestedLoop"]),
    # r2: posting-cap window filter rides the shingle-join shuffle
    ("dedup_ngram_jaccard", ["BroadcastHashJoin", "HashAggregate"]),
    # LLM-family shapes: one-pass signature aggregate + band equi-join;
    # per-shard running-sum window (no global sort); salted shuffle key
    ("dedup_minhash_native", ["HashAggregate", "Exchange"]),
    ("text_sequence_pack", ["Window", "Exchange"]),
    ("join_skew_salted", ["Join", "Exchange"]),
    # r4: degree-ordered triangle closure must stay hash-join — the
    # wedge self-join and closing semi-join are equi-joins; the ONLY
    # nested-loop shapes are the four sanctioned 1-row summary crosses
    # at the root, and the cached edge artifact is reused in-memory
    ("graph_triangle_count", ["HashJoin", "LeftSemi", "InMemoryTableScan"]),
    # r4: rolling distinct = explode + single hash-agg shuffle, and the
    # bitmap rollup keeps partial aggregation map-side
    ("events_rolling_distinct_users", ["Generate", "HashAggregate", "Exchange"]),
    ("agg_bitmap_distinct", ["HashAggregate", "Exchange"]),
    # r4: forward as-of rides one window shuffle like the backward form
    ("asof_forward_tolerance", ["Window", "Exchange"]),
    ("interval_union_coverage", ["Window", "Exchange"]),
    # r5: chi-square margins are tiny broadcast crosses over ONE grouped
    # count of the fact table — the only scan is the events aggregate
    ("stat_chi2_independence", ["HashAggregate", "BroadcastNestedLoopJoin", "FileScan"]),
    # r5: deletion-variant blocking must plan as a hash equi-join on the
    # variant key — never a cartesian pair enumeration
    ("editsim_source_labels", ["Join", "NestedLoop", "Generate"]),
    # r5: GROUPED_AGG pandas UDAF runs as a real two-phase aggregate
    ("udf_grouped_agg_mad", ["ArrowAggregatePython", "Exchange"]),
    # r6: frequent-items sketches partial-aggregate map-side (the
    # shuffle carries sketch states, not user_id rows)
    ("agg_approx_top_k_freq", ["ObjectHashAggregate", "Exchange"]),
    # r6: two-level salted bottom-k — both windows partitioned, the
    # second over candidates only
    ("sample_reservoir_per_group", ["Window", "Exchange"]),
    # r6: single-pass exact-substring — ONE FileScan (the r5 self-join
    # form re-derived the scan→tokenize→window pipeline per side)
    ("dedup_exact_substring", ["FileScan", "Generate", "HashAggregate"]),
    # r6: polymorphic UDTF streams map-side (analyze()-time schema)
    ("udtf_polymorphic_split", ["UDTF"]),
    # r6: constraint flagging is pure column algebra over one scan
    ("constraints_quarantine", ["Filter", "FileScan"]),
    # r7: multi-aggregate MV result is a single scan of the stored
    # partials (refresh cost lives at refresh time, reads are cheap)
    ("incremental_mv_multi", ["FileScan", "Project"]),
    # r7: manifest-stats time slice — the FileScan lists ONLY the dirs
    # overlapping the window (pruning happened before the planner), and
    # the residual range filter still pushes into the scan
    ("stats_pruned_time_slice", ["FileScan", "PushedFilters", "HashAggregate"]),
    # r7: quantile panel finalizer is ONE Arrow-batched eval over the
    # per-group partial rows; the heavy work happened at refresh time
    ("incremental_mv_quantiles", ["ArrowEvalPython", "FileScan"]),
    # r7: pruned upsert — the final state scan reads the carried dirs
    # plus one rewritten dir; the aggregate is an ordinary two-phase
    ("merge_pruned_upsert", ["FileScan", "HashAggregate"]),
    # r7: bloom point lookup — the scan lists only bloom-positive dirs
    # and the key equality pushes into it
    ("bloom_point_lookup", ["FileScan", "PushedFilters"]),
    # r8: bloom pruning survives MERGE — post-upsert lookups still scan
    # only bloom-positive dirs, the key equality pushed down
    ("bloom_merge_lookup", ["FileScan", "PushedFilters"]),
    # r8: KLL rank panel — partials/merges are grouped-agg Arrow
    # batches; the finalizer is one Arrow eval over per-group rows
    ("incremental_mv_kll_quantiles", ["ArrowEvalPython", "FileScan"]),
    # r8: batch point lookup — one read, the IN filter pushed into a
    # scan of only the dirs that might hold a listed key
    ("bloom_batch_fetch", ["FileScan", "PushedFilters"]),
    # r8: clustered compaction — the post-optimize slice scans ONE
    # range-clustered dir with the residual range pushed down
    ("optimize_clustered_slice", ["FileScan", "PushedFilters", "HashAggregate"]),
    # r8: portable minhash — same partial/final signature agg and band
    # equi-join shape as native, with the md5 kernel fully codegen'd
    ("dedup_minhash_portable", ["HashAggregate", "Exchange"]),
    # r9: z-ordered compaction — the two-predicate box slice scans only
    # the Morton-bucketed dirs intersecting BOTH ranges, residual
    # predicates pushed into the scan
    ("optimize_zorder_slice", ["FileScan", "PushedFilters", "HashAggregate"]),
    # r9: incremental dedup — band keys derived from stored sig arrays
    # (no text scan on the index side), new-vs-history as hash
    # equi-joins end-to-end
    ("dedup_incremental_index", ["Join", "HashAggregate", "Exchange"]),
    # r9: persisted-IVF probe-all — the inverted-file read is a
    # FileScan of the index table's dirs; scoring joins stay hash/
    # broadcast (the only nested-loop is the sanctioned bounded
    # query x centroid cross)
    ("ann_ivf_index_probe", ["FileScan", "Window"]),
    # r9: CDC across compaction — the returned frame is one parquet
    # scan of the exactly-once sink the stream wrote
    ("changestream_optimize_exactly_once", ["FileScan"]),
    # r9: incremental semantic dedup — new batch vs stored embedding
    # index is a bucket equi-join (cosine refine after), never a
    # nested-loop pair enumeration
    ("semdedup_incremental", ["Join", "NestedLoop"]),
    # r9: index-served BM25 — scoring is the probed postings FileScan
    # joined to broadcast-tiny df/stats sides, one final aggregate
    ("text_bm25_index_probe", ["FileScan", "BroadcastHashJoin", "HashAggregate"]),
    # r9: join-MV result read — one scan of the stored partials; the
    # delta-join cost lives at refresh time
    ("incremental_mv_join_refresh", ["FileScan", "Project"]),
    # r9: index-served decontamination — the probed shingle postings
    # FileScan broadcast-joined to the bench shingle set, one grouped
    # count; no corpus re-tokenize on the train side
    ("text_decontam_index_probe", ["FileScan", "BroadcastHashJoin", "HashAggregate"]),
    # r9: streaming online-dedup — the returned frame is one scan of
    # the corpus TxTable the stream committed exactly-once
    ("stream_ingest_online_dedup", ["FileScan"]),
    # r9: shard assignment — one hash exchange on the shard key + a
    # per-shard window; no global sort anywhere in the plan
    ("corpus_shard_assignment", ["Window", "Exchange"]),
    # r9: streaming semantic dedup — the returned frame is one scan of
    # the single index TxTable the stream committed exactly-once
    ("stream_ingest_online_semdedup", ["FileScan"]),
    # r10: healed-index decontamination — the probe reads the index the
    # CDC healer job wrote; same FileScan + broadcast-join + grouped
    # count shape as the coupled decontam probe
    ("cdc_index_maintenance", ["FileScan", "BroadcastHashJoin", "HashAggregate"]),
    # r10: heavy-hitter MV panel read — one scan of the stored partials
    # with the sketch finalizer as pure column algebra (no Python eval)
    ("incremental_mv_topk", ["FileScan", "Project"]),
    # r10: cross-shard contamination — distinct (shard, shingle)
    # projection self-joined on shingle as a hash equi-join (bounded by
    # shards^2 per shingle), Jaccard from broadcast size sides
    ("corpus_cross_contamination", ["HashAggregate", "BroadcastHashJoin"]),
    # r11 rebuild (VERDICT r10's weak): curriculum order — the stage
    # cut is a 1-row percentile_disc aggregate broadcast back onto the
    # scan (BroadcastNestedLoopJoin of one row), within-stage positions
    # from (stage, md5-prefix bucket) windows — every Window node
    # carries a non-empty partition spec (lint-enforced)
    ("corpus_curriculum_order", ["Window", "BroadcastNestedLoopJoin"]),
    # r10: Heaps-law curve — cumulative distinct via ONE first-
    # occurrence aggregate + running-sum window, never k rescans
    ("corpus_vocab_growth", ["HashAggregate", "Window"]),
    # r10: per-source dup rate — a two-phase distinct aggregate over
    # 16-byte digests, no text on the shuffle
    ("dedup_rate_by_source", ["HashAggregate", "Exchange"]),
    # r11 rebuild: equi-depth histogram — percentile_disc bin edges
    # broadcast onto the scan + range-comparison bins; ZERO Window
    # nodes where the r10 form funneled the table through one reducer
    ("events_equidepth_histogram", ["HashAggregate", "BroadcastNestedLoopJoin"]),
    # r11: healed-IVF probe — broadcast centroids/queries against the
    # healer-written inverted file, per-query top-k window
    ("cdc_ivf_index_maintenance", ["BroadcastHashJoin", "Window"]),
    # r11: the flagship audit frame — MV-partial merge + decontam-probe
    # joins off the session-fixture topology tables
    ("flagship_pipeline_e2e", ["FileScan", "HashAggregate", "BroadcastHashJoin"]),
    # r11: vocab coverage — freq aggregate + TakeOrdered top-K (no
    # global sort shuffle), curve assembled from the bounded slice
    ("vocab_coverage_curve", ["Scan ExistingRDD"]),
    # r11: the batch curation funnel — every stage a hash join or
    # aggregate (digest dedup join, broadcast bench shingles), unioned
    # 1-row stage counts; no window, no nested loop anywhere
    ("corpus_curation_funnel", ["HashAggregate", "BroadcastHashJoin", "Union"]),
    # r12 rebuild (VERDICT r11's last weak): Pareto deciles — exact
    # global rank from a RANGE exchange + per-pid window (non-empty
    # partition spec), NTILE size rule against a 1-row count broadcast,
    # cumulative share as a bounded 10x10 decile cross; no Window with
    # an empty partition spec anywhere (lint-enforced)
    ("revenue_pareto_curve", ["Window", "BroadcastNestedLoopJoin", "HashAggregate"]),
    # r12: exact multimodal dedup — a two-phase aggregate over 32-byte
    # payload digests; payload bytes never ride the shuffle
    ("multimodal_payload_dedup", ["HashAggregate", "Exchange"]),
    # r12/r13: perceptual near-dedup — the Arrow dHash pass runs once
    # at build (eager localCheckpoint; the plan reads its blocks as
    # Scan ExistingRDD), the r13 key_cap rides a (band, key) window,
    # then the shared Manku banding as a hash equi-join; never a
    # nested-loop pair enumeration
    ("multimodal_phash_neardup", ["Window", "Join", "Scan ExistingRDD", "NestedLoop"]),
    # r12/r13: BPE trainer — each batched round's pair-count aggregate
    # + TakeOrdered ran at build time; the returned merges table is
    # the driver-built local frame
    ("vocab_bpe_train", ["Scan ExistingRDD", "LocalTableScan"]),
    # r12/r13: BPE encode — posexplode, the Arrow word-type segmenter
    # (MapInPandas over distinct words) hash-joined back, one grouped
    # collect per doc
    ("vocab_bpe_encode", ["MapInPandas", "Join", "Generate", "ObjectHashAggregate"]),
    # r12: the embedding-side flagship — probe-all read off the
    # healer-written inverted file (FileScan of the session-fixture
    # table), broadcast centroid/query sides, per-query top-k window
    ("flagship_semantic_e2e", ["FileScan", "BroadcastHashJoin", "Window"]),
    # r12: video exact-frame dedup — frames digest and self-join as a
    # hash equi-join on (frame_idx, digest); payload bytes stay out of
    # the shuffle, the vote is one grouped count
    ("multimodal_frame_dedup", ["HashAggregate", "Join", "NestedLoop"]),
    # r12/r13: video perceptual near-dup — per-frame Arrow dHash
    # materialized once (eager localCheckpoint -> Scan ExistingRDD),
    # key_cap window, shared banding equi-join + one grouped vote
    ("multimodal_video_phash", ["Window", "Join", "Scan ExistingRDD", "NestedLoop"]),
    # r12: survivorship election rides the cluster-grain window (never
    # an empty partition spec) + one metadata-merge aggregate
    ("dedup_survivorship", ["Window", "HashAggregate"]),
    # r12: JL projection is scan-local column algebra — the only
    # exchange in the plan is the output sort's range partitioning
    ("embedding_random_projection", ["Exchange", "Project"]),
    # r12: closed-form ridge — ONE full aggregate for the 9 Gram sums,
    # 1-row model broadcast back onto the residual scan (sanctioned
    # nested-loop shape), second aggregate for SSE
    ("quality_linear_probe", ["HashAggregate", "BroadcastNestedLoopJoin"]),
    # r12: linear gap-fill — two symmetric window passes on ONE key
    # partitioning; the spine join is a hash join, never nested-loop
    ("resample_interpolate", ["Window", "Join", "NestedLoop"]),
    # r12: erasure audit reads the co-erased TxTables (FileScan) and
    # joins postings->corpus as a hash join at id grain
    ("corpus_erasure_audit", ["FileScan", "Join", "NestedLoop"]),
    # r12: attribution is ONE ignore-nulls window pass per user stream
    # — no as-of self-join anywhere in the plan
    ("events_attribution_last_touch", ["Window", "Join"]),
    # r12: dimension audit — posexplode + a map-side-combinable
    # aggregate at dimension grain (partial_sum before the exchange)
    ("embedding_dimension_stats", ["Generate", "HashAggregate"]),
    # r12: calibration — 1-row model + 1-row percentile cuts broadcast
    # back (sanctioned crosses), grouped rollup at quintile grain
    ("quality_probe_calibration", ["BroadcastNestedLoopJoin", "HashAggregate"]),
    # r13: IVF-PQ — probed-cell isin filter BEFORE the Arrow stage,
    # residual zip_with against the broadcast centroid table, global
    # refine window; no nested-loop join anywhere
    ("ann_ivfpq_topk", ["MapInPandas", "Filter", "Window"]),
    # r13: erase -> retighten -> erase — reads the maintained TxTable
    # (FileScan) and aggregates; retighten itself is metadata-only
    ("corpus_erasure_retighten", ["Scan parquet", "HashAggregate"]),
    # r13: outlier screen — one array-fold scan + sanctioned 1-row
    # moments cross, no windows
    ("embedding_vector_outliers", ["BroadcastNestedLoopJoin", "HashAggregate"]),
    # r13: cadence stats — user-partitioned window, one grouped agg
    ("events_interarrival_stats", ["Window", "HashAggregate"]),
    # r14: union near-dup graph — ONE inverted-index equi-join +
    # shared-count aggregate serves all three edge predicates; election
    # windows are cluster-partitioned
    ("dedup_containment_survivorship", ["HashAggregate", "Window", "Exchange"]),
    # r14: packing is one running-sum window PARTITIONED BY SOURCE —
    # never a global token order through one reducer
    ("corpus_pack_sequences", ["Window", "Exchange", "FileScan"]),
    # r14: hard negatives — bounded 10-row broadcast against the corpus
    # (the sanctioned cosine_topk shape), near-dup anti-join, top-3
    # window; corpus never self-joins
    ("contrastive_hard_negatives", ["BroadcastNestedLoopJoin", "Window"]),
    # r14: PQ with exact re-ranking — ADC Arrow scan, then the bounded
    # candidate fetch is a broadcast HASH join on the corpus id
    ("ann_pq_topk", ["MapInPandas", "BroadcastHashJoin", "Window"]),
    # r15: persisted IVF-PQ probe — the ADC scan reads the codes
    # table's FileScan (probed cells only via where_in dir pruning),
    # per-query top-k window; no nested-loop anywhere
    ("ann_ivfpq_index_probe", ["FileScan", "MapInPandas", "Window"]),
    # r15: BPE-grain packing — type-grain Arrow segmenter joined back
    # to the token stream (hash join), doc aggregate, per-shard window
    ("corpus_pack_bpe", ["MapInPandas", "Join", "Window", "Exchange"]),
    # r15: audio exact window dedup — digest equi-join on (window,
    # digest) + one grouped vote; payload bytes never shuffle
    ("multimodal_audio_dedup", ["HashAggregate", "Join", "NestedLoop"]),
    # r15: audio perceptual near-dup — per-window Arrow FFT fingerprint
    # materialized once (eager localCheckpoint), key_cap window, shared
    # banding equi-join + aligned-window vote
    ("multimodal_audio_fingerprint", ["Window", "Join", "Scan ExistingRDD", "NestedLoop"]),
    # r15: unigram encode — type-grain Arrow Viterbi hash-joined back
    # to the token stream, doc-grain aggregate; no nested loop. (The
    # trainer's own jobs run eagerly — its returned table is the
    # bounded vocabulary, so the encode plan is the showcase.)
    ("vocab_unigram_encode", ["MapInPandas", "Join", "HashAggregate", "NestedLoop"]),
    # r15: bucketed co-located join — SortMergeJoin with NO exchange
    # on either join key (the only Exchanges are the post-join
    # aggregate and the final sort); the query body asserts this too
    ("join_bucketed_colocated", ["SortMergeJoin", "Exchange"]),
    # r15: bucket-pruned point lookup — the scan reads 3 of 8 buckets
    ("join_bucket_pruned_lookup", ["SelectedBucketsCount", "PushedFilters"]),
]


def _skew_section(spark, sf_dir: str) -> list[str]:
    """AQE skew-join split evidence — needs EXECUTION (the skew read is
    an adaptive re-plan, invisible in the static executedPlan), so this
    section collects the x8 hot-key join and extracts the final plan.
    Thresholds are lowered to local scale; at 100 TB the defaults
    (256 MB partition, 5x median) fire unaided. Sits next to the
    salting helpers (operators/skew.py) as the two skew answers:
    AQE split needs upstream map parallelism, salting does not.
    """
    from hapiy_etl_spark.operators.skew import hot_key_join

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        j = hot_key_join(spark, sf_dir, k=8, hot_share=0.4)
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        lines = [
            "## aqe_skew_join_split (executed, x8 hot-key replication)",
            "",
            "40% of an x8-replicated lineitem funneled onto one supplier key;",
            "broadcast disabled so the join shuffles. Final adaptive plan:",
            "",
        ]
        for ln in plan.splitlines():
            if ("skew" in ln.lower() and "Join" in ln) or "AQEShuffleRead" in ln:
                clean = re.sub(r"#\d+L?", "", ln.strip())
                lines.append(f"- `{clean[:160]}`")
        lines.append("")
        return lines
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")


def _bloom_section(spark, sf_dir: str) -> list[str]:
    """Runtime bloom-filter join pruning — needs the application-side
    scan threshold lowered at local scale (the 10 GB default fires
    unaided in production); exactness vs the injection-off join is
    pinned by tests/test_relational_extra.py::
    test_runtime_bloom_filter_prunes_probe_side."""
    from pyspark.sql import functions as F

    key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    spark.conf.set(key, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        lines = [
            "## runtime_bloom_filter_join_pruning (thresholds lowered to expose)",
            "",
            "Selective build-side filter (URGENT orders) ⟶ Catalyst injects a",
            "bloom subquery that prunes the probe-side lineitem scan BEFORE the",
            "join shuffle; partial_bloom_filter_agg shows the filter builds",
            "distributed (map-side partials). Default gating needs a >= 10 GB",
            "probe scan — auto-satisfied at production scale.",
            "",
        ]
        for ln in plan.splitlines():
            if "might_contain" in ln or "bloom_filter_agg" in ln:
                clean = re.sub(r"#\d+L?", "", ln.strip())
                lines.append(f"- `{clean[:160]}`")
        lines.append("")
        return lines
    finally:
        spark.conf.unset(key)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def main() -> None:
    from hapiy_etl_spark.registry import all_queries
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("plan_dump")
    sf_dir = "/root/testdata/sf0.01"
    qs = all_queries()
    out = [
        "# PLANS — physical-plan evidence (generated by tools/dump_plans.py)",
        "",
        "Extracted markers from `.explain()` at sf0.01. Full plans are long;",
        "these are the lines that prove the scale posture: filters pushed to",
        "the parquet scan, projections pruned in ReadSchema, dims broadcast,",
        "single-shuffle window kernels. Regenerate: `python tools/dump_plans.py`.",
        "",
    ]
    for name, markers in SHOWCASE:
        plan = qs[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}\n")
        for marker in markers:
            hits = [ln.strip() for ln in plan.splitlines() if marker in ln][:3]
            for h in hits:
                h = re.sub(r"#\d+L?", "", h)  # strip expr ids for stable diffs
                # keep the marker visible when it sits deep in a long
                # line (e.g. SelectedBucketsCount inside a FileScan)
                idx = h.find(marker)
                if idx > 120:
                    h = "… " + h[max(0, idx - 20) : idx + 140]
                out.append(f"- `{h[:160]}`")
            if not hits:
                out.append(f"- (no `{marker}` in plan)")
        out.append("")
    out.extend(_skew_section(spark, sf_dir))
    out.extend(_bloom_section(spark, sf_dir))
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(out)} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
