"""Corpus-replication scale-growth harness for the dedup family.

Replicating the sf0.1 documents corpus k-fold turns every document into
a k-clique of exact duplicates, so TRUE pair output grows quadratically
in k — the adversarial case for inverted-index self-joins and banded
LSH. A scale-safe engine holds wall-clock growth near-linear while the
output explodes. r2 measured x1/x2/x4; r3 extends to x8 (BASELINE.md
"Scale-growth check" section records the numbers).

r4 adds `--graph`: disjoint k-fold lineitem replication (order AND
part keys shifted — same distribution, k-times the rows) through the
co-purchase triangle pipeline; edges/triangles must grow linearly and
wall-clock must track input, never the wedge space.

Usage: python tools/scale_growth.py [k ...]          (default: 1 2 4 8)
       python tools/scale_growth.py --graph [k ...]  (default: 1 2 4)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated(docs, k: int):
    from pyspark.sql import functions as F

    if k == 1:
        return docs
    return (
        docs.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("doc_id", F.col("doc_id") * k + F.col("__r"))
        .drop("__r")
    )


def graph_main(ks: list[int]) -> None:
    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.graph import triangle_stats
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_graph")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    mo = li.agg(F.max("l_orderkey")).first()[0] + 1
    mp = li.agg(F.max("l_partkey")).first()[0] + 1
    results: dict[str, dict[str, float]] = {}
    for k in ks:
        reps = [
            li.select(
                (F.col("l_orderkey") + F.lit(i * mo)).alias("o"),
                (F.col("l_partkey") + F.lit(i * mp)).alias("p"),
            )
            for i in range(k)
        ]
        df = reps[0]
        for x in reps[1:]:
            df = df.unionAll(x)
        edges = __import__(
            "hapiy_etl_spark.queries.graph", fromlist=["copurchase_edges_from"]
        ).copurchase_edges_from(df)
        t0 = time.time()
        row = triangle_stats(edges).collect()[0]
        dt = round(time.time() - t0, 2)
        results[f"x{k}"] = {
            "sec": dt,
            "edges": row.n_edges,
            "triangles": row.n_triangles,
            "nodes": row.n_nodes,
        }
        print(f"x{k}: {dt}s {row.n_edges} edges {row.n_triangles} triangles", flush=True)
        spark.catalog.clearCache()
    print(json.dumps(results))
    spark.stop()


def skew_main(ks: list[int]) -> None:
    """AQE skew-join wall-clock at replicated scale: the x{k} hot-key
    join (operators/skew.py:hot_key_join — 40% of rows on one supplier
    key, incompressible payload) timed with AQE skewJoin ON vs OFF.
    ON must carry SortMergeJoin(skew=true) in the final plan; the
    OFF run shows what the hot reducer costs without the split.
    Thresholds are lowered to local scale (production defaults fire
    unaided at real partition sizes)."""
    from hapiy_etl_spark.operators.skew import hot_key_join
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    hot_key_join(spark, SF_DIR, k=1).collect()  # untimed session/JIT warmup
    results: dict[str, dict[str, float | bool]] = {}
    for k in ks:
        for mode, enabled in (("aqe_on", "true"), ("aqe_off", "false")):
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", enabled)
            j = hot_key_join(spark, SF_DIR, k=k, hot_share=0.4)
            t0 = time.time()
            j.collect()
            dt = round(time.time() - t0, 2)
            plan = j._jdf.queryExecution().executedPlan().toString()
            split = "skew=true" in plan
            results[f"x{k}_{mode}"] = {"sec": dt, "skew_split": split}
            print(f"x{k} {mode}: {dt}s skew_split={split}", flush=True)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    print(json.dumps(results))
    spark.stop()


def pq_main(ks: list[int]) -> None:
    """PQ codebook head-bias at replicated scale (r5 VERDICT task 4).

    Corpus: sf0.1 embeddings replicated k-fold (ids shifted) and SORTED
    BY LABEL — the adversarial clustered layout where limit(train_limit)
    trains codebooks on the first label(s) only. Measures recall@10 of
    pq_topk against exact L2 ground truth (same-base replicas excluded
    on both sides) for head-taken vs md5-uniform-sampled training rows.
    Records the BASELINE.md "PQ training-sample" row.
    """
    import numpy as np
    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.similarity import pq_topk
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_pq")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base_n = emb.count()
    # The sf0.1 embeddings are iid (labels carry no geometry — verified:
    # label centroids all ≈ 0), so label-sorting alone is not clustered.
    # Plant REAL cluster structure: shift every vector by a per-label
    # centroid (unit direction × 4, comparable to the ~1.4 within-label
    # spread) — the corpus shape where a head-taken training sample sees
    # one cluster and its codebooks never cover the rest.
    rng = np.random.default_rng(42)
    offs = [(int(l), (4.0 * (lambda v: v / np.linalg.norm(v))(rng.standard_normal(64))).tolist()) for l in range(10)]
    off_df = spark.createDataFrame(offs, "label int, __off array<double>")
    emb = (
        emb.join(F.broadcast(off_df), "label")
        .select(
            "vec_id",
            F.zip_with("embedding", "__off", lambda a, b: a + b).alias("embedding"),
            "label",
        )
    )
    queries = emb.where(F.col("vec_id") % 40 == 0).cache()  # 50 across labels
    results: dict[str, dict[str, float]] = {}
    K = 10
    for k in ks:
        reps = [
            emb.select(
                (F.col("vec_id") + F.lit(i * base_n)).alias("vec_id"),
                "embedding",
                "label",
            )
            for i in range(k)
        ]
        corpus = reps[0]
        for x in reps[1:]:
            corpus = corpus.unionAll(x)
        # clustered layout: global sort by label so the corpus head is
        # one label's distribution
        corpus = corpus.orderBy("label", "vec_id").cache()
        corpus.count()

        # exact L2 ground truth on the driver (experiment harness only;
        # the engine path is ann_cosine_topk / lsh / ivf)
        rows = corpus.select("vec_id", "embedding", "label").collect()
        ids = np.array([r[0] for r in rows])
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        lab = {int(r[0]) % base_n: int(r[2]) for r in rows}
        q_rows = queries.select("vec_id", "embedding").collect()
        truth: dict[int, set] = {}
        for qid, qv in q_rows:
            d = ((mat - np.array(qv, dtype=np.float64)) ** 2).sum(axis=1)
            order = np.lexsort((ids, d))
            picked, seen_base = [], {qid % base_n}
            for ci in order:
                b = int(ids[ci]) % base_n
                if b in seen_base:
                    continue
                seen_base.add(b)
                picked.append(b)
                if len(picked) == K:
                    break
            truth[qid] = set(picked)

        for mode, frac in (
            ("head", None),
            ("uniform", min(1.0, 2500.0 / (base_n * k))),
        ):
            t0 = time.time()
            out = pq_topk(
                queries, corpus, "vec_id", "vec_id",
                # exact replicas tie by code: budget (K+3) distinct
                # bases' worth of candidates per replica factor
                k=(K + 3) * k, m=8, n_codes=16,
                train_limit=2000, train_fraction=frac,
            ).collect()
            dt = round(time.time() - t0, 2)
            got: dict[int, list] = {}
            for r in sorted(out, key=lambda r: (r.vec_id, r.rank)):
                lst = got.setdefault(r.vec_id, [])
                b = r.neighbor_id % base_n
                if b != r.vec_id % base_n and b not in lst and len(lst) < K:
                    lst.append(b)
            recalls = [
                len(set(got.get(qid, [])) & truth[qid]) / K for qid, _ in q_rows
            ]
            rec = round(float(np.mean(recalls)), 3)
            # cluster (label) precision: within-cluster RANKING on this
            # corpus is iid noise (codebook-insensitive), but returning
            # neighbors from the query's CLUSTER is exactly what biased
            # codebooks break — the head-bias signal
            precs = [
                (
                    np.mean([lab[b] == lab[qid % base_n] for b in got[qid]])
                    if got.get(qid)
                    else 0.0
                )
                for qid, _ in q_rows
            ]
            prec = round(float(np.mean(precs)), 3)
            results[f"x{k}_{mode}"] = {
                "sec": dt, "recall_at_10": rec, "label_precision_at_10": prec
            }
            print(
                f"x{k} {mode}: recall@10={rec} label_prec@10={prec} {dt}s",
                flush=True,
            )
        corpus.unpersist()
    print(json.dumps(results))
    spark.stop()


def mv_main(n_batches: int) -> None:
    """Incremental-MV growth: append the sf0.1 events table n times to a
    TxTable, and after each append time (a) the incremental view
    refresh and (b) a from-scratch recompute of the same aggregate over
    the full snapshot. The scale claim under test: refresh cost tracks
    the NEW batch (flat as the table grows) while recompute tracks the
    table (linear in batches)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.incremental_mv import IncrementalAggView
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_mv")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_returnflag").alias("k"), F.col("l_extendedprice").alias("v")
    )
    batch_rows = li.count()
    base = tempfile.mkdtemp(prefix="mv_growth_")
    src = TxTable(spark, f"{base}/src")
    mv = IncrementalAggView(spark, src, f"{base}/mv", ["k"], "v")
    rows = []
    for i in range(1, n_batches + 1):
        src.append(li)
        t0 = time.perf_counter()
        rep = mv.refresh()
        t_refresh = time.perf_counter() - t0
        t0 = time.perf_counter()
        src.read().groupBy("k").agg(
            F.count("*"), F.sum(F.col("v").cast("decimal(28,4)")),
            F.min("v"), F.max("v"),
        ).collect()
        t_recompute = time.perf_counter() - t0
        rows.append(
            {
                "batches": i,
                "mode": rep["mode"],
                "refresh_s": round(t_refresh, 2),
                "recompute_s": round(t_recompute, 2),
                # load-immune evidence: rows each path must scan
                "refresh_scans_rows": batch_rows,
                "recompute_scans_rows": batch_rows * i,
            }
        )
        print(json.dumps(rows[-1]))
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"mv_growth": rows}))


def joinmv_main(n_batches: int) -> None:
    """Join-MV growth (r9): append KEY-RANGE-striped lineitem slices
    (with pk stats) to a fact TxTable joined to the part dim, and
    after each append time (a) the incremental join-view refresh and
    (b) a from-scratch recompute of the same aggregate over the full
    join. Midway, a held-back dim subset — confined to stripe 0's key
    range — arrives late: the F_old ⋈ ΔD term prunes the consumed
    fact history to the dirs intersecting the delta's key bounds
    (stats_prune_dirs), so the late-dim spike reads ~1 dir, not the
    whole history. Claims: refresh tracks the delta, recompute tracks
    the table, and even the late-dim repair is bounded by key
    locality, not corpus age."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.incremental_mv import IncrementalJoinAggView
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_joinmv")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.col("l_partkey").alias("pk"), F.col("l_extendedprice").alias("v")
    )
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select(
        F.col("p_partkey").alias("pk"), F.col("p_brand").alias("brand")
    )
    width = (part.agg(F.max("pk")).first()[0] + n_batches) // n_batches
    # a few stripe-0 dim keys arrive LATE, mid-run
    held = part.where(
        (F.col("pk") < width) & (F.pmod("pk", F.lit(7)) == 3)
    )
    dim_a = part.join(held.select("pk"), "pk", "left_anti")
    base = tempfile.mkdtemp(prefix="joinmv_growth_")
    fact = TxTable(spark, f"{base}/fact")
    dim = TxTable(spark, f"{base}/dim")
    dim.append(dim_a)
    mv = IncrementalJoinAggView(
        spark, fact, dim, f"{base}/mv", ["pk"], ["brand"], "v"
    )
    rows = []
    dim_batch_at = n_batches // 2 + 1
    for i in range(1, n_batches + 1):
        stripe = li.where(
            (F.col("pk") >= (i - 1) * width) & (F.col("pk") < i * width)
        )
        fact.append(stripe, stats_cols=["pk"])
        if i == dim_batch_at:
            dim.append(held)  # late dim: bounded, PRUNED history repair
        t0 = time.perf_counter()
        rep = mv.refresh()
        t_refresh = time.perf_counter() - t0
        t0 = time.perf_counter()
        fact.read().join(dim.read(), "pk").groupBy("brand").agg(
            F.count("*"), F.sum(F.col("v").cast("decimal(28,4)")),
            F.min("v"), F.max("v"),
        ).collect()
        t_recompute = time.perf_counter() - t0
        rows.append(
            {
                "batches": i,
                "mode": rep["mode"],
                "dim_appended": i == dim_batch_at,
                "scanned_fact_history": rep.get("scanned_fact_history"),
                "fact_dirs_rescanned": rep.get("fact_dirs_rescanned"),
                "consumed_fact_dirs": i - 1,
                "refresh_s": round(t_refresh, 2),
                "recompute_s": round(t_recompute, 2),
            }
        )
        print(json.dumps(rows[-1]))
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"joinmv_growth": rows}))


def textindex_main(n_batches: int) -> None:
    """Inverted-index growth (r9): append disjoint document batches to
    the persisted postings index, and after each append time (a) the
    incremental postings append (tokenize the BATCH only), (b) the
    bucket-pruned BM25 probe over the whole index, and (c) a
    from-scratch full-corpus BM25 (tokenize everything, the no-index
    baseline). Claims: append tracks the batch; the probe tracks the
    query terms' postings (slow growth — those lists lengthen with the
    corpus); the no-index baseline re-tokenizes the world every query."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark

    terms = ["data", "pipeline", "model", "stream"]
    spark = get_spark("scale_growth_textindex")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    base = tempfile.mkdtemp(prefix="textindex_growth_")
    idx = TxTable(spark, f"{base}/postings")
    meta = TxTable(spark, f"{base}/meta")
    rows = []
    for i in range(1, n_batches + 1):
        batch = docs.withColumn("doc_id", F.col("doc_id") + F.lit((i - 1) * n_docs))
        t0 = time.perf_counter()
        p, m = TI.postings_build(batch)
        # steady-state ingest: one mixed dir per batch (the split/
        # re-cluster trade is OPTIMIZE's job, measured elsewhere)
        TI.postings_append(idx, meta, p, m, split_buckets=False)
        t_append = time.perf_counter() - t0
        t0 = time.perf_counter()
        TI.bm25_probe_index(
            lambda bs: idx.read(where_in={"tb": bs}), meta.read(), terms, k=20
        ).collect()
        t_probe = time.perf_counter() - t0
        t0 = time.perf_counter()
        # no-index baseline: re-tokenize the ENTIRE corpus ingested so far
        reps = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(j * n_docs))
            for j in range(i)
        ]
        alldocs = reps[0]
        for r in reps[1:]:
            alldocs = alldocs.unionByName(r)
        fp, fm = TI.postings_build(alldocs)
        TI.bm25_probe_index(fp, fm, terms, k=20).collect()
        t_full = time.perf_counter() - t0
        rows.append(
            {
                "batches": i,
                "append_s": round(t_append, 2),
                "probe_s": round(t_probe, 2),
                "fullscan_s": round(t_full, 2),
                "append_tokenizes_docs": n_docs,
                "fullscan_tokenizes_docs": n_docs * i,
            }
        )
        print(json.dumps(rows[-1]))
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"textindex_growth": rows}))


def streamdedup_main(n_batches: int) -> None:
    """Online-dedup ingest growth (r9): push disjoint document batches
    through the exact sink path of foreach_batch_ingest_dedup
    (streaming/jobs.py ingest_dedup_batch) and after each batch time
    (a) the incremental dedup+commit (sig the BATCH, band-join the
    stored signature index, two TxTable appends) and (b) the no-index
    baseline (re-signature the ENTIRE corpus text so far and band-join
    the batch against it). Claims: the incremental path tracks the
    batch + its collisions while the corpus multiplies; the baseline
    re-hashes the world every batch. Batch texts are token-prefixed
    per batch so cross-batch jaccard stays < threshold (the corpus
    genuinely grows); every 3rd batch re-sends the PREVIOUS batch's
    text under new ids so the vs-index drop path does real work."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators import dedup as D
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark
    from hapiy_etl_spark.streaming.jobs import ingest_dedup_batch

    spark = get_spark("scale_growth_streamdedup")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n_docs = docs.count()
    base = tempfile.mkdtemp(prefix="streamdedup_growth_")
    corpus, sigp = f"{base}/corpus", f"{base}/sigs"

    rep = 4  # 4x documents per batch, so the baseline's corpus-wide
    # re-signature has real data to chew instead of fixed overhead

    def batch_of(i: int):
        # prefix every token with a (batch, replica) tag: all shingles
        # differ across batches AND replicas, so batch i is genuinely
        # new text, not a near-dup wave
        tag = i if i % 3 != 0 else i - 1  # every 3rd batch replays the
        # previous batch's TEXT under fresh ids -> dropped vs the index
        return docs.withColumn(
            "__r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
        ).select(
            (
                F.col("doc_id") * rep + F.col("__r") + F.lit(i * n_docs * rep)
            ).alias("doc_id"),
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(
                    F.lit(f"b{tag}r"), F.col("__r").cast("string"), F.lit("$1")
                ),
            ).alias("text"),
        )

    rows = []
    for i in range(1, n_batches + 1):
        b = batch_of(i)
        t0 = time.perf_counter()
        # drive the REAL dir-sizing policy (r11): the clustered dir
        # count derives from the index's POST-append rows via
        # maintenance.sized_cluster_dirs, same inputs and order as the
        # sink's None-default (append → derive → compact; review r11
        # caught a pre-append derivation that lagged the shipped rule
        # by one batch) — with a toy target_rows_per_dir so the rule's
        # growth (floor → rows-derived → pinned at one-dir-per-bucket)
        # happens inside the harness's ~10 batches instead of at TB
        # scale. Claims: derived n_dirs grows with the index, pins at
        # n_band_buckets=16, and the NARROW tick's dirs-read stays
        # constant (<= n_bands=8) while index rows grow ~10x.
        from hapiy_etl_spark.operators.maintenance import (
            auto_compact,
            sized_cluster_dirs,
        )

        ingest_dedup_batch(
            b, corpus, sigp, epoch_id=i, run_id="growth",
        )
        auto_compact(TxTable(spark, corpus), 4)
        derived_dirs = sized_cluster_dirs(
            TxTable(spark, sigp).read().count(),
            16, 32, target_rows_per_dir=1500, floor=2,
        )
        auto_compact(
            TxTable(spark, sigp), 4,
            cluster_by="bb", n_dirs=derived_dirs,
        )
        t_incr = time.perf_counter() - t0
        # structural r10 metric: replicate the sink's pruned index read
        # for THIS batch and count dirs touched vs dirs in the snapshot
        sig_t = TxTable(spark, sigp)
        bp = D.band_postings(
            D.minhash_signatures(
                b.where(F.col("text").isNotNull()), "doc_id", "text",
                portable=True,
            ),
            portable=True,
        )
        present = sorted(r[0] for r in bp.select("bb").distinct().collect())
        from hapiy_etl_spark.operators.txstore import dirs_read

        dirs_touched = len(dirs_read(sig_t.read(where_in={"bb": present})))
        # a NARROW tick (trickle ingestion, the common steady state):
        # one document probes <= n_bands buckets — after the policy's
        # bb-clustered compactions it must skip most of the index dirs
        np_bp = D.band_postings(
            D.minhash_signatures(
                b.where(F.col("text").isNotNull()).limit(1),
                "doc_id", "text", portable=True,
            ),
            portable=True,
        )
        np_present = sorted(
            r[0] for r in np_bp.select("bb").distinct().collect()
        )
        narrow_touched = len(
            dirs_read(sig_t.read(where_in={"bb": np_present}))
        ) if np_present else 0
        t0 = time.perf_counter()
        # no-index baseline: re-signature ALL corpus text ingested so
        # far (union of surviving rows) and band-join the batch
        corpus_text = TxTable(spark, corpus).read()
        D.dedup_against_index(
            D.minhash_signatures(
                b.where(F.col("text").isNotNull()), "doc_id", "text",
                portable=True,
            ),
            D.minhash_signatures(
                corpus_text.where(F.col("text").isNotNull()),
                "doc_id", "text", portable=True,
            ),
            portable=True,
        ).count()
        t_full = time.perf_counter() - t0
        idx_rows = TxTable(spark, sigp).read().count()
        corpus_docs = corpus_text.count()
        batch_docs = n_docs * rep
        rows.append(
            {
                "batches": i,
                "replay_batch": i % 3 == 0,
                "incr_dedup_commit_s": round(t_incr, 2),
                "fullscan_baseline_s": round(t_full, 2),
                "index_sig_rows": idx_rows,
                "index_dirs_total": sig_t.n_dirs(),
                "index_dirs_read": dirs_touched,
                "narrow_tick_dirs_read": narrow_touched,
                "policy_derived_n_dirs": derived_dirs,
                # the structural contrast (wall clock at local scale is
                # overhead-bound): the incremental path re-hashes only
                # the BATCH text (+ reads the narrow sig index); the
                # baseline re-hashes the whole corpus every batch
                "incr_hashes_docs": batch_docs,
                "baseline_hashes_docs": corpus_docs + batch_docs,
            }
        )
        print(json.dumps(rows[-1]))
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"streamdedup_growth": rows}))


def batchfetch_main(n_batches: int) -> None:
    """1000-key where_in fetch (VERDICT r9 item 4): the DATA-parallel
    bloom probe (txstore._bloom_positions_many, r10 — probe values as
    ROWS of one tiny local DataFrame per recorded bloom geometry,
    hashed by k constant expressions) must keep the DRIVER stable as
    the key list grows — bloom_batch_fetch [O] only exercises a
    handful of keys, and the r8 expression-parallel form this replaced
    spent ~25 s of pure py4j Column construction at 1000 keys. Build a
    bloomed table of n_batches disjoint dirs, then fetch 10 / 100 /
    1000 keys spread across every batch in ONE where_in read each;
    record the read() planning wall (O(1) expressions, O(geometries)
    driver round-trips), the fetch wall, and dirs read. The scale
    claim: per-key planning cost FALLS with batch size (the fixed
    round-trip amortizes) and the driver never builds per-value
    expressions."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable, dirs_read
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_batchfetch")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    lo = int(docs.agg(F.min("doc_id")).first()[0])
    base = tempfile.mkdtemp(prefix="batchfetch_growth_")
    t = TxTable(spark, f"{base}/t")
    for i in range(n_batches):
        t.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * span)),
            bloom_cols=["doc_id"],
            bloom_bits=131072,
        )
    rows = []
    for n_keys in (10, 100, 1000):
        # keys striped across every batch's range — the adversarial
        # shape for pruning (every dir holds some), the realistic one
        # for a training-data point-fetch (docs come from everywhere)
        keys = [
            lo + (j % n_batches) * span + (j * 37) % 1000
            for j in range(n_keys)
        ]
        t0 = time.perf_counter()
        df = t.read(where_in={"doc_id": keys})
        t_plan = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetched = df.count()
        t_fetch = time.perf_counter() - t0
        rows.append(
            {
                "n_keys": n_keys,
                "plan_s": round(t_plan, 3),
                "plan_ms_per_key": round(t_plan * 1000 / n_keys, 3),
                "fetch_s": round(t_fetch, 2),
                "rows_fetched": fetched,
                "dirs_read": len(dirs_read(df)),
                "total_dirs": t.n_dirs(),
            }
        )
        print(json.dumps(rows[-1]))
    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"batchfetch_growth": rows}))


def stats_main(n_batches: int) -> None:
    """Manifest-stats growth: land n time-shifted copies of the sf0.1
    events table as stats-carrying appends (each batch a later 32-day
    window — the append-mostly-in-time-order shape of a commit log),
    then as the table grows measure (a) a 7-day windowed read and
    (b) a hinted retention delete of the oldest window. The scale claim
    under test: both touch ~1 dir regardless of table size (flat),
    while the unhinted/unpruned forms touch all n (linear)."""
    import datetime as dt
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_stats")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "ts", "event_type", "value"
    )
    t0_ts = ev.agg(F.min("ts")).first()[0]
    base = tempfile.mkdtemp(prefix="stats_growth_")
    src = TxTable(spark, f"{base}/src")
    rows = []
    for i in range(1, n_batches + 1):
        shifted = ev.withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {(i - 1) * 32} DAYS")
        )
        src.append(shifted, stats_cols=["ts"])
        lo = t0_ts + dt.timedelta(days=(i - 1) * 32 + 5)
        hi = lo + dt.timedelta(days=7)
        t0 = time.perf_counter()
        pruned = src.read(where_range={"ts": (lo, hi)})
        n_pruned = pruned.count()
        t_pruned = time.perf_counter() - t0
        from hapiy_etl_spark.operators.txstore import dirs_read

        pruned_dirs = dirs_read(pruned)
        t0 = time.perf_counter()
        full = src.read().where((F.col("ts") >= lo) & (F.col("ts") <= hi))
        n_full = full.count()
        t_full = time.perf_counter() - t0
        assert n_pruned == n_full
        rows.append(
            {
                "batches": i,
                "window_read_dirs": len(pruned_dirs),
                "total_dirs": i,
                "pruned_read_s": round(t_pruned, 2),
                "full_scan_read_s": round(t_full, 2),
            }
        )
        print(json.dumps(rows[-1]))
    # retention: hinted delete of the oldest 32-day window rewrites 1 dir
    cutoff = t0_ts + dt.timedelta(days=32)
    before = set(src._manifest(src.latest_version())["dirs"])
    t0 = time.perf_counter()
    src.delete_where(
        f"ts < TIMESTAMP '{cutoff.isoformat()}'", range_hint={"ts": (None, cutoff)}
    )
    t_del = time.perf_counter() - t0
    after = src._manifest(src.latest_version())["dirs"]
    summary = {
        "stats_growth": rows,
        "hinted_delete_rewrote_dirs": len(before) - len(set(after) & before),
        "hinted_delete_total_dirs": len(before),
        "hinted_delete_s": round(t_del, 2),
    }
    print(json.dumps(summary))
    shutil.rmtree(base, ignore_errors=True)


def mergeprune_main(n_batches: int) -> None:
    """MERGE file-pruning growth: land n disjoint-key-range copies of
    the sf0.1 events table as stats-carrying appends, and after each,
    time an upsert confined to the newest key range — once WITH
    prune_col (rewrites only the tail dir) and once WITHOUT (classic
    copy-on-write of the whole table). The scale claim: pruned-merge
    cost tracks the tail (flat), full-merge cost tracks the table
    (linear) — with dirs-rewritten as the load-immune metric."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_mergeprune")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    span = ev.agg(F.max("event_id")).first()[0] + 1
    base = tempfile.mkdtemp(prefix="mergeprune_growth_")
    pruned = TxTable(spark, f"{base}/pruned")
    full = TxTable(spark, f"{base}/full")
    rows = []
    for i in range(1, n_batches + 1):
        batch = ev.withColumn("event_id", F.col("event_id") + F.lit((i - 1) * span))
        pruned.append(batch, stats_cols=["event_id"])
        full.append(batch, stats_cols=["event_id"])
        correction = batch.where(F.col("event_id") % 97 == 0).withColumn(
            "value", F.col("value") * 2
        )
        before = set(pruned._manifest(pruned.latest_version())["dirs"])
        t0 = time.perf_counter()
        pruned.merge(correction, keys=["event_id"], prune_col="event_id")
        t_pruned = time.perf_counter() - t0
        after = pruned._manifest(pruned.latest_version())["dirs"]
        rewrote = len(before) - len(set(after) & before)
        t0 = time.perf_counter()
        full.merge(correction, keys=["event_id"])
        t_full = time.perf_counter() - t0
        rows.append(
            {
                "batches": i,
                "pruned_merge_s": round(t_pruned, 2),
                "full_merge_s": round(t_full, 2),
                "pruned_rewrote_dirs": rewrote,
                "pruned_total_dirs": len(before),
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"mergeprune_growth": rows}))
    shutil.rmtree(base, ignore_errors=True)


def bloom_main(n_batches: int) -> None:
    """Bloom point-lookup growth: land n disjoint copies of the sf0.1
    documents table (doc_id shifted per batch) as bloom-carrying
    appends; after each, look up one key known to live in the FIRST
    batch. The scale claim: dirs read stays ~1 (bloom false-positive
    rate per extra dir ≈1%) while an unpruned lookup reads all n."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_bloom")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    target = int(docs.agg(F.min("doc_id")).first()[0])
    base = tempfile.mkdtemp(prefix="bloom_growth_")
    t = TxTable(spark, f"{base}/t")
    rows = []
    for i in range(1, n_batches + 1):
        t.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit((i - 1) * span)),
            bloom_cols=["doc_id"],
            # size to ~20x the ~5k distinct keys per batch (16 KB):
            # the default 4 KB geometry saturates at this density and
            # false-positives grow with table size (measured 1->3 dirs
            # of 8) — sizing is the caller's lever, recorded per entry
            bloom_bits=131072,
        )
        t0 = time.perf_counter()
        df = t.read(where={"doc_id": target})
        n = df.count()
        dt_pruned = time.perf_counter() - t0
        from hapiy_etl_spark.operators.txstore import dirs_read as _dirs_read

        n_dirs_read = len(_dirs_read(df))
        assert n == 1
        rows.append(
            {
                "batches": i,
                "lookup_dirs_read": n_dirs_read,
                "total_dirs": i,
                "lookup_s": round(dt_pruned, 2),
            }
        )
        print(json.dumps(rows[-1]))
    print(json.dumps({"bloom_growth": rows}))
    shutil.rmtree(base, ignore_errors=True)


def mergebloom_main(n_batches: int) -> None:
    """Bloom-through-MERGE growth (r8): land n disjoint-key-range
    bloomed batches; after each append, a small UPSERT confined to the
    FIRST batch's key range runs with prune_col (rewriting ~one dir),
    then a point lookup of an updated key and one of a far untouched
    key. The scale claim: post-merge lookups still read ~1 of n dirs
    at every n — before r8 the merged dir lost its bloom and every
    lookup paid a scan of it forever."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.operators.txstore import dirs_read as _dirs_read
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_mergebloom")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    target = int(docs.agg(F.min("doc_id")).first()[0])
    base = tempfile.mkdtemp(prefix="mergebloom_growth_")
    t = TxTable(spark, f"{base}/t")
    rows = []
    for i in range(1, n_batches + 1):
        t.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit((i - 1) * span)),
            stats_cols=["doc_id"],
            bloom_cols=["doc_id"],
            bloom_bits=131072,
        )
        # upsert 100 keys inside the FIRST batch's range: prune carries
        # every other dir, the rewritten dir gets the OR-union bloom
        batch = (
            docs.orderBy("doc_id")
            .limit(100)
            .withColumn("n_chars", F.lit(-1).cast(docs.schema["n_chars"].dataType))
        )
        t0 = time.perf_counter()
        t.merge(batch, keys=["doc_id"], prune_col="doc_id")
        dt_merge = time.perf_counter() - t0
        far = target + (i - 1) * span  # lives in the NEWEST batch's dir
        out = {"batches": i, "total_dirs": i, "merge_s": round(dt_merge, 2)}
        for label, key in (("updated", target), ("far", far)):
            t0 = time.perf_counter()
            df = t.read(where={"doc_id": key})
            n = df.count()
            out[f"{label}_dirs_read"] = len(_dirs_read(df))
            out[f"{label}_lookup_s"] = round(time.perf_counter() - t0, 2)
            assert n == 1
        rows.append(out)
        print(json.dumps(out))
    print(json.dumps({"mergebloom_growth": rows}))
    shutil.rmtree(base, ignore_errors=True)


def optclustered_main(n_batches: int) -> None:
    """Range-clustered OPTIMIZE growth (r8): land n appends that EACH
    span the full doc_id range (every dir's recorded [min,max] covers
    every slice — range pruning is useless, a slice read scans all n
    dirs). Then optimize_clustered(doc_id, n) and re-run the slice.
    The scale claim: the clustered rewrite restores 1-of-n dir reads
    no matter how many interleaved appends accumulated — and a plain
    optimize() would instead collapse to ONE unprunable dir."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.operators.txstore import dirs_read as _dirs_read
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_optclustered")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    lo, hi = docs.agg({"doc_id": "min"}).first()[0], docs.agg(
        {"doc_id": "max"}
    ).first()[0]
    # slice = the bottom ~1/n of the key range
    rows = []
    for n in (
        [n_batches]
        if n_batches > 0
        else [2, 4, 8]
    ):
        base = tempfile.mkdtemp(prefix="optclustered_growth_")
        t = TxTable(spark, f"{base}/t")
        for i in range(n):
            # every batch spans the WHOLE range: interleave by stride
            t.append(
                docs.where((F.col("doc_id") % n) == i),
                stats_cols=["doc_id"],
            )
        cut = lo + (hi - lo) // n
        t0 = time.perf_counter()
        df = t.read(where_range={"doc_id": (lo, cut)})
        pre_rows = df.count()
        pre = {
            "dirs_read": len(_dirs_read(df)),
            "s": round(time.perf_counter() - t0, 2),
        }
        t0 = time.perf_counter()
        t.optimize_clustered("doc_id", n_dirs=n)
        dt_opt = time.perf_counter() - t0
        t0 = time.perf_counter()
        df = t.read(where_range={"doc_id": (lo, cut)})
        post_rows = df.count()
        post = {
            "dirs_read": len(_dirs_read(df)),
            "s": round(time.perf_counter() - t0, 2),
        }
        assert pre_rows == post_rows, (pre_rows, post_rows)
        assert pre["dirs_read"] == n, pre
        out = {
            "appends": n,
            "pre_slice": pre,
            "optimize_s": round(dt_opt, 2),
            "post_slice": post,
            "slice_rows": post_rows,
        }
        rows.append(out)
        print(json.dumps(out))
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"optclustered_growth": rows}))


def zorder_main(n_batches: int) -> None:
    """Multi-column Z-order OPTIMIZE growth (r9): land n interleaved
    appends of events (every dir spans BOTH the event_id and user_id
    ranges), then time a two-predicate box slice (bottom quarter of
    each key) under three layouts: as-appended (reads all n dirs),
    single-column optimize_clustered(event_id, n) (prunes on event_id
    only — ~n/4 dirs still match the box), and
    optimize_clustered([event_id, user_id], n) (Morton buckets — the
    box is local in BOTH dimensions, ~1-2 dirs). The scale claim:
    two-predicate slices need two-dimensional locality, and the
    clustered rewrite provides it at dir granularity with read-back
    stats in both columns."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.operators.txstore import dirs_read as _dirs_read
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_zorder")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    b = ev.agg(
        F.min("event_id"), F.max("event_id"), F.min("user_id"), F.max("user_id")
    ).first()
    cut_e = b[0] + (b[1] - b[0]) // 4
    cut_u = b[2] + (b[3] - b[2]) // 4
    box = {"event_id": (None, cut_e), "user_id": (None, cut_u)}
    rows = []
    for n in [n_batches] if n_batches > 0 else [8, 16]:
        out = {"appends": n}
        for mode in ("as_appended", "single_col", "zorder"):
            base = tempfile.mkdtemp(prefix="zorder_growth_")
            t = TxTable(spark, f"{base}/t")
            for i in range(n):
                t.append(
                    ev.where(F.pmod(F.xxhash64("event_id"), F.lit(n)) == i),
                    stats_cols=["event_id", "user_id"],
                )
            if mode == "single_col":
                t.optimize_clustered("event_id", n_dirs=n,
                                     stats_cols=["event_id", "user_id"])
            elif mode == "zorder":
                t.optimize_clustered(["event_id", "user_id"], n_dirs=n)
            t0 = time.perf_counter()
            df = t.read(where_range=box)
            n_rows = df.count()
            out[mode] = {
                "dirs_read": len(_dirs_read(df)),
                "s": round(time.perf_counter() - t0, 2),
                "rows": n_rows,
            }
            shutil.rmtree(base, ignore_errors=True)
        rows.append(out)
        print(json.dumps(out))
    print(json.dumps({"zorder_growth": rows}))


def soak_main(seconds: int) -> None:
    """Always-on soak of the online-dedup ingest (r11): a paced writer
    thread keeps appending waves to a file source while the sink
    drains through LOOPED availableNow runs resuming one engine
    checkpoint (restart-resume between runs — exactly-once composes
    across them; the wrapper pins availableNow for its [O] demos, so
    a loop-of-runs is the periodic-trigger stand-in here). Every 3rd
    wave re-sends the previous wave's text under fresh ids. Claims after N seconds of wall-clock: (a) rows
    exactly-once (corpus == expected survivors, replays dropped),
    (b) disk BOUNDED (retention vacuum composed into the sink keeps
    both tables' dirs and superseded data from growing O(epochs)),
    (c) steady per-tick latency (last-quartile batch durations not
    drifting above the first's — corpus age doesn't leak into tick
    cost thanks to the bucket-pruned index read)."""
    import shutil
    import tempfile
    import threading

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark
    from hapiy_etl_spark.streaming.jobs import foreach_batch_ingest_dedup

    spark = get_spark("scale_growth_soak")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull() & (F.col("doc_id") % 8 == 0))
    )
    n_docs = docs.count()
    # wave id stride must clear the slice's MAX id, not its row count:
    # a sparse or NULL-text fixture shrinks n_docs while ids stay
    # large, and overlapping wave windows would read as false
    # exactly-once failures (review r11)
    stride = 8 * (int(docs.agg(F.max("doc_id")).first()[0]) // 8 + 1)
    base = tempfile.mkdtemp(prefix="streamdedup_soak_")
    src = f"{base}/src"
    stop = threading.Event()
    wave_n = [0]

    def writer() -> None:
        # one new parquet file per wave; every 3rd wave replays the
        # previous wave's TEXT under new ids (must be dropped vs index).
        # Paced at ~1 wave / 2.5 s and hard-capped: a writer that
        # outruns the ~1-2 s/tick processor turns the post-soak drain
        # into an unbounded backlog chase (first r11 soak run wrote
        # 421 waves against a ~0.5 wave/s processor).
        while not stop.is_set() and wave_n[0] < max(10, seconds // 2):
            i = wave_n[0] + 1
            tag = i if i % 3 != 0 else i - 1
            batch = docs.select(
                (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                F.regexp_replace(
                    F.col("text"), F.lit(r"(\S+)"), F.lit(f"w{tag}$1")
                ).alias("text"),
            )
            batch.coalesce(1).write.mode("append").parquet(src)
            wave_n[0] = i
            stop.wait(2.5)

    docs.limit(0).write.mode("overwrite").parquet(src)
    t = threading.Thread(target=writer, daemon=True)
    t.start()
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = foreach_batch_ingest_dedup(
        stream,
        f"{base}/corpus",
        f"{base}/sigs",
        f"{base}/ckpt",
        auto_compact_max_dirs=24,
        corpus_compact_kw={"vacuum_keep_last": 8, "vacuum_min_age_s": 0.0},
        sig_compact_kw={
            # bb-clustered with RETENTION: the auto-derived None
            # default compacts but never vacuums (retention is an
            # explicit policy choice); an always-on soak wants both
            "cluster_by": "bb",
            "n_dirs": 16,
            "vacuum_keep_last": 8,
            "vacuum_min_age_s": 0.0,
        },
    )
    t0 = time.time()
    durations: list[float] = []
    run_commits: list[int] = []
    runs = 0
    corpus_probe = TxTable(spark, f"{base}/corpus")
    v_pre = 0  # q above started against fresh tables; later v_pre is
    # read BEFORE each restart so no commit escapes its run's count
    while time.time() - t0 < seconds:
        tq0 = time.time()
        q.awaitTermination()
        durations.append(round(time.time() - tq0, 2))
        v_now = corpus_probe.latest_version()
        run_commits.append(v_now - v_pre)
        v_pre = v_now
        runs += 1
        q = foreach_batch_ingest_dedup(
            stream,
            f"{base}/corpus",
            f"{base}/sigs",
            f"{base}/ckpt",
            auto_compact_max_dirs=24,
            corpus_compact_kw={
                "vacuum_keep_last": 8,
                "vacuum_min_age_s": 0.0,
            },
            sig_compact_kw={
                "cluster_by": "bb",
                "n_dirs": 16,
                "vacuum_keep_last": 8,
                "vacuum_min_age_s": 0.0,
            },
        )
    # writer stops FIRST, then the final drains so the expected-count
    # arithmetic sees a fully-processed backlog
    stop.set()
    t.join()  # no timeout: a still-alive writer appending after the
    # final drain would read as a false exactly-once failure
    assert not t.is_alive()
    q.awaitTermination()
    foreach_batch_ingest_dedup(
        stream,
        f"{base}/corpus",
        f"{base}/sigs",
        f"{base}/ckpt",
        auto_compact_max_dirs=24,
        corpus_compact_kw={"vacuum_keep_last": 8, "vacuum_min_age_s": 0.0},
        sig_compact_kw={
            "cluster_by": "bb",
            "n_dirs": 16,
            "vacuum_keep_last": 8,
            "vacuum_min_age_s": 0.0,
        },
    ).awaitTermination()

    corpus = TxTable(spark, f"{base}/corpus")
    sigs = TxTable(spark, f"{base}/sigs")
    waves = wave_n[0]
    got = corpus.read()
    got_docs = got.count()
    # self-calibrating expectation: the base slice may contain its own
    # near-dups (batch-internal greedy drops them identically every
    # wave), so measure wave-1's survivor count and require every
    # non-replay wave to contribute exactly that and every replay wave
    # exactly zero
    import pathlib

    # one grouped aggregate gives every wave's count (review r11: the
    # per-wave count-job form re-scanned the corpus once per wave)
    per_wave = {i: 0 for i in range(1, waves + 1)}
    for r in (
        got.groupBy(
            F.floor(F.col("doc_id") / F.lit(stride)).cast("int").alias("w")
        )
        .count()
        .collect()
    ):
        per_wave[int(r["w"])] = int(r["count"])
    s = per_wave[1]
    ok = all(
        (c == 0) if i % 3 == 0 else (c == s) for i, c in per_wave.items()
    )

    def du(p):
        return sum(
            f.stat().st_size for f in pathlib.Path(p).rglob("*") if f.is_file()
        )

    out = {
        "soak_seconds": seconds,
        "waves_written": waves,
        "runs": runs,
        "docs_per_wave": n_docs,
        "survivors_per_new_wave": s,
        "corpus_docs": got_docs,
        "exactly_once_and_dedup_ok": ok,
        "corpus_dirs": corpus.n_dirs(),
        "sig_dirs": sigs.n_dirs(),
        "corpus_versions_on_disk": len(corpus.history()),
        "corpus_disk_mb": round(du(f"{base}/corpus") / 1e6, 1),
        "sig_disk_mb": round(du(f"{base}/sigs") / 1e6, 1),
        "run_durations_s": durations[:40],
        # per-run corpus commits processed: duration/commits is the
        # steady per-tick cost (raw run durations grow with backlog
        # size, not tick latency — each loop run drains what queued
        # during the previous one)
        "run_corpus_commits": run_commits[:40],
        "s_per_commit_by_run": [
            round(d / c, 2) for d, c in zip(durations, run_commits) if c
        ][:40],
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


def soak_continuous_main(seconds: int) -> None:
    """ALWAYS-ON healer soak (r12, the continuous-trigger posture the
    r12 plan left open): ONE long-running processingTime healer query —
    no restart loop anywhere — polls the corpus commit log while a
    writer thread appends waves under vacuum pressure. Complements
    --soak-healer (which proves exactly-once COMPOSES across
    restart-resume runs); this proves the same machinery holds inside
    a single never-restarted query, the deployment most operators
    actually run.

    Claims after N wall-clock seconds: (a) exactly-once — healed ==
    one-shot over the final corpus; (b) liveness — the healer's
    committed position tracks the writer (lag samples bounded, drains
    to 0 after the writer stops) without any external driving; (c) the
    vacuum window held under the running query."""
    import glob
    import re as _re
    import shutil
    import tempfile
    import threading

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark
    from hapiy_etl_spark.streaming.jobs import heal_index_from_changes

    spark = get_spark("scale_growth_soak_cont")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull() & (F.col("doc_id") % 8 == 0))
    )
    stride = 8 * (int(docs.agg(F.max("doc_id")).first()[0]) // 8 + 1)
    base = tempfile.mkdtemp(prefix="healer_cont_")
    corpus_p, idx_p, ckpt = f"{base}/corpus", f"{base}/idx", f"{base}/ckpt"
    corpus = TxTable(spark, corpus_p)
    stop = threading.Event()
    wave_n = [0]
    keep_last = 20

    def writer() -> None:
        while not stop.is_set() and wave_n[0] < max(10, seconds // 2):
            i = wave_n[0] + 1
            corpus.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                    F.regexp_replace(
                        F.col("text"), F.lit(r"(\S+)"), F.lit(f"w{i}$1")
                    ).alias("text"),
                )
            )
            if i % 6 == 0:
                corpus.optimize()
                corpus.vacuum(keep_last=keep_last, min_age_s=0.0)
            wave_n[0] = i
            stop.wait(2.5)

    def healed_through() -> int | None:
        files = [
            p
            for p in glob.glob(f"{ckpt}/offsets/*")
            if _re.fullmatch(r"\d+", Path(p).name)
        ]
        if not files:
            return None
        latest = max(files, key=lambda p: int(Path(p).name))
        nums = _re.findall(r"\d+", Path(latest).read_text().splitlines()[-1])
        return int(nums[-1]) if nums else None

    # seed one wave so the stream has a schema-bearing table, then
    # start writer and the SINGLE always-on healer query
    wave_n[0] = 1
    corpus.append(docs.select("doc_id", "text"))
    t = threading.Thread(target=writer, daemon=True)
    t.start()
    q = heal_index_from_changes(
        spark,
        corpus_p,
        idx_p,
        ckpt,
        lambda b: TI.shingle_postings_build(b.select("doc_id", "text")),
        stats_cols=["tb"],
        extra_meta={"n_buckets": TI.N_BUCKETS},
        auto_compact_max_dirs=24,
        compact_kw={"cluster_by": "tb", "n_dirs": 12},
        max_versions_per_trigger=3,
        trigger_processing_time="2 seconds",
    )
    t0 = time.time()
    lag_samples = []
    try:
        while time.time() - t0 < seconds or t.is_alive():
            lag_samples.append(
                max(0, corpus.latest_version() - (healed_through() or 0))
            )
            if time.time() - t0 >= seconds and not stop.is_set():
                stop.set()
                t.join()
            time.sleep(2.0)
        # drain: the running query keeps firing on its own trigger
        deadline = time.time() + 120
        while time.time() < deadline and (
            (healed_through() or 0) < corpus.latest_version()
        ):
            time.sleep(2.0)
    finally:
        q.stop()

    idx = TxTable(spark, idx_p)

    def fingerprint(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(sorted(df.columns)) + "))"
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"] or 0)

    healed_fp = fingerprint(idx.read().select("doc_id", "shingle", "tb", "n_sh"))
    oneshot_fp = fingerprint(
        TI.shingle_postings_build(
            corpus.read().select("doc_id", "text")
        ).select("doc_id", "shingle", "tb", "n_sh")
    )
    out = {
        "soak_seconds": seconds,
        "mode": "continuous_processing_time_2s_single_query",
        "waves_written": wave_n[0],
        "healer_restarts": 0,
        "exactly_once_healed_equals_oneshot": healed_fp == oneshot_fp,
        "healed_rows": healed_fp[0],
        "max_lag_versions": max(lag_samples) if lag_samples else None,
        "final_lag_after_drain": max(
            0, corpus.latest_version() - (healed_through() or 0)
        ),
        "vacuum_keep_last": keep_last,
        "lag_stayed_inside_vacuum_window": (
            (max(lag_samples) if lag_samples else 0) < keep_last
        ),
        "lag_samples": lag_samples[:60],
        "corpus_dirs": corpus.n_dirs(),
        "idx_dirs": idx.n_dirs(),
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


def soak_erasure_main(seconds: int) -> None:
    """Erasure under the ALWAYS-ON healer (r13, VERDICT r12 item 6):
    writer thread appends waves under vacuum pressure while ONE
    continuous-trigger healer runs — then a right-to-be-forgotten
    takedown (`delete_keys`) lands on the corpus MID-RUN while both
    are live. The change feed hits the non-append commit and the
    healer dies with its loud not-representable error BY DESIGN
    (never a silent skip); the runbook then executes exactly as
    documented: `heal_recover_from_rewrite` (erase the victim's
    orphaned postings, backfill appends the dead healer missed) and a
    fresh-checkpoint restart at the returned snapshot_version. The
    writer never stops through any of this.

    Claims: (a) the loud-resync path fired exactly once, on the
    takedown commit; (b) exactly-once END-TO-END — after drain the
    healed index equals a one-shot build over the final post-takedown
    corpus (order-free fingerprint), with zero victim postings; (c)
    liveness resumes — the restarted healer drains the writer's
    backlog to lag 0."""
    import glob
    import re as _re
    import shutil
    import tempfile
    import threading

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark
    from hapiy_etl_spark.streaming.jobs import (
        heal_index_from_changes,
        heal_recover_from_rewrite,
    )

    spark = get_spark("scale_growth_soak_erasure")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull() & (F.col("doc_id") % 8 == 0))
    )
    stride = 8 * (int(docs.agg(F.max("doc_id")).first()[0]) // 8 + 1)
    base = tempfile.mkdtemp(prefix="healer_erasure_")
    corpus_p, idx_p = f"{base}/corpus", f"{base}/idx"
    ckpt1, ckpt2 = f"{base}/ckpt1", f"{base}/ckpt2"
    corpus = TxTable(spark, corpus_p)
    stop = threading.Event()
    wave_n = [0]
    keep_last = 20
    build = lambda b: TI.shingle_postings_build(b.select("doc_id", "text"))

    def writer() -> None:
        while not stop.is_set() and wave_n[0] < max(10, seconds // 2):
            i = wave_n[0] + 1
            corpus.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                    F.regexp_replace(
                        F.col("text"), F.lit(r"(\S+)"), F.lit(f"w{i}$1")
                    ).alias("text"),
                ),
                stats_cols=["doc_id"],
                bloom_cols=["doc_id"],
            )
            wave_n[0] = i
            stop.wait(2.5)

    def healed_through(ckpt: str) -> int | None:
        files = [
            p
            for p in glob.glob(f"{ckpt}/offsets/*")
            if _re.fullmatch(r"\d+", Path(p).name)
        ]
        if not files:
            return None
        latest = max(files, key=lambda p: int(Path(p).name))
        nums = _re.findall(r"\d+", Path(latest).read_text().splitlines()[-1])
        return int(nums[-1]) if nums else None

    def start_healer(ckpt: str, starting_version: int | None = None):
        return heal_index_from_changes(
            spark,
            corpus_p,
            idx_p,
            ckpt,
            build,
            stats_cols=["tb"],
            extra_meta={"n_buckets": TI.N_BUCKETS},
            max_versions_per_trigger=3,
            trigger_processing_time="2 seconds",
            starting_version=starting_version,
        )

    wave_n[0] = 1
    corpus.append(
        docs.select("doc_id", "text"), stats_cols=["doc_id"], bloom_cols=["doc_id"]
    )
    victim = int(docs.agg(F.min("doc_id")).first()[0])
    t = threading.Thread(target=writer, daemon=True)
    t.start()
    q = start_healer(ckpt1)
    t0 = time.time()
    takedown_at = seconds * 0.4
    events = []
    loud_error = None
    recovery = None
    try:
        # phase 1: healthy co-run, then the mid-run takedown
        while time.time() - t0 < takedown_at:
            time.sleep(1.0)
        v_take = corpus.delete_keys([victim], on="doc_id")
        events.append(("takedown_commit", v_take))
        # phase 2: the healer MUST die loudly when its feed crosses the
        # delete commit (it may first drain pending appends)
        deadline = time.time() + 90
        while q.isActive and time.time() < deadline:
            time.sleep(1.0)
        if q.isActive:
            raise AssertionError("healer survived a delete span — resync contract broken")
        loud_error = str(q.exception())
        assert _re.search(r"rewr|resync|table_diff", loud_error), loud_error
        # phase 3: the runbook — resync from contents, restart fresh
        recovery = heal_recover_from_rewrite(
            spark, corpus_p, idx_p, on="doc_id", build_fn=build,
            stats_cols=["tb"], bloom_cols=["doc_id"],
            extra_meta={"n_buckets": TI.N_BUCKETS},
        )
        q = start_healer(ckpt2, starting_version=recovery["snapshot_version"])
        # phase 4: run out the clock, stop writer, drain
        while time.time() - t0 < seconds:
            time.sleep(1.0)
        stop.set()
        t.join()
        deadline = time.time() + 120
        while time.time() < deadline and (
            (healed_through(ckpt2) or 0) < corpus.latest_version()
        ):
            time.sleep(2.0)
    finally:
        stop.set()
        if q.isActive:
            q.stop()

    idx = TxTable(spark, idx_p)

    def fingerprint(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.expr(
                "bit_xor(xxhash64(" + ", ".join(sorted(df.columns)) + "))"
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"] or 0)

    cols = ["doc_id", "shingle", "tb", "n_sh"]
    healed_fp = fingerprint(idx.read().select(*cols))
    oneshot_fp = fingerprint(build(corpus.read()).select(*cols))
    victim_postings = idx.read().where(F.col("doc_id") == victim).count()
    out = {
        "soak_seconds": seconds,
        "mode": "always_on_healer_with_midrun_erasure",
        "waves_written": wave_n[0],
        "loud_resync_fired_once": bool(
            loud_error and _re.search(r"rewr|resync|table_dif" + "f", loud_error)
        ),
        "recovery": recovery,
        "exactly_once_healed_equals_oneshot": healed_fp == oneshot_fp,
        "healed_rows": healed_fp[0],
        "victim_postings_after": victim_postings,
        "final_lag_after_drain": max(
            0, corpus.latest_version() - (healed_through(ckpt2) or 0)
        ),
        "corpus_dirs": corpus.n_dirs(),
        "idx_dirs": idx.n_dirs(),
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


def phashcap_main(n: int) -> None:
    """Hot-signature cap growth (r13, VERDICT r12 'What's wrong' #2):
    the perceptual corpus is x replicated copies of the documents
    payloads PLUS a degenerate constant-payload cluster that grows
    with x (60x black frames — the real-corpus failure mode: intro
    slates, empty thumbnails). Candidate volume through the banded
    self-join is measured with the default key_cap=200 and uncapped:
    uncapped, the hot bucket alone contributes C(60x, 2) pairs —
    quadratic in growth; capped, the cluster drops at the band stage
    and total candidates track the REAL near-dup structure (the x
    byte-identical replicas of each doc), while planted same-length
    perturbation pairs keep full recall at every x."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.multimodal import (
        attach_binary_payload,
        phash_near_dup_pairs,
    )
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_phashcap")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .where(F.col("text").isNotNull() & (F.col("doc_id") % 16 == 0))
        .select("doc_id", "text")
    )
    base_n = docs.count()
    span = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    tmp = tempfile.mkdtemp(prefix="phashcap_")
    rows = []
    for x in (1, 2, 4, max(8, n)):
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * span)).alias("doc_id"), "text"
            )
            for i in range(x)
        ]
        corpus = parts[0]
        for pdf in parts[1:]:
            corpus = corpus.unionAll(pdf)
        corpus = attach_binary_payload(corpus, "text")
        hot = spark.range(60 * x).select(
            (F.col("id") + F.lit(10_000_000)).alias("doc_id"),
            F.lit(b"\x00" * 600).alias("payload"),
        )
        full = corpus.select("doc_id", "payload").unionAll(hot)
        full.write.mode("overwrite").parquet(f"{tmp}/c{x}")
        stored = spark.read.parquet(f"{tmp}/c{x}")
        t0 = time.perf_counter()
        capped = phash_near_dup_pairs(stored, "doc_id", max_hamming=3)
        n_capped = capped.count()
        hot_capped = capped.where(
            (F.col("id_a") >= 10_000_000) & (F.col("id_b") >= 10_000_000)
        ).count()
        t_capped = time.perf_counter() - t0
        t0 = time.perf_counter()
        uncapped = phash_near_dup_pairs(
            stored, "doc_id", max_hamming=3, key_cap=None
        )
        n_uncapped = uncapped.count()
        t_uncapped = time.perf_counter() - t0
        rows.append(
            {
                "x": x,
                "docs": base_n * x,
                "hot_cluster": 60 * x,
                "pairs_capped": n_capped,
                "hot_pairs_capped": hot_capped,
                "pairs_uncapped": n_uncapped,
                "hot_pairs_expected_uncapped": (60 * x) * (60 * x - 1) // 2,
                "s_capped": round(t_capped, 2),
                "s_uncapped": round(t_uncapped, 2),
            }
        )
        print(rows[-1], flush=True)
    print("# summary")
    for r in rows:
        print(r)
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def soak_healer_main(seconds: int) -> None:
    """Decoupled-healer soak (r12, VERDICT r11 item 6): one thread
    appends corpus waves as PLAIN TxTable appends (the ingest job —
    no index logic anywhere near it) while a LAGGING healer drains the
    change feed in looped restart-resume runs with
    maxVersionsPerTrigger=3 (the Python DataSourceStreamReader
    delivers one batch per run, so a loop of runs IS the periodic
    trigger; every iteration re-opens the same engine checkpoint —
    exactly-once must compose across the restarts). The healer starts
    LATE (after 6 waves exist) to exercise bounded catch-up, and the
    writer applies VACUUM PRESSURE (optimize + vacuum keep_last=20
    every 6 waves, min_age_s=0) sized above the healer's observed lag
    (the first trial sized it at 12 against the late start and
    the source's loud vacuumed-offset resync error fired exactly as
    documented — the failure mode the retention contract exists for).

    Claims after N wall-clock seconds: (a) exactly-once through every
    restart — the healed index equals a ONE-SHOT build over the final
    corpus (row count + order-free xxhash64 checksum); (b) catch-up
    bounded — no run's drained span exceeds maxVersionsPerTrigger data
    versions, and the lag trajectory (read from the checkpoint's
    offset files) descends to zero after the writer stops; (c) the
    vacuum window held — max observed lag stays under keep_last, so
    the loud resync error never fires while superseded corpus data is
    reclaimed underneath the running healer."""
    import glob
    import re as _re
    import shutil
    import tempfile
    import threading

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark
    from hapiy_etl_spark.streaming.jobs import heal_index_from_changes

    spark = get_spark("scale_growth_soak_healer")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("text").isNotNull() & (F.col("doc_id") % 8 == 0))
    )
    stride = 8 * (int(docs.agg(F.max("doc_id")).first()[0]) // 8 + 1)
    base = tempfile.mkdtemp(prefix="healer_soak_")
    corpus_p, idx_p, ckpt = f"{base}/corpus", f"{base}/idx", f"{base}/ckpt"
    corpus = TxTable(spark, corpus_p)
    stop = threading.Event()
    wave_n = [0]
    keep_last = 20

    def writer() -> None:
        while not stop.is_set() and wave_n[0] < max(10, seconds // 2):
            i = wave_n[0] + 1
            corpus.append(
                docs.select(
                    (F.col("doc_id") + F.lit(i * stride)).alias("doc_id"),
                    F.regexp_replace(
                        F.col("text"), F.lit(r"(\S+)"), F.lit(f"w{i}$1")
                    ).alias("text"),
                )
            )
            if i % 6 == 0:
                # vacuum pressure: superseded dirs reclaimed while the
                # healer lags — window sized above its observed lag
                corpus.optimize()
                corpus.vacuum(keep_last=keep_last, min_age_s=0.0)
            wave_n[0] = i
            stop.wait(2.5)

    def healed_through() -> int | None:
        # the healer's own committed position: newest engine-checkpoint
        # offset file (a JSON carrying the change-feed snapshot version)
        files = [
            p
            for p in glob.glob(f"{ckpt}/offsets/*")
            if _re.fullmatch(r"\d+", Path(p).name)
        ]
        if not files:
            return None
        latest = max(files, key=lambda p: int(Path(p).name))
        nums = _re.findall(r"\d+", Path(latest).read_text().splitlines()[-1])
        return int(nums[-1]) if nums else None

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    # LATE start: let a backlog build so the first runs are catch-up
    while wave_n[0] < 6 and t.is_alive():
        time.sleep(0.5)

    def one_run():
        return heal_index_from_changes(
            spark,
            corpus_p,
            idx_p,
            ckpt,
            lambda b: TI.shingle_postings_build(b.select("doc_id", "text")),
            stats_cols=["tb"],
            extra_meta={"n_buckets": TI.N_BUCKETS},
            auto_compact_max_dirs=24,
            compact_kw={"cluster_by": "tb", "n_dirs": 12},
            max_versions_per_trigger=3,
        )

    t0 = time.time()
    runs = []
    max_lag = 0
    while True:
        v_corpus = corpus.latest_version()
        pos = healed_through() or 0
        lag = max(0, v_corpus - pos)
        max_lag = max(max_lag, lag)
        tq0 = time.time()
        one_run().awaitTermination()
        runs.append(
            {
                "corpus_v": v_corpus,
                "healed_from": pos,
                "lag_before": lag,
                "dur_s": round(time.time() - tq0, 2),
            }
        )
        if time.time() - t0 >= seconds and stop.is_set() is False:
            stop.set()
            t.join()
        if stop.is_set() and not t.is_alive():
            # drain: done when the healer's position reaches the corpus
            if (healed_through() or 0) >= corpus.latest_version():
                break
        if len(runs) > 400:  # backstop against a wedged drain
            break

    idx = TxTable(spark, idx_p)

    def fingerprint(df):
        row = df.agg(
            F.count("*").alias("n"),
            # bit_xor: order-free AND overflow-free (ANSI sum of longs
            # overflows) — row multiset equality is what's claimed
            F.expr(
                "bit_xor(xxhash64("
                + ", ".join(sorted(df.columns))
                + "))"
            ).alias("h"),
        ).first()
        return int(row["n"]), int(row["h"] or 0)

    healed_fp = fingerprint(idx.read().select("doc_id", "shingle", "tb", "n_sh"))
    oneshot_fp = fingerprint(
        TI.shingle_postings_build(
            corpus.read().select("doc_id", "text")
        ).select("doc_id", "shingle", "tb", "n_sh")
    )
    lags = [r["lag_before"] for r in runs]
    out = {
        "soak_seconds": seconds,
        "waves_written": wave_n[0],
        "healer_runs": len(runs),
        "exactly_once_healed_equals_oneshot": healed_fp == oneshot_fp,
        "healed_rows": healed_fp[0],
        "max_lag_versions": max_lag,
        "vacuum_keep_last": keep_last,
        "lag_stayed_inside_vacuum_window": max_lag < keep_last,
        # lags[] entries are measured BEFORE each run (r12 review: the
        # raw lags[-1] used to be reported as 'final lag', misreading
        # a successful drain as residual); the honest residual is
        # measured fresh AFTER the loop exits — 0 on a clean drain,
        # nonzero only if the 400-run backstop fired
        "final_lag_after_drain": max(
            0, corpus.latest_version() - (healed_through() or 0)
        ),
        "final_run_predrain_lag": lags[-1] if lags else None,
        "corpus_versions_on_disk": len(corpus.history()),
        "corpus_dirs": corpus.n_dirs(),
        "idx_dirs": idx.n_dirs(),
        "run_lag_trajectory": lags[:60],
        "run_durations_s": [r["dur_s"] for r in runs][:60],
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


def erasure_main(n_batches: int, retighten: bool = False) -> None:
    """Right-to-be-forgotten growth: land n disjoint id-shifted copies
    of the documents corpus (doc_id stats + blooms per dir) plus a
    shingle-postings index with per-dir doc-id blooms, then erase ONE
    fixed document (from the first batch) via delete_keys after each
    append. The scale claim: dirs REWRITTEN per takedown stays ~1 on
    the corpus (id-range stats) and bounded by the victim's bucket
    count on the index (doc-id blooms) while the table grows nx — an
    unpruned erasure would rewrite all dirs every time.

    ``retighten`` (r13): after each takedown, run the fpr-keyed
    ``retighten_blooms`` maintenance on both tables and record how
    many dirs it re-tightened plus the post-maintenance max FPR
    estimate — the evidence that the 1↔9 rewrite bounce (superset
    union blooms accumulating false positives) decays once the
    trigger runs. Compare the index_dirs_rewritten column with and
    without the flag."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("scale_growth_erasure")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    base = tempfile.mkdtemp(prefix="erasure_growth_")
    corpus = TxTable(spark, f"{base}/corpus")
    idx = TxTable(spark, f"{base}/idx")
    rows = []
    for i in range(1, n_batches + 1):
        batch = docs.withColumn("doc_id", F.col("doc_id") + F.lit((i - 1) * span))
        corpus.append(batch, stats_cols=["doc_id"], bloom_cols=["doc_id"])
        TI.postings_append(
            idx, None, TI.shingle_postings_build(batch), None, bloom_key="doc_id"
        )
        # victims live in the FIRST batch — the worst case for growth
        # (every later dir must be proven clean, not skipped by luck)
        victim = [int(i)]  # a fresh id each round: erasures must commit
        cv0, iv0 = corpus.latest_version(), idx.latest_version()
        c_dirs0 = set(corpus._manifest(cv0)["dirs"])
        i_dirs0 = set(idx._manifest(iv0)["dirs"])
        t0 = time.perf_counter()
        corpus.delete_keys(victim, on="doc_id")
        idx.delete_keys(victim, on="doc_id")
        dt = time.perf_counter() - t0
        c_rw = len(c_dirs0 - set(corpus._manifest(corpus.latest_version())["dirs"]))
        i_rw = len(i_dirs0 - set(idx._manifest(idx.latest_version())["dirs"]))
        row = {
            "x": i,
            "corpus_dirs": len(c_dirs0),
            "corpus_dirs_rewritten": c_rw,
            "index_dirs": len(i_dirs0),
            "index_dirs_rewritten": i_rw,
            "erase_s": round(dt, 2),
        }
        if retighten:
            t1 = time.perf_counter()
            fixed = len(corpus.retighten_blooms(["doc_id"])) + len(
                idx.retighten_blooms(["doc_id"])
            )
            ests = list(corpus.bloom_fpr_estimates("doc_id").values()) + list(
                idx.bloom_fpr_estimates("doc_id").values()
            )
            row["retightened_dirs"] = fixed
            row["max_fpr_est"] = round(max(ests), 4) if ests else 0.0
            row["retighten_s"] = round(time.perf_counter() - t1, 2)
        rows.append(row)
        print(rows[-1], flush=True)
    # REPEATED-takedown phase (r13): growth stops; n_batches more
    # victims erased back-to-back. This isolates the bounce from the
    # genuine first-erasure bucket spread: once the victim batch's
    # postings are coalesced, every further rewrite beyond 1 dir is a
    # false positive off accumulated union blooms — with the fpr-keyed
    # retighten after each takedown, rewritten dirs must TREND TO 1.
    print("# repeated takedowns (no growth)")
    for j in range(1, n_batches + 1):
        victim = [int(100 + j)]
        cv0, iv0 = corpus.latest_version(), idx.latest_version()
        c_dirs0 = set(corpus._manifest(cv0)["dirs"])
        i_dirs0 = set(idx._manifest(iv0)["dirs"])
        t0 = time.perf_counter()
        corpus.delete_keys(victim, on="doc_id")
        idx.delete_keys(victim, on="doc_id")
        dt = time.perf_counter() - t0
        row = {
            "takedown": j,
            "corpus_dirs_rewritten": len(
                c_dirs0 - set(corpus._manifest(corpus.latest_version())["dirs"])
            ),
            "index_dirs_rewritten": len(
                i_dirs0 - set(idx._manifest(idx.latest_version())["dirs"])
            ),
            "erase_s": round(dt, 2),
        }
        if retighten:
            fixed = len(corpus.retighten_blooms(["doc_id"])) + len(
                idx.retighten_blooms(["doc_id"])
            )
            ests = list(corpus.bloom_fpr_estimates("doc_id").values()) + list(
                idx.bloom_fpr_estimates("doc_id").values()
            )
            row["retightened_dirs"] = fixed
            row["max_fpr_est"] = round(max(ests), 4) if ests else 0.0
        rows.append(row)
        print(rows[-1], flush=True)
    print("# summary")
    for r in rows:
        print(r)
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


def main() -> None:
    from hapiy_etl_spark.operators import dedup as D
    from hapiy_etl_spark.session import get_spark

    args = sys.argv[1:]
    if args and args[0] == "--erasure":
        erasure_main(
            int(args[1]) if args[1:] else 6,
            retighten="retighten" in args[2:],
        )
        return
    if args and args[0] == "--soak":
        soak_main(int(args[1]) if args[1:] else 60)
        return
    if args and args[0] == "--soak-healer":
        soak_healer_main(int(args[1]) if args[1:] else 60)
        return
    if args and args[0] == "--soak-continuous":
        soak_continuous_main(int(args[1]) if args[1:] else 60)
        return
    if args and args[0] == "--soak-erasure":
        soak_erasure_main(int(args[1]) if args[1:] else 60)
        return
    if args and args[0] == "--phashcap":
        phashcap_main(int(args[1]) if args[1:] else 8)
        return
    if args and args[0] == "--mv":
        mv_main(int(args[1]) if args[1:] else 8)
        return
    if args and args[0] == "--stats":
        stats_main(int(args[1]) if args[1:] else 8)
        return
    if args and args[0] == "--joinmv":
        joinmv_main(int(args[1]) if args[1:] else 8)
        return
    if args and args[0] == "--textindex":
        textindex_main(int(args[1]) if args[1:] else 6)
        return
    if args and args[0] == "--streamdedup":
        streamdedup_main(int(args[1]) if args[1:] else 6)
        return
    if args and args[0] == "--mergeprune":
        mergeprune_main(int(args[1]) if args[1:] else 8)
        return
    if args and args[0] == "--bloom":
        bloom_main(int(args[1]) if args[1:] else 8)
        sys.exit(0)
    if args and args[0] == "--batchfetch":
        batchfetch_main(int(args[1]) if args[1:] else 8)
        return
    if args and args[0] == "--mergebloom":
        mergebloom_main(int(args[1]) if args[1:] else 8)
        return
    if args and args[0] == "--optclustered":
        optclustered_main(int(args[1]) if args[1:] else 0)
        return
    if args and args[0] == "--zorder":
        zorder_main(int(args[1]) if args[1:] else 0)
        return
    if args and args[0] == "--graph":
        graph_main([int(a) for a in args[1:]] or [1, 2, 4])
        return
    if args and args[0] == "--skew":
        skew_main([int(a) for a in args[1:]] or [1, 8])
        return
    if args and args[0] == "--pq":
        pq_main([int(a) for a in args[1:]] or [1, 8])
        return
    ks = [int(a) for a in args] or [1, 2, 4, 8]
    spark = get_spark("scale_growth")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    ops = {
        "jaccard_capped": lambda d: D.jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5, df_cap=100
        ),
        "minhash_native": lambda d: D.minhash_native_pairs(
            d, "doc_id", "text", n=3, jaccard_threshold=0.5
        ),
        "simhash": lambda d: D.simhash_pairs(d, "doc_id", "text", max_hamming=3),
        "exact_substring": lambda d: D.shared_span_pairs(
            d, "doc_id", "text", k=10, min_span_tokens=12, df_cap=200
        ),
        "cluster_assign": lambda d: D.dedup_clusters(
            D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, df_cap=100),
            rounds=4,
            checkpoint_every=2,
        ),
    }

    results: dict[str, dict[str, dict[str, float]]] = {}
    for k in ks:
        docs = replicated(base, k).cache()
        n_docs = docs.count()
        for name, fn in ops.items():
            t0 = time.time()
            n_out = fn(docs).count()
            dt = round(time.time() - t0, 2)
            results.setdefault(name, {})[f"x{k}"] = {"sec": dt, "rows": n_out}
            print(f"x{k} ({n_docs} docs) {name}: {dt}s {n_out} rows", flush=True)
        docs.unpersist()
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
