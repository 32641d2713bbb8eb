"""Materialized-once persisted-index fixtures shared across probe
queries (VERDICT r9 item 7, bench hygiene).

The persisted-index probe queries (`text_bm25_index_probe`,
`text_decontam_index_probe`, `ann_ivf_index_probe`) each demonstrate
the same production posture: build/append the index ONCE, probe it
forever. Building the index inside every timed query charged ~4-6 s of
pure scenario setup to each — exactly the position-dependence the
near-dup cluster artifact solved in r5 (queries/text.py:_NEARDUP_CACHE)
— so the builds live here as session-cached artifacts: computed once
per (application, sf_dir), rebuilt untimed by bench.py's per-rep
prewarm, probe cost stays the timed number.

Only IMMUTABLE-use fixtures belong here: every consumer must treat the
returned tables as read-only (a query that appends to its index as part
of its own demo — `dedup_incremental_index`, `semdedup_incremental` —
keeps building its own). Layouts are bit-identical to the builds the
queries previously inlined, so their in-query dir-pruning asserts and
DuckDB twins are unchanged.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CACHE: dict[tuple, object] = {}


def _base(spark: SparkSession, sf_dir: str, name: str) -> str:
    import hashlib

    # the FULL sf_dir is hashed into the disk path (review r10): the
    # cache keys on the full path, so basename-only disk naming would
    # let two corpora with the same basename alias one on-disk fixture
    # and silently serve each other's data
    tag = hashlib.md5(str(sf_dir).encode()).hexdigest()[:8]
    return str(
        Path(tempfile.gettempdir())
        / f"spark_graft_{name}_fixture_{spark.sparkContext.applicationId}"
        f"_{Path(sf_dir).name}_{tag}"
    )


def index_fixtures_clear() -> None:
    """Drop the cached index artifacts (bench per-rep isolation /
    re-derivation after data changes). On-disk tables are removed so
    the next builder call starts from scratch — which also invalidates
    the recorded-stamp memo (review r11: a rebuild at the same path to
    the same version count could otherwise serve a stale geometry)."""
    from hapiy_etl_spark.operators.textindex import stamp_cache_clear

    stamp_cache_clear()
    for val in _CACHE.values():
        for item in val if isinstance(val, tuple) else (val,):
            if isinstance(item, str):
                shutil.rmtree(item, ignore_errors=True)
            elif isinstance(item, DataFrame):
                try:
                    item.unpersist()
                except Exception:
                    pass  # session may already be stopped
    _CACHE.clear()


def bm25_index(spark: SparkSession, sf_dir: str):
    """(postings TxTable, meta TxTable) over the documents corpus:
    history slice (doc_id % 4 != 3) landed one dir per term-bucket,
    later batch (% 4 == 3) appended as one mixed dir — the exact
    two-phase layout text_bm25_index_probe previously built inline."""
    key = ("bm25", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    history = docs.where(F.pmod("doc_id", F.lit(4)) != 3)
    batch = docs.where(F.pmod("doc_id", F.lit(4)) == 3)
    base = _base(spark, sf_dir, "bm25idx")
    shutil.rmtree(base, ignore_errors=True)
    idx = TxTable(spark, f"{base}/postings")
    meta_t = TxTable(spark, f"{base}/meta")
    hp, hm = TI.postings_build(history)
    TI.postings_append(idx, meta_t, hp, hm)  # one dir per bucket
    bp, bm = TI.postings_build(batch)
    # incremental append: one mixed dir, re-clustered at next OPTIMIZE
    TI.postings_append(idx, meta_t, bp, bm, split_buckets=False)
    _CACHE[key] = (idx, meta_t, base)
    return idx, meta_t


def shingle_index(spark: SparkSession, sf_dir: str):
    """Shingle-postings TxTable over the TRAIN corpus (doc_id >= 50):
    history split-bucketed, batch as one mixed dir — the exact layout
    text_decontam_index_probe previously built inline."""
    key = ("shingle", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0]
    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    train = docs.where(F.col("doc_id") >= 50)
    history = train.where(F.pmod("doc_id", F.lit(4)) != 3)
    batch = train.where(F.pmod("doc_id", F.lit(4)) == 3)
    base = _base(spark, sf_dir, "shingleidx")
    shutil.rmtree(base, ignore_errors=True)
    idx = TxTable(spark, f"{base}/shingle_postings")
    TI.postings_append(idx, None, TI.shingle_postings_build(history), None)
    TI.postings_append(
        idx, None, TI.shingle_postings_build(batch), None, split_buckets=False
    )
    _CACHE[key] = (idx, base)
    return idx


def ivf_index(spark: SparkSession, sf_dir: str):
    """(centroids DataFrame, inverted-file TxTable): quantizer trained
    once on the history slice (vec_id % 4 != 3), one dir per cell with
    cell stats, the remaining vectors batch-assigned (no retraining)
    and appended as one mixed dir — the exact layout
    ann_ivf_index_probe previously built inline (n_centroids=4)."""
    key = ("ivf", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import similarity as S
    from hapiy_etl_spark.operators.txstore import TxTable

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    history = emb.where(F.pmod("vec_id", F.lit(4)) != 3)
    batch = emb.where(F.pmod("vec_id", F.lit(4)) == 3)
    n_centroids = 4
    cent, assigned = S.ivf_index_build(
        history, "vec_id", n_centroids=n_centroids, train_fraction=0.5,
        max_iter=2,  # exact regime: probe-all is brute force regardless
        # of quantizer quality, so spend the minimum on Lloyd
    )
    base = _base(spark, sf_dir, "ivfidx")
    shutil.rmtree(base, ignore_errors=True)
    idx = TxTable(spark, f"{base}/idx")
    for c in range(n_centroids):  # one dir per cell: tight cell stats
        idx.append(assigned.where(F.col("cell") == c), stats_cols=["cell"])
    # incremental append: later vectors join the index with NO retraining
    idx.append(S.ivf_index_assign(cent, batch, "vec_id"), stats_cols=["cell"])
    cent = cent.cache()
    cent.count()
    _CACHE[key] = (cent, idx, base)
    return cent, idx


def ann_audit_artifacts(spark: SparkSession, sf_dir: str):
    """Shared training artifacts for ann_recall_audit's arms (r14,
    VERDICT r13 item 4): ONE IVF build (8 cells, the audit geometry)
    reused by the ivf and ivfpq arms, ONE raw-vector PQ codebook
    training (16x256, the sweep knee) shared by the pq and pq_rerank
    arms, ONE residual codebook training shared by the ivfpq arms —
    previously each arm re-ran Lloyd over the same corpus sample,
    making the audit the heaviest registered query (r13: 9-10.6 s).
    Returns (centroids DF [cached], assigned DF [checkpointed],
    pq_books ndarray, resid_books ndarray). Production posture: these
    ARE the persisted index artifacts a deployment trains once and
    audits forever."""
    key = ("ann_audit", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit
    import numpy as np

    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import similarity as S
    from hapiy_etl_spark.operators.similarity import (
        _pq_codebooks,
        _pq_training_sample,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    cent, assigned = S.ivf_index_build(
        emb, "vec_id", n_centroids=8, train_fraction=0.5
    )
    cent = cent.cache()
    cent.count()
    # eager checkpoint: every arm re-reads the assignment; without it
    # each probe re-runs the KMeans transform through lineage
    assigned = assigned.localCheckpoint(eager=True)
    pq_sample = _pq_training_sample(emb, "vec_id", "embedding", 10_000, 0.5, 42)
    pq_books = _pq_codebooks(np.array(pq_sample, dtype=np.float64), 16, 256, 42)
    resid = assigned.join(F.broadcast(cent), "cell").select(
        "vec_id",
        F.zip_with(
            F.col("embedding").cast("array<double>"),
            "centroid",
            lambda x, c: x - c,
        ).alias("__resid"),
    )
    r_sample = _pq_training_sample(resid, "vec_id", "__resid", 10_000, 0.5, 42)
    resid_books = _pq_codebooks(np.array(r_sample, dtype=np.float64), 16, 256, 42)
    _CACHE[key] = (cent, assigned, pq_books, resid_books)
    return _CACHE[key]


def pq_index(spark: SparkSession, sf_dir: str):
    """(codebooks ndarray, codes TxTable) over the exact-regime slice
    (vec_id < 200): codebooks train once on the WHOLE slice
    (n_codes=256 >= slice size — lossless, so the probe query's DuckDB
    brute-force twin pins the persisted-codes path bit-for-bit);
    history codes (vec_id % 4 != 3) land as one append, the remaining
    vectors ENCODE INCREMENTALLY against the stored codebooks
    (pq_index_assign, no retraining) and append as a second dir — the
    ivf_index build/append posture for the compressed-codes family."""
    key = ("pqidx", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import similarity as S
    from hapiy_etl_spark.operators.txstore import TxTable

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].where(
        F.col("vec_id") < 200
    )
    history = emb.where(F.pmod("vec_id", F.lit(4)) != 3)
    batch = emb.where(F.pmod("vec_id", F.lit(4)) == 3)
    books, _ = S.pq_index_build(
        # train on the whole slice (the exact regime needs every vector
        # as its own codeword) but encode only history here
        emb, "vec_id", m=8, n_codes=256, train_fraction=1.0,
    )
    base = _base(spark, sf_dir, "pqidx")
    shutil.rmtree(base, ignore_errors=True)
    idx = TxTable(spark, f"{base}/codes")
    idx.append(
        S.pq_index_assign(books, history, "vec_id"), stats_cols=["vec_id"]
    )
    # incremental append: later vectors encode against the STORED
    # codebooks — no retraining, no touch of existing code rows
    idx.append(
        S.pq_index_assign(books, batch, "vec_id"), stats_cols=["vec_id"]
    )
    _CACHE[key] = (books, idx, base)
    return books, idx


def ivfpq_index(spark: SparkSession, sf_dir: str):
    """(centroids DataFrame, residual codebooks ndarray, codes TxTable)
    over the exact-regime slice (vec_id < 200) — the PERSISTED IVFADC
    composition (r15, VERDICT r14 item 3): coarse quantizer trained
    ONCE on the history slice (vec_id % 4 != 3, frozen), residual
    codebooks trained on the FULL slice's residuals under that frozen
    quantizer (n_codes=256 >= slice size — every residual its own
    codeword, lossless, so the probe query's DuckDB brute-force twin
    pins the whole persisted path bit-for-bit); history residual codes
    land one dir per cell with cell stats (where_in probes prune to
    dirs), the remaining vectors arrive later as a BATCH through
    ivfpq_index_assign — assigned to the existing centroids and
    encoded against the existing codebooks, NO retraining — appended
    as one mixed dir. Raw vectors are never stored in the index."""
    key = ("ivfpqidx", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1], hit[2]
    import numpy as np

    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import similarity as S
    from hapiy_etl_spark.operators.txstore import TxTable

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].where(
        F.col("vec_id") < 200
    )
    history = emb.where(F.pmod("vec_id", F.lit(4)) != 3)
    batch = emb.where(F.pmod("vec_id", F.lit(4)) == 3)
    n_centroids = 4
    cent, assigned = S.ivf_index_build(
        history, "vec_id", n_centroids=n_centroids, train_fraction=0.5,
        max_iter=2,  # exact regime: probe-all is brute force regardless
        # of quantizer quality, so spend the minimum on Lloyd
    )
    cent = cent.cache()
    cent.count()
    # eager checkpoint: training, the per-cell appends, and the batch
    # assign all re-read the assignment — without it each job re-runs
    # the KMeans transform through lineage (the ann_audit_artifacts
    # lesson)
    assigned = assigned.localCheckpoint(eager=True)
    # exact regime needs EVERY residual (incl. the later batch's, which
    # the frozen quantizer will place via ivf_index_assign) in the
    # codebook training set
    all_assigned = assigned.unionByName(
        S.ivf_index_assign(cent, batch, "vec_id")
    )
    resid_all = S.residual_transform(all_assigned, cent, "vec_id")
    sample_rows = S._pq_training_sample(
        resid_all, "vec_id", "__resid", 10_000, 1.0, 42
    )
    books = S._pq_codebooks(
        np.array(sample_rows, dtype=np.float64), 8, 256, 42
    )
    base = _base(spark, sf_dir, "ivfpqidx")
    shutil.rmtree(base, ignore_errors=True)
    idx = TxTable(spark, f"{base}/codes")
    hist_codes = S.pq_index_assign(
        books,
        S.residual_transform(assigned, cent, "vec_id"),
        "vec_id",
        vec="__resid",
        passthrough=["cell"],
    ).localCheckpoint(eager=True)  # encode ONCE, not once per cell dir
    for c in range(n_centroids):  # one dir per cell: tight cell stats
        idx.append(hist_codes.where(F.col("cell") == c), stats_cols=["cell"])
    # incremental append: later vectors assign to the frozen quantizer
    # and encode against the stored codebooks — no retraining
    idx.append(
        S.ivfpq_index_assign(cent, books, batch, "vec_id"),
        stats_cols=["cell"],
    )
    _CACHE[key] = (cent, books, idx, base)
    return cent, books, idx


def flagship_state(spark: SparkSession, sf_dir: str):
    """(corpus TxTable, mv TxTable, shingle-index TxTable): the full
    production topology of flagship_pipeline_e2e, materialized once per
    session — two ordered micro-batches through the online-dedup sink
    body (exactly-once corpus + band-postings commits, policy
    compaction with retention), per-epoch incremental-MV partials from
    the batch change feed (the epoch-2 span crosses the corpus OPTIMIZE
    and takes the keyed fallback), and a shingle-postings index HEALED
    from the corpus change feed by a decoupled streaming job added
    after ingest finished. Immutable-use: the query only reads the
    audit frame off these tables; every build step is deterministic in
    the corpus, so rep 1's tables equal rep N's."""
    key = ("flagship", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1], hit[2]
    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.streaming.jobs import (
        heal_index_from_changes,
        ingest_dedup_batch,
    )

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = _base(spark, sf_dir, "flagship")
    shutil.rmtree(base, ignore_errors=True)
    corpus_p, sig_p = f"{base}/corpus", f"{base}/sigs"
    mv_p, idx_p = f"{base}/mv", f"{base}/idx"

    corpus_t = TxTable(spark, corpus_p)
    mv_t = TxTable(spark, mv_p)

    def mv_partial(survivors):
        # the survivors frame IS the epoch's corpus change set, so the
        # per-source MV partial can ride the SAME atomic group record
        # as the corpus and index appends (r15, VERDICT r14 item 8 —
        # no crash window between the corpus and ANY derived table;
        # the change-feed-driven MV variant, incl. the keyed fallback
        # across OPTIMIZE, stays [O]-proven in incremental_mv_* and
        # table_diff_snapshots)
        partial = survivors.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(
                    F.col("text").isNotNull(),
                    F.size(F.split("text", r"\s+")),
                ).otherwise(F.lit(0))
            ).alias("sum_tokens"),
        )
        return [{"table": mv_t, "df": partial}]

    for i, m in enumerate((0, 1)):
        batch = docs.where(F.pmod("doc_id", F.lit(16)) == m)
        ingest_dedup_batch(
            batch,
            corpus_p,
            sig_p,
            epoch_id=i + 1,
            run_id="flagship",
            auto_compact_max_dirs=2,
            corpus_compact_kw={
                "vacuum_keep_last": 4,
                "vacuum_min_age_s": 0.0,
            },
            extra_appends=mv_partial,
        )

    heal_index_from_changes(
        spark,
        corpus_p,
        idx_p,
        f"{base}/ckpt",
        lambda b: TI.shingle_postings_build(b.select("doc_id", "text")),
        stats_cols=["tb"],
        extra_meta={"n_buckets": TI.N_BUCKETS},
    ).awaitTermination()

    out = (corpus_t, mv_t, TxTable(spark, idx_p), base)
    _CACHE[key] = out
    return out[0], out[1], out[2]


def flagship_semantic_state(spark: SparkSession, sf_dir: str):
    """(survivors TxTable, centroids DataFrame, IVF TxTable): the
    EMBEDDING-side flagship topology (VERDICT r11 item 5 — the
    semantic twin of ``flagship_state``), materialized once per
    session: (1) vectors arrive as two ordered micro-batches through
    the ONLINE SEMANTIC dedup sink (sign-bucketed cosine refine,
    exactly-once survivor appends, compaction policy ON with the
    bucket-clustered rewrite so pruning survives OPTIMIZE); (2) a
    coarse quantizer trains ONCE on the first arrival's survivors and
    freezes (the production IVF posture); (3) a DECOUPLED healer
    streams the survivor table's change feed — which crosses the
    policy OPTIMIZE as no-data batches — into the IVF index
    exactly-once with per-append cell stats. Immutable-use: consumers
    only probe; every stage is deterministic in the corpus."""
    key = ("flagship_sem", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1], hit[2]
    import os

    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import similarity as S
    from hapiy_etl_spark.operators.txstore import TxTable
    from hapiy_etl_spark.streaming.jobs import (
        foreach_batch_ingest_semdedup,
        heal_index_from_changes,
    )

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].select(
        "vec_id", "embedding"
    )
    base = _base(spark, sf_dir, "flagshipsem")
    shutil.rmtree(base, ignore_errors=True)
    corpus_p, ivf_p = f"{base}/corpus", f"{base}/ivf"

    # two arrivals staged with ascending mtimes; maxFilesPerTrigger=1
    # paces them as two ordered micro-batches in ONE stream run
    Path(base, "src").mkdir(parents=True, exist_ok=True)
    for m in range(2):
        stage = f"{base}/stage{m}"
        emb.where(F.pmod("vec_id", F.lit(2)) == m).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = f"{base}/src/b{m}.parquet"
        shutil.copyfile(f"{stage}/{part}", dst)
        os.utime(dst, (1_000_000_000 + m * 100, 1_000_000_000 + m * 100))
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    foreach_batch_ingest_semdedup(
        stream, corpus_p, f"{base}/ckpt", auto_compact_max_dirs=2
    ).awaitTermination()
    corpus_t = TxTable(spark, corpus_p)

    # frozen quantizer: fit once on the FIRST arrival's survivors —
    # probe-all reads every cell, so ranking is exact regardless of
    # quantizer quality; spend the minimum Lloyd budget
    cent, _ = S.ivf_index_build(
        corpus_t.read().where(F.pmod("vec_id", F.lit(2)) == 0),
        "vec_id",
        n_centroids=4,
        max_iter=1,
    )
    cent = cent.cache()
    cent.count()

    heal_index_from_changes(
        spark,
        corpus_p,
        ivf_p,
        f"{base}/healckpt",
        lambda b: S.ivf_index_assign(
            cent, b.select("vec_id", "embedding"), "vec_id"
        ),
        stats_cols=["cell"],
    ).awaitTermination()

    out = (corpus_t, cent, TxTable(spark, ivf_p), base)
    _CACHE[key] = out
    return out[0], out[1], out[2]


def retighten_state(spark: SparkSession, sf_dir: str):
    """Corpus TxTable AFTER the full takedown-maintenance cycle (r13):
    three id-ranged dirs appended with doc_id stats + DELIBERATELY
    tight blooms (512 bits — the geometry a table outgrows), a first
    erasure spanning all three ranges (victims: doc_id % 97 == 0) that
    coalesces the table into one survivor dir carrying a saturated
    3-way union bloom, the fpr-keyed ``retighten_blooms`` maintenance
    (metadata-only commit; resizes the bloom to the survivor's actual
    key count), then a SECOND erasure (doc_id % 101 == 0) that runs
    against the re-tightened metadata. Consumers read the final table;
    the retighten mechanics themselves are pytest-pinned
    (tests/test_txstore_scheduler.py::test_txstore_retighten_blooms_*)."""
    key = ("retighten", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0]
    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators.txstore import TxTable

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = _base(spark, sf_dir, "retighten")
    shutil.rmtree(base, ignore_errors=True)

    corpus = TxTable(spark, f"{base}/corpus")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    cut1, cut2 = hi // 3, 2 * hi // 3
    for lo_c, hi_c in ((None, cut1), (cut1, cut2), (cut2, None)):
        part = docs
        if lo_c is not None:
            part = part.where(F.col("doc_id") > lo_c)
        if hi_c is not None:
            part = part.where(F.col("doc_id") <= hi_c)
        corpus.append(
            part,
            stats_cols=["doc_id"],
            bloom_cols=["doc_id"],
            bloom_bits=512,
            bloom_k=5,
        )

    def victims(mod: int) -> list[int]:
        return [
            r.doc_id
            for r in docs.where(F.col("doc_id") % mod == 0)
            .select("doc_id")
            .collect()
        ]

    corpus.delete_keys(victims(97), on="doc_id")
    corpus.retighten_blooms(["doc_id"], fpr_threshold=0.05)
    corpus.delete_keys(victims(101), on="doc_id")
    _CACHE[key] = (corpus, base)
    return corpus


def erasure_state(spark: SparkSession, sf_dir: str):
    """(corpus TxTable, shingle-postings TxTable) AFTER a
    right-to-be-forgotten batch: the corpus lands in three id-ranged
    dirs (doc_id stats + blooms), the index is built with
    ``bloom_key="doc_id"`` so postings carry per-dir doc-id blooms,
    then every ``src3`` document is erased from BOTH tables via
    ``TxTable.delete_keys`` — the provenance-takedown scenario
    (license retraction / GDPR request) ``corpus_erasure_audit``
    audits. Materialized once per (application, sf_dir); consumers
    treat both tables as read-only."""
    key = ("erasure", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    from hapiy_etl_spark.io import load_tables
    from hapiy_etl_spark.operators import textindex as TI
    from hapiy_etl_spark.operators.txstore import TxTable

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    base = _base(spark, sf_dir, "erasure")
    shutil.rmtree(base, ignore_errors=True)
    TI.stamp_cache_drop(base)  # same-path rebuild: honor the memo contract

    corpus = TxTable(spark, f"{base}/corpus")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    cut1, cut2 = hi // 3, 2 * hi // 3
    for lo_c, hi_c in ((None, cut1), (cut1, cut2), (cut2, None)):
        part = docs
        if lo_c is not None:
            part = part.where(F.col("doc_id") > lo_c)
        if hi_c is not None:
            part = part.where(F.col("doc_id") <= hi_c)
        corpus.append(part, stats_cols=["doc_id"], bloom_cols=["doc_id"])

    idx = TxTable(spark, f"{base}/shingle_postings")
    TI.postings_append(
        idx, None, TI.shingle_postings_build(docs), None, bloom_key="doc_id"
    )

    # collect the victim ids once: both erasures then provably use the
    # same key set, and the documents scan isn't paid twice
    victims = [
        r.doc_id
        for r in docs.where(F.col("source") == "src3").select("doc_id").collect()
    ]
    corpus.delete_keys(victims, on="doc_id")
    idx.delete_keys(victims, on="doc_id")
    _CACHE[key] = (corpus, idx, base)
    return corpus, idx


def bucketed_tables(spark: SparkSession, sf_dir: str):
    """orders + lineitem written ONCE per (application, sf_dir) as
    Hive-bucketed, per-bucket-sorted saved tables — 8 buckets on the
    order key, one file per bucket (``repartition(8, key)`` before the
    bucketed write, so each task owns exactly one bucket). This is the
    production layout the join-family docstrings keep pointing at
    ("co-partitioned at scale via bucketing"): both sides of the
    orderkey join expose HashPartitioning(key, 8) at SCAN time, so the
    sort-merge join needs NO shuffle on either side —
    `join_bucketed_colocated` asserts that in its own plan. External
    tables under the session temp base (same lifecycle as the other
    persisted fixtures; `index_fixtures_clear` removes the files and
    the overwrite-mode rebuild replaces the catalog entries)."""
    import hashlib

    from hapiy_etl_spark.io import load_tables

    key = ("bucketed", spark.sparkContext.applicationId, str(sf_dir))
    hit = _CACHE.get(key)
    if hit is not None:
        return hit[0], hit[1]
    base = _base(spark, sf_dir, "bucketed")
    tag = hashlib.md5(str(sf_dir).encode()).hexdigest()[:8]
    names = {"orders": f"graft_orders_b_{tag}", "lineitem": f"graft_lineitem_b_{tag}"}
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    for table, bucket_key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            t[table]
            .repartition(8, F.col(bucket_key))
            .write.mode("overwrite")
            .format("parquet")
            .option("path", f"{base}/{table}")
            .bucketBy(8, bucket_key)
            .sortBy(bucket_key)
            .saveAsTable(names[table])
        )
    _CACHE[key] = (names["orders"], names["lineitem"], base)
    return names["orders"], names["lineitem"]
