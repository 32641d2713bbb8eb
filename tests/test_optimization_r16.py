"""Focused tests for the r16 optimization round's operator changes.

Pinned here:
1. ``_pq_codebooks`` process-pool fit (guide §4.5, VERDICT r15 item 4):
   the pooled per-subspace Lloyd fits must be BIT-identical
   (np.array_equal) to the serial loop across the geometries the ANN
   family actually uses — a drifted codebook would silently move every
   lossy ranking and the hash-pinned index fixtures.
2. ``TxTable._grouped_bloom_build`` executor-side bitmap aggregation
   (guide §5, VERDICT r15 item 7): entries stay byte-identical to the
   per-dir form, the driver collect is bounded at one row per group,
   and an all-NULL bucket now records the per-dir form's all-zero
   bloom (ADVICE r15) instead of silently dropping the entry.
3. ``dedup_minhash_lsh``'s content-prefix demo slice (VERDICT r15
   item 8): non-degenerate output at the oracle SF.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hapiy_etl_spark.operators.txstore import TxTable


def _serial_codebooks(sample, m, n_codes, seed, iters=8):
    """The pre-r16 serial reference fit, verbatim."""
    n, dim = sample.shape
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        x = sample[:, j * sub : (j + 1) * sub]
        cent = x[rng.choice(n, size=min(n_codes, n), replace=False)]
        if len(cent) < n_codes:
            cent = np.resize(cent, (n_codes, sub))
        for _ in range(iters):
            d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(n_codes):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        books[j] = cent
    return books


@pytest.mark.parametrize(
    "n,dim,m,n_codes",
    [
        (400, 64, 8, 256),   # ann_pq_topk-style geometry (degenerate n<codes)
        (1000, 64, 16, 256),  # ann_ivfpq_topk geometry
        (50, 16, 4, 16),      # tiny degenerate sample
    ],
)
def test_pq_codebooks_pool_bit_identical_to_serial(n, dim, m, n_codes):
    from hapiy_etl_spark.operators.similarity import _pq_codebooks

    rng = np.random.RandomState(7)
    sample = rng.randn(n, dim)
    pooled = _pq_codebooks(sample, m, n_codes, seed=42)
    serial = _serial_codebooks(sample, m, n_codes, seed=42)
    assert np.array_equal(pooled, serial), "pooled fit drifted from serial"


def test_pq_codebooks_serial_fallback_matches(monkeypatch):
    # a broken pool must fall back to the serial loop, not fail the fit
    import hapiy_etl_spark.operators.similarity as S

    def _broken_pool():
        raise RuntimeError("pool unavailable")

    monkeypatch.setattr(S, "_pq_fit_pool", _broken_pool)
    # the sticky off-flag flips inside the call; monkeypatch restores it
    # (and the pool handle) at teardown so later tests get the pool back
    monkeypatch.setattr(S, "_PQ_FIT_POOL_BROKEN", False)
    monkeypatch.setattr(S, "_PQ_FIT_POOL", None)
    rng = np.random.RandomState(3)
    sample = rng.randn(300, 32)
    out = S._pq_codebooks(sample, 8, 64, seed=42)
    assert np.array_equal(out, _serial_codebooks(sample, 8, 64, seed=42))


def test_grouped_bloom_collect_is_one_row_per_group(spark, tmp_path):
    # the r16 executor-side fold: entries byte-identical to per-dir AND
    # the driver-side materialization bounded at n_groups rows
    df = spark.createDataFrame(
        [(i % 4, i * 37) for i in range(400)], "g int, doc_id long"
    )
    t = TxTable(spark, str(tmp_path / "t"))
    grouped = t._grouped_bloom_build(df, "g", "doc_id", bits=1 << 14, k=5)
    assert set(grouped) == {0, 1, 2, 3}
    for g in range(4):
        per_dir = t._bloom_build(
            df.where(F.col("g") == g), ["doc_id"], bits=1 << 14, k=5
        )["doc_id"]
        assert grouped[g] == per_dir, f"group {g} bloom diverged"


def test_grouped_bloom_validates_geometry(spark, tmp_path):
    # ADVICE r15: the grouped form must validate bits/k like the
    # per-dir form (clear ValueError, not a mid-build IndexError)
    df = spark.createDataFrame([(0, 1)], "g int, doc_id long")
    t = TxTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="multiple of 8"):
        t._grouped_bloom_build(df, "g", "doc_id", bits=1001, k=5)
    with pytest.raises(ValueError, match="positive"):
        t._grouped_bloom_build(df, "g", "doc_id", bits=1024, k=0)


def test_grouped_bloom_all_null_bucket_records_zero_bloom(spark, tmp_path):
    # ADVICE r15: a bucket whose bloom column is entirely NULL records
    # an ALL-ZERO bloom (prunes every probe), matching the per-dir form
    df = spark.createDataFrame(
        [(0, 5), (0, 9), (1, None)], "g int, doc_id long"
    )
    t = TxTable(spark, str(tmp_path / "t"))
    grouped = t._grouped_bloom_build(
        df, "g", "doc_id", bits=1 << 12, k=5, groups=[0, 1]
    )
    assert 1 in grouped, "all-NULL bucket lost its bloom entry"
    per_dir_null = t._bloom_build(
        df.where(F.col("g") == 1), ["doc_id"], bits=1 << 12, k=5
    )["doc_id"]
    assert grouped[1] == per_dir_null  # the all-zero bitmap
    import base64

    assert not any(base64.b64decode(grouped[1]["b64"]))


def test_clustered_optimize_all_null_bucket_keeps_bloom(spark, tmp_path):
    # end-to-end: a clustered rewrite whose lowest bucket collects the
    # NULL-key rows still blooms the (all-NULL there) bloom column
    t = TxTable(spark, str(tmp_path / "t"))
    df = spark.range(2000).select(
        F.when(F.col("id") < 100, None)
        .otherwise(F.col("id"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    t.append(df, stats_cols=["k"], bloom_cols=["k"])
    t.optimize_clustered("k", n_dirs=4)
    m = t._manifest(t.latest_version())
    assert len(m["dirs"]) == 4
    for d in m["dirs"]:
        assert "k" in (m.get("blooms") or {}).get(d, {}), (
            f"dir {d} lost its bloom through the clustered rewrite"
        )


@pytest.mark.parametrize("portable", [False, True])
def test_simhash_expr_build_matches_column_build(spark, portable):
    # r16: simhash_signatures builds its vote/packing expressions as
    # parsed SQL (construction-time optimization); this pins the new
    # form against the pre-r16 Column-API reference, value for value
    from pyspark.sql import functions as F

    import hapiy_etl_spark.operators.dedup as D
    from hapiy_etl_spark.operators.textstats import tokens

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "totally different words here"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )

    def reference(df, portable):
        tok = df.select(
            F.col("doc_id").alias("doc"),
            F.explode_outer(tokens("text")).alias("tok"),
        )
        if portable:
            h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
            n_bits = D.PORTABLE_SIMHASH_BITS
        else:
            h = F.xxhash64("tok")
            n_bits = 64
        votes = [
            F.sum(
                F.when(
                    h.bitwiseAND(F.shiftleft(F.lit(1).cast("long"), b)) != 0, 1
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(n_bits)
        ]
        agg = tok.groupBy("doc").agg(*votes)
        sig = F.lit(0).cast("long")
        for b in range(n_bits):
            sig = sig.bitwiseOR(
                F.when(
                    F.col(f"v{b}") > 0,
                    F.shiftleft(F.lit(1).cast("long"), b),
                ).otherwise(F.lit(0).cast("long"))
            )
        return agg.select("doc", sig.alias("sig"))

    got = {
        r.doc: r.sig
        for r in D.simhash_signatures(
            docs, "doc_id", "text", portable=portable
        ).collect()
    }
    want = {r.doc: r.sig for r in reference(docs, portable).collect()}
    assert got == want
    assert got[1] == got[2]  # identical texts share a signature


def test_lsh_bucket_expr_matches_reference(spark):
    # r16: lsh_bucket builds as one parsed expression — pin against the
    # pre-r16 Column-API fold on real embedding shapes (incl. exact
    # double literal round-trip through CAST('<repr>' AS DOUBLE))
    from pyspark.sql import functions as F

    import hapiy_etl_spark.operators.similarity as S

    planes = S._hyperplanes(8, 6, seed=42)
    df = spark.createDataFrame(
        [(i, [((i * 37 + j * 13) % 17 - 8) / 7.0 for j in range(8)]) for i in range(20)],
        "id long, v array<double>",
    )

    def reference(vec, planes):
        bucket = F.lit(0).cast("long")
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(x) for x in p])
            bucket = bucket.bitwiseOR(
                F.when(
                    S.dot(vec, plane) > 0,
                    F.shiftleft(F.lit(1).cast("long"), i),
                ).otherwise(F.lit(0).cast("long"))
            )
        return bucket

    got = {r.id: r.b for r in df.select("id", S.lsh_bucket("v", planes).alias("b")).collect()}
    want = {
        r.id: r.b
        for r in df.select("id", reference(F.col("v"), planes).alias("b")).collect()
    }
    assert got == want


def test_minhash_lsh_demo_slice_non_degenerate(spark):
    # VERDICT r15 item 8: the capped demo must keep >0 near-dup pairs
    # at the oracle SF (the id-hash slice kept ~none)
    from hapiy_etl_spark.registry import all_queries

    q = all_queries()["dedup_minhash_lsh"]
    out = q.fn(spark, "/root/testdata/sf0.01")
    assert out.count() > 0, "demo slice is vacuous again"


if __name__ == "__main__":  # pragma: no cover
    pytest.main([__file__, "-q"])
