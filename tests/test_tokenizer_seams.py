"""Tokenizer seam hardening: Spark `F.split` vs DuckDB
`string_split_regex` parity on adversarial whitespace.

Every text oracle in the repo leans on these two tokenizers agreeing
token-for-token. After the dtype seam (r2), tokenization is the next
most likely silent-divergence class: leading/trailing whitespace,
repeated separators, empty and all-whitespace documents. These planted
fixtures assert parity for the three derived quantities the oracles
consume: token counts, position-weighted fingerprints, and n-gram
shingle sets.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from hapiy_etl_spark.operators import dedup as D
from hapiy_etl_spark.operators import textstats as TS

TRICKY = [
    (1, "hello world plain"),
    (2, "  leading whitespace"),
    (3, "trailing whitespace  "),
    (4, "a  b   c    d"),  # repeated internal separators
    (5, ""),  # empty document
    (6, "   "),  # all-whitespace document
    (7, "tab\tand\nnewline\r\nmix here"),
    (8, "single"),
    (9, " x "),  # both-side pad around one token
]

_VALUES = ", ".join(f"({i}, '{t}')" for i, t in TRICKY).replace("\t", "' || chr(9) || '").replace(
    "\r", "' || chr(13) || '"
).replace("\n", "' || chr(10) || '")


def _duck(sql: str) -> dict:
    con = duckdb.connect()
    try:
        rows = con.execute(
            f"WITH docs(doc_id, text) AS (VALUES {_VALUES}) {sql}"
        ).fetchall()
    finally:
        con.close()
    return {r[0]: r[1] for r in rows}


@pytest.fixture(scope="module")
def tricky_df(spark):
    return spark.createDataFrame(TRICKY, "doc_id long, text string")


def test_token_count_parity(spark, tricky_df):
    got = {
        r.doc_id: r.n
        for r in tricky_df.select("doc_id", TS.token_count("text").alias("n")).collect()
    }
    want = _duck(
        "SELECT doc_id, len(string_split_regex(text, '\\s+')) FROM docs ORDER BY doc_id"
    )
    assert got == want, {k: (got[k], want[k]) for k in got if got[k] != want[k]}


def test_fingerprint_parity(spark, tricky_df):
    got = {
        r.doc_id: r.fp
        for r in tricky_df.select(
            "doc_id", TS.doc_fingerprint("text").alias("fp")
        ).collect()
    }
    want = _duck(
        """
        SELECT doc_id,
               CAST(SUM((('0x' || substr(md5(t), 1, 14))::BIGINT % 1000003) * pos) AS BIGINT)
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(text, '\\s+')) AS t,
                   generate_subscripts(string_split_regex(text, '\\s+'), 1) AS pos
            FROM docs
        ) GROUP BY doc_id ORDER BY doc_id
        """
    )
    assert got == want, {k: (got.get(k), want.get(k)) for k in got if got.get(k) != want.get(k)}


def test_shingle_set_parity(spark, tricky_df):
    """3-gram shingles (the dedup/oracle unit), serialized sorted."""
    got = {
        r.doc_id: r.sh
        for r in tricky_df.select(
            "doc_id",
            F.array_join(F.array_sort(D.shingles("text", n=3)), "|").alias("sh"),
        ).collect()
    }
    want = _duck(
        """
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(CASE
                   WHEN len(t) >= 3 THEN list_transform(
                       range(1, len(t) - 2 + 1), i -> array_to_string(t[i:i+2], ' '))
                   ELSE [array_to_string(t, ' ')]
               END)), '|')
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM docs)
        ORDER BY doc_id
        """
    )
    assert got == want, {k: (got.get(k), want.get(k)) for k in got if got.get(k) != want.get(k)}


def test_bpe_train_learns_planted_merges_and_roundtrips(spark):
    """The BPE trainer (operators/bpe.py) learns the planted dominant
    pairs in frequency order, segmentation is leftmost-greedy, and
    decode(encode(word)) == word for every word — subword boundaries
    never lose or reorder characters."""
    from hapiy_etl_spark.operators.bpe import bpe_segment, bpe_train

    # 'abab' dominates -> (a,b) first, then (ab,ab); 'xy' next
    words = spark.createDataFrame(
        [("abab", 50), ("xy", 30), ("aaab", 7), ("qrs", 2)],
        "word string, cnt long",
    )
    merges = bpe_train(words, n_merges=3)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["pair_count"])
        for r in merges.orderBy("merge_rank").collect()
    ]
    # round 1: (a,b) appears 2x per 'abab' (50) = 100 + 1x 'aaab' (7)
    assert got[0] == (1, "a", "b", 107)
    # round 2: (ab,ab) 1x per 'abab' = 50 — beats (x,y)=30 and (a,a)
    assert got[1] == (2, "ab", "ab", 50)
    assert got[2][0] == 3

    # leftmost-greedy: 'aaab' under merge (a,b) -> a,a,ab; and 'aaa'
    # under a hypothetical (a,a) merges the FIRST two only
    seg = bpe_segment(
        spark.createDataFrame(
            [("abab",), ("aaab",), ("xy",), ("qrs",), ("a",)],
            "word string",
        ),
        "word",
        merges,
    )
    segs = {r["word"]: list(r["subwords"]) for r in seg.collect()}
    assert segs["abab"] == ["abab"]
    assert segs["aaab"] == ["a", "a", "ab"]
    assert segs["qrs"] == ["q", "r", "s"]
    assert segs["a"] == ["a"]
    # decode == concat(subwords) == original word, for every word
    for w, s in segs.items():
        assert "".join(s) == w


def test_bpe_overlap_semantics_match_reference(spark):
    """Overlapping-run edge: merge (a,a) applied to 'aaaa' must pair
    leftmost non-overlapping — (aa)(aa) — and 'aaa' -> (aa)(a); the
    separator-wrapped replace() kernel reproduces the reference
    algorithm exactly."""
    from hapiy_etl_spark.operators.bpe import bpe_segment, bpe_train

    words = spark.createDataFrame([("aaaa", 10), ("aaa", 1)], "word string, cnt long")
    merges = bpe_train(words, n_merges=2)
    got = [(r["lhs"], r["rhs"]) for r in merges.orderBy("merge_rank").collect()]
    # 'aaaa' has 3 adjacent (a,a) + 'aaa' has 2 -> count 32; round 2
    # merges (aa,aa) from 'aaaa' (10) vs (aa,a) from 'aaa' (1)
    assert got[0] == ("a", "a")
    assert got[1] == ("aa", "aa")
    segs = {
        r["word"]: list(r["subwords"])
        for r in bpe_segment(
            spark.createDataFrame([("aaaa",), ("aaa",), ("aaaaa",)], "word string"),
            "word",
            merges,
        ).collect()
    }
    assert segs["aaaa"] == ["aaaa"]
    assert segs["aaa"] == ["aa", "a"]
    assert segs["aaaaa"] == ["aaaa", "a"]
