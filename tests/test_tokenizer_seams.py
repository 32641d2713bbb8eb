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


def test_bpe_batched_trainer_equals_sequential(spark):
    """batch>1 training is bit-identical to batch=1 (the r13 scale
    lever: ~n_merges/batch driver rounds instead of one per merge).
    The corpora are adversarial on purpose — tiny alphabets force the
    top pairs to OVERLAP and tie constantly, exercising both batch
    guards (symbol-overlap stop, new-pair-bound stop)."""
    import random

    from hapiy_etl_spark.operators.bpe import bpe_train

    corpora = [
        # the divergence trap: merging (a,b) creates (x,ab) with count
        # 100 > (c,d)=90 — naive batching would pick (c,d) second
        [("xab", 100), ("cd", 90)],
        # tie-heavy: equal counts everywhere, lex tie-breaks decide
        [("abab", 10), ("baba", 10), ("aabb", 10)],
    ]
    rng = random.Random(23)
    for seed in range(3):  # random small-alphabet corpora
        corpora.append(
            [
                ("".join(rng.choice("abc") for _ in range(rng.randrange(2, 9))),
                 rng.randrange(1, 50))
                for _ in range(30)
            ]
        )
    # two-letter alphabet: products collide maximally ('abab' etc. are
    # reachable through multiple parses), stressing the r14 product-
    # string batch guard (a slice pair whose symbol equals a selected
    # merge's PRODUCT gains count mid-batch — the batch must end there)
    for seed in range(3):
        corpora.append(
            [
                ("".join(rng.choice("ab") for _ in range(rng.randrange(2, 12))),
                 rng.randrange(1, 50))
                for _ in range(30)
            ]
        )
    for words in corpora:
        # dedupe word types (random draws can repeat)
        wt = {}
        for w, c in words:
            wt[w] = wt.get(w, 0) + c
        df = spark.createDataFrame(list(wt.items()), "word string, cnt long")
        seq = [tuple(r) for r in bpe_train(df, 12, batch=1).collect()]
        bat = [tuple(r) for r in bpe_train(df, 12, batch=8).collect()]
        assert bat == seq, (words[:3], seq, bat)


def test_bpe_segment_matches_expression_form(spark):
    """The Arrow word-type segmenter (bpe_segment) reproduces the
    nested-replace expression form (bpe_segment_expr — the ≤64-merge
    oracle-twin shape) word for word, including NULL propagation."""
    from hapiy_etl_spark.operators.bpe import (
        bpe_segment,
        bpe_segment_expr,
        bpe_train,
    )

    words = spark.createDataFrame(
        [("abab", 50), ("xy", 30), ("aaab", 7), ("qrs", 2)],
        "word string, cnt long",
    )
    merges = bpe_train(words, n_merges=3)
    probe = spark.createDataFrame(
        [(1, "abab"), (2, "aaab"), (3, "xy"), (4, "a"), (5, None)],
        "i long, word string",
    )
    arrow = {
        r["i"]: (list(r["subwords"]) if r["subwords"] is not None else None)
        for r in bpe_segment(probe, "word", merges).collect()
    }
    expr = {
        r["i"]: (list(r["subwords"]) if r["subwords"] is not None else None)
        for r in bpe_segment_expr(probe, "word", merges).collect()
    }
    assert arrow == expr
    assert arrow[5] is None  # NULL word stays NULL through the join


def test_bpe_segment_survives_production_merge_count(spark):
    """The scale guarantee the r13 rewrite exists for: segmentation
    with 5,000 merges — the count where the r12 nested-replace column
    expression dies in Catalyst (stack depth / 64KB codegen methods)
    long before data size matters — runs fine through the Arrow
    word-type segmenter and applies ranks in order."""
    from hapiy_etl_spark.operators.bpe import bpe_segment

    rows = [(1, "a", "b", "ab", 900), (2500, "ab", "c", "abc", 800),
            (5000, "abc", "d", "abcd", 700)]
    rows += [
        (r, f"L{r}", f"R{r}", f"L{r}R{r}", 10)
        for r in range(1, 5001)
        if r not in (1, 2500, 5000)
    ]
    merges = spark.createDataFrame(
        rows, "merge_rank int, lhs string, rhs string, merged string, pair_count long"
    )
    probe = spark.createDataFrame(
        [(1, "abcd"), (2, "dcba"), (3, "abcx")], "i long, word string"
    )
    segs = {
        r["i"]: list(r["subwords"])
        for r in bpe_segment(probe, "word", merges).collect()
    }
    assert segs[1] == ["abcd"]  # all three real merges chain in rank order
    assert segs[2] == ["d", "c", "b", "a"]  # untouched
    assert segs[3] == ["abc", "x"]
    for i, w in ((1, "abcd"), (2, "dcba"), (3, "abcx")):
        assert "".join(segs[i]) == w  # decode identity survives scale


def test_bpe_ranked_encoder_equals_fold(spark):
    """The rank-priority encoder (O(len · pairs-present) per word, the
    production path) replays the rank-order fold exactly on
    trainer-produced (topological) tables — across random corpora and
    probe words, including words with symbols the vocab never saw."""
    import random

    from hapiy_etl_spark.operators.bpe import (
        _merges_topological,
        _segment_word,
        _segment_word_ranked,
        bpe_train,
    )

    rng = random.Random(31)
    SEP = "\x1f"
    for trial in range(4):
        wt = {}
        for _ in range(40):
            w = "".join(rng.choice("abcd") for _ in range(rng.randrange(2, 10)))
            wt[w] = wt.get(w, 0) + rng.randrange(1, 30)
        df = spark.createDataFrame(list(wt.items()), "word string, cnt long")
        rows = bpe_train(df, 15).orderBy("merge_rank").collect()
        assert _merges_topological(rows)  # trainer tables always are
        ops = [
            (f"{SEP}{r['lhs']}{SEP}{SEP}{r['rhs']}{SEP}", f"{SEP}{r['merged']}{SEP}")
            for r in rows
        ]
        ranks = {(r["lhs"], r["rhs"]): (r["merge_rank"], r["merged"]) for r in rows}
        probes = list(wt) + ["abcdabcd", "zzz", "a", "dcba" * 5]
        for w in probes:
            assert _segment_word_ranked(w, ranks) == _segment_word(w, ops), w


def test_bpe_non_topological_table_falls_back_to_fold(spark):
    """A hand-built merges table can reference a product BEFORE it
    exists (rank 1 uses 'ab', rank 2 creates it) — there the two
    algorithms genuinely diverge, the topological check catches it,
    and bpe_segment serves the FOLD semantics."""
    from hapiy_etl_spark.operators.bpe import (
        _merges_topological,
        bpe_segment,
    )

    merges = spark.createDataFrame(
        [(1, "ab", "c", "abc", 5), (2, "a", "b", "ab", 9)],
        "merge_rank int, lhs string, rhs string, merged string, pair_count long",
    )
    assert not _merges_topological(merges.collect())
    segs = {
        r["word"]: list(r["subwords"])
        for r in bpe_segment(
            spark.createDataFrame([("abc",)], "word string"), "word", merges
        ).collect()
    }
    # fold: rank 1 is a no-op ('ab' not a symbol yet), rank 2 -> ab, c
    # (the ranked encoder would have produced ['abc'])
    assert segs["abc"] == ["ab", "c"]


def test_bpe_duplicate_product_routes_to_fold(spark):
    """A table producing the SAME merged string at two ranks with a
    consumer in between (('a','bc')->'abc' at rank 2, ('abc','d') at
    rank 3, ('ab','c')->'abc' again at rank 5) passed the r13
    first-rank topological check even though the rank-5 merge
    re-creates a symbol a lower-ranked merge consumes (ADVICE r13).
    The max-rank check flags it, so bpe_segment conservatively serves
    the fold — and the fold and the ≤64-merge expression twin agree."""
    from hapiy_etl_spark.operators.bpe import (
        _merges_topological,
        bpe_segment,
        bpe_segment_expr,
    )

    merges = spark.createDataFrame(
        [
            (1, "b", "c", "bc", 9),
            (2, "a", "bc", "abc", 8),
            (3, "abc", "d", "abcd", 7),
            (4, "a", "b", "ab", 6),
            (5, "ab", "c", "abc", 5),
        ],
        "merge_rank int, lhs string, rhs string, merged string, pair_count long",
    )
    assert not _merges_topological(merges.collect())
    probe = spark.createDataFrame(
        [(1, "abcd"), (2, "abcabcd"), (3, "abd")], "i long, word string"
    )
    got = {
        r["i"]: list(r["subwords"])
        for r in bpe_segment(probe, "word", merges).collect()
    }
    want = {
        r["i"]: list(r["subwords"])
        for r in bpe_segment_expr(probe, "word", merges).collect()
    }
    assert got == want


def test_bpe_ranked_encoder_short_words_match_fold():
    """Words shorter than 2 symbols segment identically on both paths:
    the ranked encoder's list('') is [] so the r13 form returned []
    where the fold's wrap/split round-trip returns [''] (ADVICE r13)."""
    from hapiy_etl_spark.operators.bpe import (
        _segment_word,
        _segment_word_ranked,
    )

    ranks = {("a", "b"): (1, "ab")}
    ops = [("\x1fa\x1f\x1fb\x1f", "\x1fab\x1f")]
    for w in ("", "a", "z"):
        assert _segment_word_ranked(w, ranks) == _segment_word(w, ops) == [w]
