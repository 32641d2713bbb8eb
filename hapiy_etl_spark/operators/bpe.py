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


def bpe_train(
    words: DataFrame, n_merges: int, checkpoint_every: int = 4
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word, cnt) type table.

    Returns the merges table (merge_rank, lhs, rhs, merged, pair_count) in
    learned order — the artifact a tokenizer ships. Ties break by
    (pair_count DESC, left, right), so the sequence is deterministic.
    """
    # eager checkpoint BEFORE the loop: the type table is the reduced
    # artifact every round re-reads — without this, rounds before the
    # first periodic checkpoint re-run the corpus-wide tokenize+groupBy
    # through lineage once per round
    types = words.select(
        wrap_symbols("word").alias("s"), F.col("cnt")
    ).localCheckpoint(eager=True)
    merges = []
    for rank in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(types)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .select(
                F.lit(rank).alias("merge_rank"),
                "lhs",
                "rhs",
                F.concat("lhs", "rhs").alias("merged"),
                "pair_count",
            )
            # 1-row: materialize so the N accumulated merge frames don't
            # each re-run the whole chain when unioned/collected
            .localCheckpoint(eager=True)
        )
        merges.append(best)
        types = (
            types.crossJoin(F.broadcast(best))
            .withColumn(
                "s",
                F.replace(
                    F.col("s"),
                    F.concat(
                        F.lit(SEP),
                        F.col("lhs"),
                        F.lit(SEP + SEP),
                        F.col("rhs"),
                        F.lit(SEP),
                    ),
                    F.concat(F.lit(SEP), F.col("merged"), F.lit(SEP)),
                ),
            )
            .select("s", "cnt")
        )
        if rank % checkpoint_every == 0:
            types = types.localCheckpoint(eager=True)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def bpe_segment(df: DataFrame, word_col: str, merges: DataFrame):
    """Apply a learned merges table to a word column -> subword token
    array (the ENCODE segmentation; ids would come from a vocab join).

    The merges table is bounded tokenizer metadata (10k-100k rows in
    production), so it collects to the driver once and applies as a
    chain of literal replaces — the same broadcast-small-artifact
    posture as a vocab join, with no per-round shuffle.
    """
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
