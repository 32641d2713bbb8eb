"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting (build-target north star).

Everything here is a *Column expression builder* — pure built-in
functions, JVM-side, whole-stage-codegen'd. No Python touches a row, so
these run at full scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword-hit heuristic.
# Deliberately small: at scan time each set is one `array_intersect`.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "et", "de", "est"),
    "de": ("der", "die", "das", "und", "ist"),
}

STOPWORDS = tuple(sorted({w for ws in LANG_STOPWORDS.values() for w in ws}))


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the baseline tokenizer)."""
    return F.split(F.col(text) if isinstance(text, str) else text, r"\s+")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish sub-word segmentation via regex: runs of letters, runs of
    digits, or single punctuation — a deterministic proxy for a real BPE
    vocab (which would be a broadcast lookup + the same regex split)."""
    col = F.col(text) if isinstance(text, str) else text
    marked = F.regexp_replace(col, r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])", "$1\u0001")
    return F.filter(F.transform(F.split(marked, "\u0001"), F.trim), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/whitespace."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def upper_ratio(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    uppers = F.length(F.regexp_replace(col, r"[^A-Z]", ""))
    letters = F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))
    return uppers / F.greatest(letters, F.lit(1))


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x)
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: reward stopword presence and
    sane token lengths, penalize punctuation soup — the standard
    pre-training quality-filter shape (C4/Gopher-style rules)."""
    sw = stopword_ratio(text)
    pr = punct_ratio(text)
    atl = avg_token_len(text)
    len_ok = F.when((atl >= 3) & (atl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_ok = F.least(sw * 5, F.lit(1.0))
    return F.round((sw_ok * 0.4 + (1 - F.least(pr * 5, F.lit(1.0))) * 0.3 + len_ok * 0.3), 6)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language (the n-gram-heuristic features)."""
    toks = tokens(text)

    def hit_counter(ws: tuple[str, ...]):
        # single-arg lambda via closure: a defaulted second param would be
        # misread by PySpark as the (element, index) lambda form
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    return {lang: hit_counter(ws) for lang, ws in LANG_STOPWORDS.items()}


def lang_id(text: Column | str) -> Column:
    """Argmax language with deterministic priority ties (en>es>fr>de),
    'und' when nothing hits."""
    s = lang_scores(text)
    best = F.greatest(*s.values())
    out = F.lit("und")
    # build the when-chain in reverse priority so earlier langs win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        out = F.when((s[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def token_hash(tok: Column) -> Column:
    """Portable 56-bit token hash: md5 prefix → bigint, reduced mod a
    prime. Identical in DuckDB:
    ('0x' || substr(md5(t), 1, 14))::BIGINT % 1000003."""
    return (F.conv(F.substring(F.md5(tok), 1, 14), 16, 10).cast("bigint") % 1000003)


def doc_fingerprint(text: Column | str) -> Column:
    """Position-weighted rolling fingerprint: sum(token_hash(t_i) * i).

    Order-sensitive (a permuted document fingerprints differently) yet
    expressible as pure column algebra — zip each token with its
    1-based position, hash, weight, sum.
    """
    toks = tokens(text)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)))
    weighted = F.zip_with(toks, idx, lambda t, i: token_hash(t) * i.cast("bigint"))
    return F.aggregate(weighted, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
