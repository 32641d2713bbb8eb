"""Edit-distance similarity join via deletion-neighborhood blocking.

The SymSpell candidate-generation idea (public domain algorithm family:
FAROO/SymSpell, also Norvig's spell-corrector neighborhoods) turned
into a distributed join: two strings within Levenshtein distance 1 MUST
share a member of each other's deletion neighborhood — the string
itself or the string with one character deleted. So:

    variants(s) = {s} ∪ {s with position i removed}      (|s|+1 rows)
    candidates  = equi-join on variant                    (never all-pairs)
    pairs       = candidates WHERE levenshtein(a, b) <= 1 (exact verify)

The blocking key is an 8-byte-ish string, candidate volume is linear in
Σ|s| times the bucket load, and the expensive exact Levenshtein runs
only on candidates — the same prune-then-verify posture as the
n-gram/MinHash/SimHash family (operators/dedup.py), specialized to
typo distance. All column algebra: posexplode over a substring
transform; no UDF anywhere.

Completeness note: distance-d neighborhoods need d nested deletions
(SymSpell proper); d=1 covers the spell-correction workhorse case and
keeps variant volume at |s|+1 per string. The verify step is exact, so
recall is 100% for d<=1 by the deletion-neighborhood theorem (two
strings at distance 1 differ by one insert/delete/substitute; deleting
the differing position from the longer/either side lands both on a
common variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(df: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """(id, s) → one row per deletion variant, including s itself."""
    base = df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    # positions 0..len: 0 = the identity variant, i>0 = delete char i
    pos = F.explode(F.sequence(F.lit(0), F.length("s"))).alias("i")
    exploded = base.select("id", "s", pos)
    variant = F.when(F.col("i") == 0, F.col("s")).otherwise(
        F.concat(
            F.expr("substring(s, 1, i - 1)"),
            F.expr("substring(s, i + 1, length(s))"),
        )
    )
    return exploded.select("id", "s", variant.alias("v")).dropDuplicates(["id", "v"])


def edit_distance_pairs(
    df: DataFrame, id_col: str, str_col: str, max_edit: int = 1
) -> DataFrame:
    """Distinct (id_a < id_b) pairs with levenshtein(s_a, s_b) <= max_edit.

    Only max_edit=1 is supported by the d=1 deletion neighborhood (the
    docstring theorem); the verify threshold still takes the parameter
    so a wider candidate generator can reuse it.
    """
    if max_edit != 1:
        raise NotImplementedError("deletion-neighborhood blocking built for max_edit=1")
    v = deletion_variants(df, id_col, str_col)
    a = v.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "v")
    b = v.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "v")
    cand = (
        a.join(b, "v")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.where(F.levenshtein("s_a", "s_b") <= max_edit).where(
        F.col("s_a") != F.col("s_b")
    )
