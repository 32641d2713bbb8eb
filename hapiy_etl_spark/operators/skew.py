"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on by default in
session.py) handles most runtime skew; explicit salting is for the cases
AQE can't fix — a hot key on the build side of a shuffled join, or a
groupBy where one key holds a large share of all rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot values of ``on``.

    The skewed side gets a random salt in [0, n_salts); the dim side is
    exploded n_salts-fold. The shuffle key becomes (on, salt) so a hot
    key spreads over n_salts reducers. Dim-side replication costs
    n_salts x |dim| — use for genuinely small-to-medium dims (a small
    dim should just be broadcast instead).
    """
    salt = F.floor(F.rand(seed=42) * n_salts).cast("int")
    left = skewed.withColumn("__salt", salt)
    right = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = left.join(right, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    partial_aggs: Sequence[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed groupBy keys.

    Stage 1 groups by (keys, salt) — the hot key's rows split across
    n_salts partial groups; stage 2 merges partials by keys alone.
    ``partial_aggs`` compute the stage-1 partials, ``aggs`` merge them
    (e.g. partial: sum(x) as s, count(*) as c → merge: sum(s), sum(c)).

    Note Spark already does map-side partial aggregation for algebraic
    aggs; explicit salting matters when the *reduce* side would still
    see one giant group (e.g. collect_list, exact distinct per key).
    """
    salt = F.floor(F.rand(seed=42) * n_salts).cast("int")
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*aggs)
