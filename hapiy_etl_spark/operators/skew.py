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


def hot_key_join(spark, sf_dir: str, k: int = 8, hot_share: float = 0.4, n_mappers: int = 16):
    """Deliberately skewed shuffle join — the AQE skew-split demo shape.

    lineitem is replicated k-fold and ``hot_share`` of its rows are
    funneled onto supplier key 1, with an incompressible sha2 payload so
    the hot reduce partition is heavy in BYTES (AQE sizes partitions on
    compressed shuffle bytes; a hot partition of repeated 8-byte keys
    compresses to ~nothing and never crosses the threshold). The result
    joins supplier on the hot key and aggregates — broadcast disabled by
    the caller so the join shuffles.

    The ``repartition(n_mappers)`` is load-bearing: AQE can only split a
    skewed reduce partition at MAP-OUTPUT granularity
    (ShufflePartitionsUtil.createSkewPartitionSpecs walks per-mapper
    sizes), so a single-file source scanned by one task yields exactly
    one chunk per reduce partition and nothing can be split, no matter
    how skewed. On a real cluster upstream parallelism gives this for
    free; locally we must manufacture it. That asymmetry — skew-split
    needs many mappers, salting does not — is itself the documented
    finding.
    """
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_suppkey", "l_orderkey", "l_extendedprice")
    )
    fact = (
        li.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn(
            "l_suppkey",
            F.when(F.rand(seed=7) < hot_share, F.lit(1)).otherwise(F.col("l_suppkey")),
        )
        .withColumn("l_orderkey", F.col("l_orderkey") * k + F.col("__r"))
        .withColumn("noise", F.sha2(F.concat_ws("-", "l_orderkey", "__r"), 256))
        .drop("__r")
        .repartition(n_mappers)
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return (
        fact.join(sup, fact.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n"),
            F.max("noise").alias("mx"),
        )
    )
