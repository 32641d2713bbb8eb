"""Statistical inference over distributed aggregates: contingency-table
chi-square with Cramér's V, two-proportion A/B z-test, Jensen-Shannon
distribution drift, per-stratum exact-rate sampling, and Shannon
entropy per group.

These are the monitoring/analysis primitives a training-data pipeline
runs next to dedup and quality scoring: "did the label mix drift
between snapshots", "is the conversion difference real", "how diverse
is each source". Every query is pure column algebra — grouped counts
plus tiny broadcast joins of 1-row or |categories|-row aggregates; no
collect, no UDF — so each scales exactly like the groupBy that feeds
it. Probability math sticks to double division and ln() of identical
inputs in both engines (IEEE-identical, FIXTURES.md seam rules),
rounded only at the emitted column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.functions import MD5_UNIFORM_SQL as _MD5_UNIFORM_SQL
from hapiy_etl_spark.functions import md5_uniform as _md5_uniform
from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register


@register(
    "stat_chi2_independence",
    oracle="""
    WITH obs AS (
        SELECT event_type, date_part('day', ts) % 7 AS bucket,
               COUNT(*) AS o
        FROM events GROUP BY 1, 2
    ),
    rowtot AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY 1),
    coltot AS (SELECT bucket, SUM(o) AS c FROM obs GROUP BY 1),
    tot AS (SELECT SUM(o) AS n FROM obs),
    grid AS (
        SELECT rowtot.event_type, coltot.bucket, rowtot.r, coltot.c
        FROM rowtot CROSS JOIN coltot
    ),
    cells AS (
        SELECT g.r * g.c / CAST(t.n AS DOUBLE) AS e,
               COALESCE(obs.o, 0) AS o, t.n
        FROM grid g
        LEFT JOIN obs ON obs.event_type = g.event_type AND obs.bucket = g.bucket
        CROSS JOIN tot t
    )
    SELECT ROUND(SUM((o - e) * (o - e) / e), 4) AS chi2,
           CAST(((SELECT COUNT(*) FROM rowtot) - 1) *
                ((SELECT COUNT(*) FROM coltot) - 1) AS BIGINT) AS dof,
           ROUND(sqrt(SUM((o - e) * (o - e) / e) / (MAX(n) *
                 least((SELECT COUNT(*) FROM rowtot) - 1,
                       (SELECT COUNT(*) FROM coltot) - 1))), 6) AS cramers_v,
           CAST(MAX(n) AS BIGINT) AS n
    FROM cells
    """,
    doc="Pearson chi-square test of independence (event_type x "
    "day-bucket) with Cramer's V effect size. Full R x C grid built "
    "from the margin CROSS JOIN (tiny — |categories|^2), observed "
    "counts left-joined so empty cells still contribute (0-e)^2/e. "
    "One shuffle for the contingency counts; margins are re-aggregates "
    "of that tiny table, broadcast back.",
)
def stat_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    obs = (
        t["events"]
        .select("event_type", (F.dayofmonth("ts") % 7).alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("o"))
    )
    rowtot = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    coltot = obs.groupBy("bucket").agg(F.sum("o").alias("c"))
    grid = F.broadcast(rowtot).crossJoin(F.broadcast(coltot))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        grid.join(obs, ["event_type", "bucket"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "bucket",
            (F.col("r") * F.col("c") / F.col("n").cast("double")).alias("e"),
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            "n",
        )
    )
    chi2 = F.sum((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"))
    # margin cardinalities computed IN the plan (count_distinct over the
    # tiny grid) — no eager .count() jobs at construction time
    n_r = F.count_distinct("event_type")
    n_c = F.count_distinct("bucket")
    return cells.agg(
        F.round(chi2, 4).alias("chi2"),
        ((n_r - 1) * (n_c - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(chi2 / (F.max("n") * F.least(n_r - 1, n_c - 1))), 6
        ).alias("cramers_v"),
        F.max("n").cast("bigint").alias("n"),
    )


@register(
    "stat_ab_proportion_ztest",
    oracle="""
    WITH arms AS (
        SELECT user_id % 2 AS arm,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM events GROUP BY 1
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 0 THEN n END) AS n0,
            MAX(CASE WHEN arm = 1 THEN n END) AS n1,
            MAX(CASE WHEN arm = 0 THEN conv END) AS c0,
            MAX(CASE WHEN arm = 1 THEN conv END) AS c1
        FROM arms
    )
    SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
           ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
           ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
           ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                 / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 4) AS z,
           (abs((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1)
                / sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                       * (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                       * (1.0 / n0 + 1.0 / n1))) > 1.96) AS significant
    FROM wide
    """,
    doc="Two-proportion z-test: purchase-conversion difference between "
    "hash-assigned arms (user_id % 2), pooled-variance z and the "
    "alpha=0.05 verdict. One grouped aggregate, then a 2-row pivot — "
    "the experiment-analysis kernel at any scale.",
)
def stat_ab_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    arms = (
        t["events"]
        .groupBy((F.col("user_id") % 2).alias("arm"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "conv"
            ),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("arm") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("arm") == 1, F.col("conv"))).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0")
    p1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (F.col("n0") + F.col("n1"))
    z = (p0 - p1) / F.sqrt(
        pooled * (1.0 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))
    )
    return wide.select(
        F.col("n0").cast("bigint").alias("n0"),
        F.col("n1").cast("bigint").alias("n1"),
        F.round(p0, 6).alias("rate0"),
        F.round(p1, 6).alias("rate1"),
        F.round(z, 4).alias("z"),
        (F.abs(z) > 1.96).alias("significant"),
    )


@register(
    "corpus_lang_drift_jsd",
    oracle="""
    WITH halves AS (
        SELECT lang,
               SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS a,
               SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS b
        FROM documents GROUP BY 1
    ),
    tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM halves),
    probs AS (
        SELECT CAST(a AS DOUBLE) / ta AS p, CAST(b AS DOUBLE) / tb AS q,
               ta, tb
        FROM halves CROSS JOIN tot
    )
    SELECT ROUND(SUM(
               CASE WHEN p > 0 THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
             + CASE WHEN q > 0 THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END
           ), 6) AS jsd,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST(MAX(ta) AS BIGINT) AS n_a,
           CAST(MAX(tb) AS BIGINT) AS n_b
    FROM probs
    """,
    doc="Distribution drift monitor: Jensen-Shannon divergence between "
    "the language mixes of two corpus snapshots (hash-split halves). "
    "0 = identical mixes, ln(2) = disjoint. Grouped counts + a 1-row "
    "total broadcast; the alerting primitive for 'did the crawl mix "
    "shift under us'.",
)
def corpus_lang_drift_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    halves = (
        t["documents"]
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0)).alias("b"),
        )
    )
    tot = halves.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    probs = halves.crossJoin(F.broadcast(tot)).select(
        (F.col("a").cast("double") / F.col("ta")).alias("p"),
        (F.col("b").cast("double") / F.col("tb")).alias("q"),
        "ta",
        "tb",
    )
    m = (F.col("p") + F.col("q")) / 2
    term_p = F.when(F.col("p") > 0, 0.5 * F.col("p") * F.log(F.col("p") / m)).otherwise(
        0.0
    )
    term_q = F.when(F.col("q") > 0, 0.5 * F.col("q") * F.log(F.col("q") / m)).otherwise(
        0.0
    )
    return probs.agg(
        F.round(F.sum(term_p + term_q), 6).alias("jsd"),
        F.count("*").cast("bigint").alias("n_langs"),
        F.max("ta").cast("bigint").alias("n_a"),
        F.max("tb").cast("bigint").alias("n_b"),
    )


@register(
    "sample_stratified_rates",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM documents
    WHERE {_MD5_UNIFORM_SQL.format(col='doc_id')} <
          CASE WHEN lang = 'en' THEN 0.25 ELSE 0.75 END
    GROUP BY lang ORDER BY lang
    """,
    doc="sampleBy-style stratified sampling with per-stratum rates "
    "(downsample the over-represented language, keep the tail), "
    "driven by the portable md5 per-doc uniform so the SAME rows are "
    "picked on any engine, partitioning, or rerun — the reproducible "
    "rebalancing primitive. Pure filter: no shuffle at all before the "
    "reporting aggregate.",
)
def sample_stratified_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    rate = F.when(F.col("lang") == "en", 0.25).otherwise(0.75)
    return (
        t["documents"]
        .where(_md5_uniform(F.col("doc_id")) < rate)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("chars_sampled"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang")
    )


@register(
    "doc_source_entropy",
    oracle="""
    WITH cnt AS (
        SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT source, SUM(c) AS n FROM cnt GROUP BY 1)
    SELECT cnt.source,
           CAST(MAX(tot.n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_langs,
           ROUND(-SUM((CAST(c AS DOUBLE) / tot.n)
                      * ln(CAST(c AS DOUBLE) / tot.n)), 6) AS entropy
    FROM cnt JOIN tot ON cnt.source = tot.source
    GROUP BY cnt.source
    ORDER BY cnt.source
    """,
    doc="Shannon entropy of the language mix per source — the "
    "diversity score used to spot monoculture domains in a crawl. "
    "Two tiny re-aggregates of one grouped count, joined broadcast.",
)
def doc_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    cnt = t["documents"].groupBy("source", "lang").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    return (
        cnt.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
        .orderBy("source")
    )
