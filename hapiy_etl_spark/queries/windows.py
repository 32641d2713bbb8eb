"""Window functions: ranking, analytic (lag/lead/first/last/nth), frames
(rows/range), running aggregates, sessionization (SURVEY.md §2B).

Window partitions shuffle once on partitionBy keys; all functions over
the same (partitionBy, orderBy) spec share that single sort — group
specs to avoid extra shuffles. Order-by keys are made unique (tiebreak
on the PK) so results are deterministic for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register

DEC = "decimal(18,2)"


@register(
    "window_ranking",
    oracle="""
    SELECT
        c_mktsegment, c_custkey,
        ROW_NUMBER()  OVER w AS rn,
        RANK()        OVER w AS rnk,
        DENSE_RANK()  OVER w AS drnk,
        NTILE(4)      OVER w AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        ROUND(CUME_DIST()    OVER w, 6) AS cume
    FROM customer
    WHERE c_custkey <= 300
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_mktsegment, rn
    """,
    doc="Ranking family: row_number/rank/dense_rank/ntile/percent_rank/cume_dist.",
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        t["customer"]
        .where(F.col("c_custkey") <= 300)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_analytic",
    oracle="""
    SELECT
        o_custkey, o_orderkey,
        LAG(o_orderkey)  OVER w AS prev_order,
        LEAD(o_orderkey) OVER w AS next_order,
        FIRST_VALUE(o_orderkey) OVER w AS first_order,
        NTH_VALUE(o_orderkey, 2) OVER w AS second_order,
        LAG(o_orderkey, 2, -1) OVER w AS prev2_or_default
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Analytic family: lag/lead (with default), first_value, nth_value.",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .where(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_order"),
            F.lead("o_orderkey").over(w).alias("next_order"),
            F.first("o_orderkey").over(w).alias("first_order"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
            F.lag("o_orderkey", 2, -1).over(w).alias("prev2_or_default"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_frames_running",
    oracle="""
    SELECT
        o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
              / LEAST(3, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)), 4) AS moving_avg3,
        COUNT(*) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderkey
                       RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS near_key_count
    FROM orders
    WHERE o_custkey <= 50
    ORDER BY o_custkey, o_orderkey
    """,
    doc="Frames: running sum (rowsBetween), moving average, rangeBetween.",
)
def window_frames_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = wo.rowsBetween(-2, W.currentRow)
    rng = W.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100, W.currentRow)
    price = F.col("o_totalprice").cast(DEC)
    return (
        t["orders"]
        .where(F.col("o_custkey") <= 50)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(price).over(run).cast("double").alias("running_total"),
            F.round(
                F.sum(price).over(mov).cast("double") / F.least(F.lit(3), F.row_number().over(wo)), 4
            ).alias("moving_avg3"),
            F.count("*").over(rng).alias("near_key_count"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE OR
                         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions, COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Sessionization: lag-gap flag + running sum → session ids (batch).",
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    run = W.partitionBy("user_id").orderBy("ts").rowsBetween(W.unboundedPreceding, W.currentRow)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = t["events"].select(
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 30 * 60), 1).otherwise(0).alias("is_new_session"),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new_session").over(run))
    return (
        sessions.groupBy("user_id")
        .agg(F.countDistinct("session_id").alias("n_sessions"), F.count("*").alias("n_events"))
        .orderBy("user_id")
    )


@register(
    "window_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_last_hour,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 4) AS sum_last_hour
    FROM events
    WHERE user_id <= 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="Time-interval RANGE window frame: per-user rolling 1-hour "
    "count/sum keyed on event time, not row position — the sliding "
    "aggregation shape rows-frames can't express when events are "
    "irregularly spaced. One shuffle on the partition key.",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_id, user_id,
               COUNT(*) OVER w AS n_last_hour,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE), 4) AS sum_last_hour
        FROM events
        WHERE user_id <= 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id
        """
    )
