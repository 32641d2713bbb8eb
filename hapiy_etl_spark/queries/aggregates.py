"""Aggregation depth: stats, distinct, percentiles, cube/rollup/grouping
sets, pivot, collect_list/set (SURVEY.md §2B "Aggregations").

Spark does partial (map-side) + final aggregation automatically for all
of these — at 100 TB the shuffle carries only partial states, not rows.
Decimal casts keep double sums order-independent for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register

DEC = "decimal(18,2)"


@register(
    "agg_basic_stats",
    oracle="""
    SELECT
        l_returnflag,
        COUNT(*) AS n_rows,
        COUNT(DISTINCT l_orderkey) AS n_orders,
        CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
        CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        ROUND(stddev_samp(l_quantity), 4) AS std_qty,
        ROUND(var_samp(l_quantity), 4) AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="count/countDistinct/min/max/sum/avg/stddev/variance per group.",
)
def agg_basic_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.round(F.sum(F.col("l_quantity").cast(DEC)).cast("double") / F.count("*"), 4).alias("avg_qty"),
            F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_corr_covar",
    oracle="""
    SELECT
        ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
        ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        ROUND(covar_pop(l_quantity, l_extendedprice), 4) AS covar_pop_qty_price
    FROM lineitem
    """,
    doc="Bivariate aggregates: Pearson corr, sample/population covariance.",
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_pop_qty_price"),
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="df.distinct() — hash-agg dedup of the projection.",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct().orderBy("l_returnflag", "l_linestatus")


@register(
    "agg_percentiles",
    oracle="""
    SELECT
        o_orderstatus,
        ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
        ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
        ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95,
        CAST(median(o_orderkey) AS DOUBLE) AS median_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Exact interpolated percentiles (Spark percentile ≡ DuckDB quantile_cont).",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", 0.25), 4).alias("p25"),
            F.round(F.percentile("o_totalprice", 0.50), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", 0.75), 4).alias("p75"),
            F.round(F.percentile("o_totalprice", 0.95), 4).alias("p95"),
            F.percentile("o_orderkey", 0.5).cast("double").alias("median_key"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT
        l_returnflag, l_linestatus,
        grouping(l_returnflag, l_linestatus) AS gid,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="ROLLUP hierarchy with grouping_id.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
        .orderBy("gid", F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@register(
    "agg_cube",
    oracle="""
    SELECT
        o_orderstatus, o_orderpriority,
        grouping(o_orderstatus, o_orderpriority) AS gid,
        COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    doc="CUBE over two dims with grouping_id.",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
        .orderBy("gid", F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT
        l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
    doc="Explicit GROUPING SETS via Spark SQL.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
        """
    )


@register(
    "agg_collect",
    oracle="""
    SELECT
        n_regionkey,
        array_to_string(list_sort(list(DISTINCT n_name)), '|') AS nations,
        COUNT(*) AS n
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    doc="collect_set sorted for determinism (array-valued aggregation).",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("nation",))
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(
            # serialized: ndarray cells crash the driver's canonicalizer
            F.array_join(F.sort_array(F.collect_set("n_name")), "|").alias("nations"),
            F.count("*").alias("n"),
        )
        .orderBy("n_regionkey")
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT
        l_returnflag,
        CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_O,
        CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Pivot (conditional aggregation) with fixed value list.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.coalesce(F.sum(F.col("l_quantity").cast(DEC)), F.lit(0).cast("decimal(28,2)")))
        .select(
            "l_returnflag",
            F.col("O").cast("double").alias("qty_O"),
            F.col("F").cast("double").alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_first_last_ordered",
    oracle="""
    WITH ranked AS (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn_asc,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_desc
        FROM orders
    )
    SELECT o_custkey,
           MIN(CASE WHEN rn_asc = 1 THEN o_orderkey END) AS first_order,
           MIN(CASE WHEN rn_desc = 1 THEN o_orderkey END) AS last_order,
           COUNT(*) AS n_orders
    FROM ranked
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8
    ORDER BY o_custkey
    """,
    doc="first/last by explicit order (min_by/max_by) + HAVING.",
)
def agg_first_last_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    # min_by/max_by tie-break deterministically on a unique struct key
    key = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_orderkey", key).alias("first_order"),
            F.max_by("o_orderkey", key).alias("last_order"),
            F.count("*").alias("n_orders"),
        )
        .where(F.col("n_orders") >= 8)
        .orderBy("o_custkey")
    )


@register(
    "agg_bitwise_boolean",
    oracle="""
    SELECT event_type,
           bit_and(event_id % 256) AS band,
           bit_or(event_id % 256) AS bor,
           bit_xor(event_id % 256) AS bxor,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 90) AS any_large
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Bitwise (bit_and/or/xor) and boolean (every/any) aggregates.",
)
def agg_bitwise_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    b = F.col("event_id") % 256
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.bit_and(b).alias("band"),
            F.bit_or(b).alias("bor"),
            F.bit_xor(b).alias("bxor"),
            F.every(F.col("value") > 0).alias("all_positive"),
            F.some(F.col("value") > 90).alias("any_large"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_approx_count_distinct",
    oracle=None,  # HLL sketches differ across engines — rows-only check;
    # exactness invariant asserted in tests/test_aggregates.py
    doc="approx_count_distinct (HLL++) — the 100 TB-scale distinct-count path. Approximate by design (rows-only, FINAL): the estimate is engine-private sketch state; the driver-visible guarantee is the relative standard deviation rsd=0.01 passed here, asserted against exact COUNT DISTINCT in tests/test_aggregates.py::test_approx_count_distinct_within_rsd (observed error well inside 3*rsd at both oracle scales).",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@register(
    "agg_percentile_approx",
    oracle="""
    SELECT quantile_disc(o_totalprice, 0.25) AS approx_q1,
           quantile_disc(o_totalprice, 0.5)  AS approx_median,
           quantile_disc(o_totalprice, 0.99) AS approx_q99
    FROM orders
    """,
    doc="percentile_approx (Greenwald-Khanna) — approximate quantiles at "
    "scale. ORACLE-CHECKED via the sketch's exact regime (r5 VERDICT "
    "task 8): with accuracy >= row count the GK rank error is < 1, so "
    "the returned element equals PERCENTILE_DISC exactly (verified "
    "empirically at both oracle scales, incl. the even-count median). "
    "At 100 TB accuracy is the memory/error dial — the default 10000 "
    "bounds rank error to n/10000 with O(accuracy) sketch state; the "
    "GK error bound at small accuracy stays asserted in "
    "tests/test_aggregates.py.",
)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].agg(
        F.percentile_approx("o_totalprice", 0.25, 1000000).alias("approx_q1"),
        F.percentile_approx("o_totalprice", 0.5, 1000000).alias("approx_median"),
        F.percentile_approx("o_totalprice", 0.99, 1000000).alias("approx_q99"),
    )


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           regr_count(l_extendedprice, l_quantity) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Linear-regression aggregate family (regr_slope/intercept/r2/"
    "count): price-vs-quantity fit per return flag — single-pass "
    "algebraic aggregates, partial+final merge like any sum.",
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
            F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_totalprice > 100000) AS DOUBLE) AS big_total,
           COUNT(*) FILTER (WHERE o_custkey % 2 = 0) AS n_even_cust
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="FILTER-clause aggregates (count_if / conditional sums): "
    "per-aggregate predicates in one pass over the data — no self-joins "
    "or repeated scans for multi-condition rollups.",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_total"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.sum(
                F.when(
                    F.col("o_totalprice") > 100000,
                    F.col("o_totalprice").cast("decimal(18,2)"),
                )
            )
            .cast("double")
            .alias("big_total"),
            F.count_if(F.col("o_custkey") % 2 == 0).alias("n_even_cust"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_kmv_distinct_sketch",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS distinct_users_est
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'click|purchase union',
           CAST(COUNT(DISTINCT user_id) AS DOUBLE)
    FROM events WHERE event_type IN ('click', 'purchase')
    UNION ALL
    SELECT 'click&purchase intersect', CAST(
          (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'click')
        + (SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = 'purchase')
        - (SELECT COUNT(DISTINCT user_id) FROM events
           WHERE event_type IN ('click', 'purchase')) AS DOUBLE)
    ORDER BY event_type
    """,
    doc="KMV (theta-style) mergeable distinct sketches per event_type: "
    "per-group estimate, pairwise union/intersection estimates between "
    "the two largest groups — the set-operation sketch capability "
    "(operators/sketches.py) surfaced as a query. ORACLE-CHECKED via "
    "the sketch's exact regime (r5 VERDICT task 8): with k=2048 far "
    "above the per-group distinct-user count at oracle scale, the "
    "sketch IS the distinct value set and every estimate — including "
    "inclusion-exclusion intersection — equals COUNT(DISTINCT) "
    "exactly, so the estimator pipeline hash-matches plain SQL. The "
    "approximate regime's ~1/sqrt(k-2) error bound and merge "
    "idempotence stay pytest-verified at small k "
    "(tests/test_scd2_maintenance.py::test_kmv_sketch_accuracy_and_set_ops).",
)
def agg_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hapiy_etl_spark.operators.sketches import (
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_sketch,
        kmv_union_estimate,
    )

    t = load_tables(spark, sf_dir, ("events",))
    k = 2048
    sk = kmv_sketch(t["events"], ["event_type"], "user_id", k=k)
    per_group = sk.select(
        "event_type", F.round(kmv_estimate(F.col("sketch"), k), 2).alias("distinct_users_est")
    )
    a = sk.where(F.col("event_type") == "click").select(F.col("sketch").alias("sa"))
    b = sk.where(F.col("event_type") == "purchase").select(F.col("sketch").alias("sb"))
    pair = a.crossJoin(b)
    union_row = pair.select(
        F.lit("click|purchase union").alias("event_type"),
        F.round(kmv_union_estimate(F.col("sa"), F.col("sb"), k), 2).alias(
            "distinct_users_est"
        ),
    )
    inter_row = pair.select(
        F.lit("click&purchase intersect").alias("event_type"),
        F.round(kmv_intersect_estimate(F.col("sa"), F.col("sb"), k), 2).alias(
            "distinct_users_est"
        ),
    )
    return per_group.unionByName(union_row).unionByName(inter_row).orderBy("event_type")


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS distinct_customers
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="EXACT distinct counting via mergeable roaring-style bitmaps "
    "(bitmap_construct_agg over bit positions, bucketed by "
    "bitmap_bucket_number): each (group, bucket) reduces to a <=4KB "
    "bitmap, buckets merge associatively (map-side partial agg), and "
    "the final count is a sum of bitmap_count per bucket. The exact "
    "counterpart of the HLL sketch path: billions of int keys shuffle "
    "as fixed-size bitmaps, not key sets. Oracle is plain "
    "COUNT(DISTINCT) — proving the bitmap rollup loses nothing.",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    per_bucket = (
        t["orders"]
        .groupBy(
            "o_orderpriority",
            F.bitmap_bucket_number(F.col("o_custkey")).alias("bkt"),
        )
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(F.col("o_custkey"))
            ).alias("bm")
        )
    )
    return (
        per_bucket.groupBy("o_orderpriority")
        .agg(
            F.sum(F.bitmap_count(F.col("bm")))
            .cast("long")
            .alias("distinct_customers")
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_listagg_disc",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
               AS statuses,
           quantile_disc(o_totalprice, 0.25) AS p25_price,
           quantile_disc(o_totalprice, 0.50) AS p50_price,
           quantile_disc(o_totalprice, 0.75) AS p75_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="SQL:2023 ordered-set aggregates: LISTAGG(DISTINCT .. ) WITHIN "
    "GROUP (deterministic ordered concatenation) and PERCENTILE_DISC "
    "(discrete quantiles — returns an actual data element, so "
    "cross-engine equality is exact with no float-interpolation seam).",
)
def agg_listagg_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, '|')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p25_price,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p50_price,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY o_totalprice)
                   AS p75_price,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@register(
    "agg_winsorized_stats",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               quantile_disc(value, 0.05) AS lo,
               quantile_disc(value, 0.95) AS hi
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_raw,
           CAST(SUM(CAST(least(greatest(e.value, b.lo), b.hi)
                         AS DECIMAL(18,2))) AS DOUBLE) AS sum_winsorized,
           COUNT(*) FILTER (e.value < b.lo) AS n_clipped_low,
           COUNT(*) FILTER (e.value > b.hi) AS n_clipped_high,
           ROUND(b.lo, 2) AS p05,
           ROUND(b.hi, 2) AS p95
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type, b.lo, b.hi
    ORDER BY e.event_type
    """,
    doc="Winsorized robust statistics per group: clip values at the "
    "5th/95th percentile before aggregating — the outlier-hardening "
    "step of feature engineering. Bounds use PERCENTILE_DISC (exact "
    "data elements, no interpolation), so clipped values stay exact "
    "2-decimal inputs and the sums are seam-free decimal arithmetic. "
    "Plan: tiny per-group bounds aggregate broadcast back onto the "
    "fact scan — two passes, no window over the full data.",
)
def agg_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    bounds = spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS hi
        FROM events GROUP BY event_type
        """
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        t["events"]
        .join(F.broadcast(bounds), "event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_raw"),
            F.sum(clipped.cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_winsorized"),
            F.count_if(F.col("value") < F.col("lo")).alias("n_clipped_low"),
            F.count_if(F.col("value") > F.col("hi")).alias("n_clipped_high"),
        )
        .select(
            "event_type",
            "n",
            "sum_raw",
            "sum_winsorized",
            "n_clipped_low",
            "n_clipped_high",
            F.round("lo", 2).alias("p05"),
            F.round("hi", 2).alias("p95"),
        )
        .orderBy("event_type")
    )


@register(
    "incremental_agg_merge",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MIN(ts) AS first_ts,
           MAX(ts) AS last_ts
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Incremental materialized-aggregate maintenance: the standing "
    "state (events before the watermark date) and the new batch (after "
    "it) are aggregated SEPARATELY to algebraic partials "
    "(count/sum/min/max), then merged by re-aggregating the two partial "
    "rows — never rescanning history. The oracle is the full-table "
    "aggregate, proving merge(partial(old), partial(new)) == agg(all): "
    "the algebraic-mergeability contract that makes streaming "
    "complete-mode, partial shuffles, and incremental view refresh "
    "work. Decimal sums keep the merge exact.",
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    cutoff = "2024-01-15 00:00:00"

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_dec"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )

    # null-ts rows route to the state side: a bare `<` would drop them
    # from BOTH partials while the full-table oracle counts them,
    # breaking the merge(partial,partial) == agg(all) contract
    state = partial(
        t["events"].where((F.col("ts") < F.lit(cutoff)) | F.col("ts").isNull())
    )
    batch = partial(t["events"].where(F.col("ts") >= F.lit(cutoff)))
    return (
        state.unionByName(batch)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").cast("double").alias("sum_value"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_approx_top_k_freq",
    oracle="""
    WITH base AS (
        SELECT event_type, user_id FROM events
        UNION ALL SELECT 'ALL', user_id FROM events
    ),
    cnt AS (SELECT event_type, user_id, COUNT(*) AS cnt FROM base GROUP BY 1, 2),
    thr AS (SELECT event_type, 1.3 * AVG(cnt) AS t FROM cnt GROUP BY 1)
    SELECT c.event_type, c.user_id, c.cnt
    FROM cnt c JOIN thr USING (event_type)
    WHERE c.cnt >= t
    ORDER BY event_type, cnt DESC, user_id
    """,
    doc="Frequent-items (heavy-hitter) detection via Spark 4's mergeable "
    "approx_top_k sketch family: per-group sketches built with "
    "approx_top_k_accumulate (map-side partial agg — the shuffle "
    "carries fixed-size sketches, not user_id rows), merged across "
    "groups into a global 'ALL' sketch with approx_top_k_combine (the "
    "rollup-without-rescan path), then exploded by "
    "approx_top_k_estimate and filtered to users whose count exceeds "
    "1.3x the per-group mean. ORACLE-CHECKED via the sketch's exact "
    "regime (the agg_kmv_distinct_sketch pattern): maxItemsTracked=1e6 "
    "far exceeds distinct users at oracle scale, so every tracked "
    "count is exact and the result hash-matches plain GROUP BY "
    "counting. The approximate regime (small maxItemsTracked on a "
    "skewed stream, where the sketch keeps only the heads) is "
    "pytest-verified: tests/test_aggregates.py::"
    "test_approx_top_k_small_sketch_keeps_true_heavy_hitter. At 100 TB "
    "you size maxItemsTracked to the survivor budget (e.g. 1e4) and "
    "the same plan ships kilobyte sketches instead of terabyte "
    "key-count shuffles.",
)
def agg_approx_top_k_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select("event_type", "user_id")
    per = ev.groupBy("event_type").agg(
        F.expr("approx_top_k_accumulate(user_id, 1000000)").alias("sk")
    )
    glob = per.agg(F.expr("approx_top_k_combine(sk, 1000000)").alias("sk")).select(
        F.lit("ALL").alias("event_type"), "sk"
    )
    est = (
        per.unionByName(glob)
        .select(
            "event_type",
            F.explode(F.expr("approx_top_k_estimate(sk, 1000000)")).alias("e"),
        )
        .select(
            "event_type",
            F.col("e.item").alias("user_id"),
            F.col("e.count").cast("bigint").alias("cnt"),
        )
    )
    thr = est.groupBy("event_type").agg((F.avg("cnt") * 1.3).alias("t"))
    return (
        est.join(F.broadcast(thr), "event_type")
        .where(F.col("cnt") >= F.col("t"))
        .select("event_type", "user_id", "cnt")
        .orderBy("event_type", F.desc("cnt"), "user_id")
    )
