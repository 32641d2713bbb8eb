"""Scalar function families: string, date/time, math, array (incl.
higher-order), JSON, conditional, hash (SURVEY.md §2B "Scalar functions").

All built-in `pyspark.sql.functions` — JVM-side, inside whole-stage
codegen; no Python in the hot path. Each family gets one oracle query
exercising the representative functions against DuckDB equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT
        p_partkey,
        lower(p_name) AS name_lower,
        upper(p_brand) AS brand_upper,
        trim(p_type) AS type_trim,
        lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        substring(p_name, 1, 5) AS name_prefix,
        length(p_name) AS name_len,
        concat_ws('|', p_brand, p_type) AS brand_type,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
        regexp_extract(p_type, '([A-Z]+)', 1) AS type_word,
        reverse(p_brand) AS brand_rev,
        repeat(left(p_brand, 2), 2) AS brand_rep,
        instr(p_name, 'a') AS first_a,
        translate(p_brand, 'AB', 'ab') AS brand_tr,
        levenshtein(p_brand, 'Brand#1') AS lev_dist
    FROM part
    WHERE p_partkey <= 100
    ORDER BY p_partkey
    """,
    doc="String family: case/trim/pad/substr/concat/regex/levenshtein/...",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .where(F.col("p_partkey") <= 100)
        .select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.trim("p_type").alias("type_trim"),
            F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
            F.regexp_extract("p_type", "([A-Z]+)", 1).alias("type_word"),
            F.reverse("p_brand").alias("brand_rev"),
            F.repeat(F.substring("p_brand", 1, 2), 2).alias("brand_rep"),
            F.instr("p_name", "a").alias("first_a"),
            F.translate("p_brand", "AB", "ab").alias("brand_tr"),
            F.levenshtein("p_brand", F.lit("Brand#1")).alias("lev_dist"),
        )
        .orderBy("p_partkey")
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT
        o_orderkey,
        year(o_orderdate) AS yr,
        month(o_orderdate) AS mo,
        day(o_orderdate) AS dy,
        quarter(o_orderdate) AS qtr,
        dayofweek(o_orderdate) + 1 AS dow,
        week(o_orderdate) AS wk,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        o_orderdate + INTERVAL 90 DAY AS due_date,
        date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
        CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_ts,
        strftime(o_orderdate, '%Y-%m-%d') AS iso_day
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
    doc="Date/time family: extract/trunc/interval-add/diff/unix/format.",
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .where(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dy"),
            F.quarter("o_orderdate").alias("qtr"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.weekofyear("o_orderdate").alias("wk"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
            F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_y2k"
            ),
            F.unix_timestamp("o_orderdate").alias("unix_ts"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_math",
    oracle="""
    SELECT
        l_orderkey, l_linenumber,
        round(l_extendedprice, 1) AS price_r1,
        CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        round(abs(l_discount - 0.05), 4) AS disc_dev,
        round(power(l_quantity, 2), 4) AS qty_sq,
        round(sqrt(l_extendedprice), 4) AS price_sqrt,
        round(ln(l_extendedprice), 4) AS price_ln,
        round(log10(l_extendedprice), 4) AS price_log10,
        CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
        greatest(l_tax, l_discount) AS max_rate,
        least(l_tax, l_discount) AS min_rate,
        l_orderkey % 7 AS key_mod
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="Math family: round/floor/ceil/abs/pow/sqrt/ln/log10/sign/mod/...",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .where(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 1).alias("price_r1"),
            F.floor("l_extendedprice").alias("price_floor"),
            F.ceil("l_extendedprice").alias("price_ceil"),
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.round(F.pow("l_quantity", F.lit(2)), 4).alias("qty_sq"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.log("l_extendedprice"), 4).alias("price_ln"),
            F.round(F.log10("l_extendedprice"), 4).alias("price_log10"),
            F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
            F.greatest("l_tax", "l_discount").alias("max_rate"),
            F.least("l_tax", "l_discount").alias("min_rate"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "fn_array",
    oracle="""
    SELECT
        doc_id,
        len(string_split(text, ' ')) AS n_tokens,
        list_contains(string_split(text, ' '), 'data') AS has_data,
        string_split(text, ' ')[2] AS second_token,
        array_to_string(list_slice(string_split(text, ' '), 1, 3), '|') AS first3,
        len(list_distinct(string_split(text, ' '))) AS n_unique,
        array_to_string(list_sort(list_slice(string_split(text, ' '), 1, 3)), '|') AS first3_sorted,
        array_to_string(list_slice(string_split(text, ' '), 1, 3), '-') AS first3_joined,
        len(list_filter(string_split(text, ' '), tok -> length(tok) > 5)) AS n_long_tokens,
        array_to_string(list_transform(list_slice(string_split(text, ' '), 1, 3), tok -> upper(tok)), '|') AS first3_upper
    FROM documents
    WHERE doc_id <= 50
    ORDER BY doc_id
    """,
    doc="Array family incl. higher-order transform/filter (JVM lambdas, no UDF).",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    toks = F.split(F.col("text"), " ")
    return (
        t["documents"]
        .where(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.array_contains(toks, "data").alias("has_data"),
            F.element_at(toks, 2).alias("second_token"),
            # array outputs serialized to strings: the driver's pandas-based
            # canonicalizer cannot hash ndarray cells (CORRECTNESS_r01)
            F.array_join(F.slice(toks, 1, 3), "|").alias("first3"),
            F.size(F.array_distinct(toks)).alias("n_unique"),
            F.array_join(F.sort_array(F.slice(toks, 1, 3)), "|").alias("first3_sorted"),
            F.array_join(F.slice(toks, 1, 3), "-").alias("first3_joined"),
            F.size(F.filter(toks, lambda tok: F.length(tok) > 5)).alias("n_long_tokens"),
            F.array_join(F.transform(F.slice(toks, 1, 3), lambda tok: F.upper(tok)), "|").alias(
                "first3_upper"
            ),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_explode_wordcount",
    oracle="""
    SELECT tok, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
    doc="explode (lateral unnest) + aggregation: the word-count kernel.",
)
def fn_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(20)
    )


@register(
    "fn_json",
    oracle="""
    SELECT
        CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
        COUNT(*) AS n,
        MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
        MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    doc="JSON extraction (get_json_object / from_json) on events.props.",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        t["events"]
        .select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
        .orderBy("k_bucket")
    )


@register(
    "fn_json_schema",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="from_json with explicit schema (typed struct path, not string ops).",
)
def fn_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    parsed = F.from_json("props", "k INT")
    return (
        t["events"]
        .select("event_type", parsed.getField("k").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k"))
        .orderBy("event_type")
    )


@register(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH AS plus_3mo,
           last_day(o_orderdate)::TIMESTAMP AS month_end,
           date_diff('month', o_orderdate, TIMESTAMP '2000-06-15 00:00:00') AS months_to_ref,
           date_trunc('week', o_orderdate)::TIMESTAMP AS week_start,
           (epoch(o_orderdate)::BIGINT // 86400)::BIGINT AS epoch_days
    FROM orders
    WHERE o_orderkey <= 200
    ORDER BY o_orderkey
    """,
    doc="Date arithmetic: add_months/last_day/months-diff/week-trunc/"
    "epoch-day bucketing (the partition-key derivation toolkit).",
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .where(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 3 MONTHS")).alias("plus_3mo"),
            F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
            (
                F.months_between(
                    F.date_trunc("month", F.lit("2000-06-15").cast("timestamp")),
                    F.date_trunc("month", F.col("o_orderdate")),
                )
            ).cast("bigint").alias("months_to_ref"),
            F.date_trunc("week", "o_orderdate").alias("week_start"),
            F.floor(F.unix_timestamp("o_orderdate") / 86400).alias("epoch_days"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           array_to_string(regexp_extract_all(text, '[a-z]+a'), '|') AS a_words,
           len(regexp_extract_all(text, '[a-z]+a')) AS n_a_words,
           regexp_matches(text, 'data.*data') AS has_two_datas
    FROM documents
    WHERE doc_id <= 50
    ORDER BY doc_id
    """,
    doc="regexp_extract_all + rlike over documents.",
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .where(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            F.array_join(F.regexp_extract_all("text", F.lit("[a-z]+a"), F.lit(0)), "|").alias(
                "a_words"
            ),
            F.size(F.regexp_extract_all("text", F.lit("[a-z]+a"), F.lit(0))).alias("n_a_words"),
            F.col("text").rlike("data.*data").alias("has_two_datas"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_try_safe",
    oracle="""
    SELECT e.event_id,
           TRY_CAST(json_extract_string(e.props, '$.k') AS INT) AS k_int,
           TRY_CAST(e.event_type AS INT) AS type_as_int,
           CASE WHEN e.event_id % 5 = 0 THEN NULL
                ELSE round(e.value / (e.event_id % 5), 4) END AS safe_div
    FROM events e
    WHERE e.event_id <= 300
    ORDER BY e.event_id
    """,
    doc="ANSI-safe operations: try_cast (malformed → null), try_divide "
    "(zero → null) — the dirty-data ingestion toolkit.",
)
def fn_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    return (
        t["events"]
        .where(F.col("event_id") <= 300)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
            F.col("event_type").try_cast("int").alias("type_as_int"),
            F.round(F.try_divide(F.col("value"), F.col("event_id") % 5), 4).alias("safe_div"),
        )
        .orderBy("event_id")
    )


@register(
    "fn_struct",
    oracle="""
    SELECT doc_id,
           struct_pack(lang := lang, source := source).lang AS meta_lang,
           concat(struct_pack(lang := lang, source := source).lang, '/',
                  struct_pack(lang := lang, source := source).source) AS meta_path,
           [struct_pack(k := 'n_chars', v := n_chars)][1].v AS first_metric
    FROM documents
    WHERE doc_id <= 50
    ORDER BY doc_id
    """,
    doc="Struct columns: construction, nested field access, structs in "
    "arrays (the typed-metadata pattern). Output stays scalar — struct "
    "value serialization differs across engines.",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    meta = F.struct(F.col("lang").alias("lang"), F.col("source").alias("source"))
    return (
        t["documents"]
        .where(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            meta.getField("lang").alias("meta_lang"),
            F.concat(meta.getField("lang"), F.lit("/"), meta.getField("source")).alias("meta_path"),
            F.element_at(
                F.array(F.struct(F.lit("n_chars").alias("k"), F.col("n_chars").alias("v"))), 1
            ).getField("v").alias("first_metric"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT
        c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'debt'
             WHEN c_acctbal < 5000 THEN 'low'
             WHEN c_acctbal < 9000 THEN 'mid'
             ELSE 'high' END AS bal_band,
        coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS segment_masked,
        CASE WHEN c_nationkey % 2 = 0 THEN c_nationkey ELSE NULL END AS even_nation,
        coalesce(CASE WHEN c_nationkey % 2 = 0 THEN c_nationkey ELSE NULL END, -1) AS even_nation_filled
    FROM customer
    WHERE c_custkey <= 200
    ORDER BY c_custkey
    """,
    doc="Conditional family: when/otherwise chain, coalesce, nullif (REF R4).",
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    even = F.when(F.col("c_nationkey") % 2 == 0, F.col("c_nationkey")).otherwise(F.lit(None))
    return (
        t["customer"]
        .where(F.col("c_custkey") <= 200)
        .select(
            "c_custkey",
            F.when(F.col("c_acctbal") < 0, "debt")
            .when(F.col("c_acctbal") < 5000, "low")
            .when(F.col("c_acctbal") < 9000, "mid")
            .otherwise("high")
            .alias("bal_band"),
            F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
                "segment_masked"
            ),
            even.alias("even_nation"),
            F.coalesce(even, F.lit(-1)).alias("even_nation_filled"),
        )
        .orderBy("c_custkey")
    )


@register(
    "fn_hash",
    oracle="""
    SELECT
        doc_id,
        md5(text) AS text_md5,
        sha256(text) AS text_sha256,
        md5(lower(trim(text))) AS norm_md5
    FROM documents
    WHERE doc_id <= 50
    ORDER BY doc_id
    """,
    doc="Hash family: md5 / sha2-256 (row fingerprints for dedup & oracle).",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .where(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2("text", 256).alias("text_sha256"),
            F.md5(F.lower(F.trim("text"))).alias("norm_md5"),
        )
        .orderBy("doc_id")
    )
