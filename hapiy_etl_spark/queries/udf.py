"""UDF/UDAF/UDTF surface (SURVEY.md §2B): vectorized pandas_udf as the
default extension point, applyInPandas for grouped-map (UDAF-shaped)
work, Spark 4 UDTF, and map-typed column functions.

The Python stages compute deterministic math, so each gets a real
DuckDB oracle — the check proves the Arrow round-trip preserves values,
not just that the query runs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hapiy_etl_spark.io import load_tables
from hapiy_etl_spark.registry import register


@F.pandas_udf(T.DoubleType())
def discounted_charge(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) charge computation — the pandas_udf
    extension point; ~10-100x over row-at-a-time Python UDFs."""
    return price * (1.0 - discount) * (1.0 + tax)


@register(
    "udf_pandas_vectorized",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 10000) / 10000 AS charge
    FROM lineitem
    WHERE l_orderkey <= 500
    ORDER BY l_orderkey, l_linenumber
    """,
    doc="pandas_udf (Arrow-vectorized scalar): numeric round-trip parity "
    "proves the Arrow transfer is exact. Truncation (floor) instead of "
    "round: products of 2-decimal prices constantly land on x.xxxx5 "
    "ties where Spark (shortest-repr HALF_UP) and DuckDB (binary-exact) "
    "round differently; floor is bit-identical in both.",
)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .where(F.col("l_orderkey") <= 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.floor(discounted_charge("l_extendedprice", "l_discount", "l_tax") * 10000) / 10000).alias(
                "charge"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                 / NULLIF(STDDEV_SAMP(o_totalprice) OVER w, 0), 4) AS zscore
    FROM orders
    WHERE o_custkey <= 100
    WINDOW w AS (PARTITION BY o_custkey)
    ORDER BY o_custkey, o_orderkey
    """,
    doc="applyInPandas grouped-map (UDAF-shaped): per-customer z-score "
    "normalization; one pandas DataFrame per group, Arrow both ways.",
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("orders",))

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["o_totalprice"].std(ddof=1)
        mean = pdf["o_totalprice"].mean()
        z = (pdf["o_totalprice"] - mean) / std if std and std > 0 else pd.Series([None] * len(pdf))
        return pd.DataFrame(
            {
                "o_custkey": pdf["o_custkey"],
                "o_orderkey": pdf["o_orderkey"],
                "zscore": z.round(4),
            }
        )

    return (
        t["orders"]
        .where(F.col("o_custkey") <= 100)
        .groupBy("o_custkey")
        .applyInPandas(zscore, "o_custkey long, o_orderkey long, zscore double")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value * value), 4) AS sum_sq
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="mapInPandas partition-batch iterator: per-batch numpy math, then "
    "a normal groupBy — the custom-operator escape hatch.",
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))

    def square(batches):
        for pdf in batches:
            yield pd.DataFrame({"event_type": pdf["event_type"], "value_sq": pdf["value"] ** 2})

    squared = t["events"].mapInPandas(square, "event_type string, value_sq double")
    return (
        squared.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value_sq"), 4).alias("sum_sq"))
        .orderBy("event_type")
    )


@register(
    "udtf_explode_ranges",
    oracle="""
    SELECT r_regionkey,
           unnest(range(0, r_regionkey + 1)) AS i,
           r_regionkey * 10 + unnest(range(0, r_regionkey + 1)) AS coded
    FROM region
    ORDER BY r_regionkey, i
    """,
    doc="Spark 4 Python UDTF: one input row → variable output rows "
    "(table function), registered into SQL.",
)
def udtf_explode_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("region",))

    from pyspark.sql.functions import udtf

    @udtf(returnType="i int, coded int")
    class ExpandRange:
        def eval(self, key: int):
            for i in range(key + 1):
                yield i, key * 10 + i

    spark.udtf.register("expand_range", ExpandRange)
    return spark.sql(
        """
        SELECT r_regionkey, t.i, t.coded
        FROM region, LATERAL expand_range(r_regionkey) t
        ORDER BY r_regionkey, t.i
        """
    )


@register(
    "fn_map",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               MAP(['lang', 'source'], [lang, source]) AS meta
        FROM documents WHERE doc_id <= 100
    )
    SELECT doc_id,
           array_to_string(list_sort(map_keys(meta)), '|') AS ks,
           meta['lang'][1] AS lang_val,  -- DuckDB map extract yields a list
           cardinality(meta) AS n_entries
    FROM m
    ORDER BY doc_id
    """,
    doc="Map-typed columns: create/map_keys/element_at/size.",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    meta = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return (
        t["documents"]
        .where(F.col("doc_id") <= 100)
        .select(
            "doc_id",
            # serialized: ndarray cells crash the driver's canonicalizer
            F.array_join(F.sort_array(F.map_keys(meta)), "|").alias("ks"),
            F.element_at(meta, "lang").alias("lang_val"),
            F.size(meta).alias("n_entries"),
        )
        .orderBy("doc_id")
    )


@register(
    "fn_map_explode",
    oracle="""
    SELECT doc_id, u.key AS meta_key, u."value" AS meta_value
    FROM (
        SELECT doc_id, unnest(map_entries(MAP(['lang','source'], [lang, source]))) AS u
        FROM documents WHERE doc_id <= 20
    )
    ORDER BY doc_id, meta_key
    """,
    doc="explode over map entries (map → rows).",
)
def fn_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("documents",))
    meta = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return (
        t["documents"]
        .where(F.col("doc_id") <= 20)
        .select("doc_id", F.explode(meta).alias("meta_key", "meta_value"))
        .orderBy("doc_id", "meta_key")
    )


@register(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, CAST(val AS DOUBLE) AS val
    FROM (
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
    )
    WHERE c_custkey <= 100
    ORDER BY c_custkey, metric
    """,
    doc="Unpivot (wide→long) via DataFrame unpivot / SQL stack.",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("customer",))
    return (
        t["customer"]
        .where(F.col("c_custkey") <= 100)
        .select("c_custkey", F.col("c_acctbal").alias("acctbal"), F.col("c_nationkey").cast("double").alias("nationkey"))
        .unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")
        .orderBy("c_custkey", "metric")
    )


@register(
    "sample_deterministic",
    oracle="""
    SELECT o_orderkey FROM orders
    WHERE (('0x' || substr(md5('s42:' || CAST(o_orderkey AS VARCHAR)), 1, 14))::BIGINT
           % 1000000 + 1) / 1000001.0 < 0.1
    ORDER BY o_orderkey
    """,
    doc="Seeded ~10% Bernoulli sample via the repo's portable "
    "md5-uniform (hash of seed||key → uniform in (0,1], keep u < p) "
    "instead of Spark's engine-specific sample() RNG: the kept set is "
    "identical across engines, partitionings, and reruns — exactly "
    "what a reproducible training-data subsample needs. Map-only "
    "filter, no RNG-state coordination, pushdown-friendly.",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hapiy_etl_spark.functions import md5_uniform

    t = load_tables(spark, sf_dir, ("orders",))
    u = md5_uniform(F.concat(F.lit("s42:"), F.col("o_orderkey").cast("string")))
    return t["orders"].where(u < 0.1).select("o_orderkey").orderBy("o_orderkey")


@register(
    "fn_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(*) FILTER (WHERE json_extract_string(props, '$.missing') IS NULL) AS n_no_missing
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Spark 4 VARIANT type over semi-structured JSON: parse_json once "
    "into a binary variant (no per-access re-parse, unlike repeated "
    "get_json_object), then typed variant_get extraction feeding plain "
    "aggregates. The open-schema path for event property columns.",
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    missing = F.expr("variant_get(parse_json(props), '$.missing', 'string')")
    return (
        t["events"]
        .select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_if(F.col("m").isNull()).alias("n_no_missing"),
        )
        .orderBy("event_type")
    )


@register(
    "timeseries_ewma",
    oracle="""
    WITH RECURSIVE ev AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events WHERE user_id < 200
    ),
    r AS (
        SELECT user_id, event_id, seq, value, value AS ewma
        FROM ev WHERE seq = 1
        UNION ALL
        SELECT ev.user_id, ev.event_id, ev.seq, ev.value,
               0.3 * ev.value + 0.7 * r.ewma
        FROM r JOIN ev ON ev.user_id = r.user_id AND ev.seq = r.seq + 1
    )
    SELECT user_id, event_id, seq,
           CAST(floor(ewma * 1000.0 + 0.5) AS BIGINT) AS ewma_milli
    FROM r
    ORDER BY user_id, seq
    """,
    doc="Per-key EWMA smoothing (alpha=0.3, e_t = 0.3*x_t + 0.7*e_{t-1}) "
    "via applyInPandas — the grouped-map shape is how genuinely "
    "sequential per-key state (inexpressible as a window frame) "
    "distributes: one shuffle on the key, arbitrary-length recursion "
    "inside the group. Cross-engine equality is engineered, not hoped "
    "for: the oracle is a recursive CTE running the SAME IEEE op "
    "sequence (0.3*x + 0.7*e), and the output projects to integer "
    "milli-units with floor(x*1000+0.5) in both engines — decimal "
    "ROUND at any precision is unstable here because 2-decimal inputs "
    "with decimal coefficients land EXACTLY on .xxxx5 boundaries "
    "(observed: 83.24825), where Spark/DuckDB/pandas each break ties "
    "differently.",
)
def timeseries_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("events",))

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        v = pdf["value"].to_numpy(dtype="float64")
        out = np.empty(len(v))
        e = v[0]
        out[0] = e
        for i in range(1, len(v)):
            # same literal coefficients and op order as the oracle CTE
            e = 0.3 * v[i] + 0.7 * e
            out[i] = e
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "seq": pdf.index + 1,
                # nullable Int64: a null/NaN input poisons the running
                # EWMA exactly like the oracle's NULL propagation —
                # plain astype(int64) would turn NaN into INT64_MIN
                "ewma_milli": pd.Series(
                    np.floor(out * 1000.0 + 0.5)
                ).astype("Int64"),
            }
        )

    return (
        t["events"]
        .where(F.col("user_id") < 200)
        .select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            ewma, "user_id long, event_id long, seq long, ewma_milli long"
        )
        .orderBy("user_id", "seq")
    )


@F.pandas_udf(T.DoubleType())
def _median_cents(price: pd.Series) -> float:
    """Series->scalar (GROUPED_AGG) pandas UDF: median price in integer
    cents. Cents are exact integers in float64 and the median of an
    (half-)integer multiset is exactly representable, so the result is
    order-independent and bit-equal across engines — UDAF parity can be
    value-checked, not just row-counted."""
    import numpy as np

    return float(np.median(np.rint(price.to_numpy() * 100.0)))


@F.pandas_udf(T.LongType())
def _n_rows(price: pd.Series) -> int:
    """Group size — Spark forbids mixing GROUPED_AGG pandas UDFs with
    JVM aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    count rides the same Arrow batch."""
    return len(price)


@F.pandas_udf(T.DoubleType())
def _mad_cents(price: pd.Series) -> float:
    """Median absolute deviation in cents — genuinely UDAF-shaped (two
    dependent passes over the group: median, then median of distances);
    no single built-in aggregate expresses it."""
    import numpy as np

    cents = np.rint(price.to_numpy() * 100.0)
    return float(np.median(np.abs(cents - np.median(cents))))


@register(
    "udf_grouped_agg_mad",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, round(l_extendedprice * 100) AS cents
        FROM lineitem
    ),
    m AS (SELECT l_returnflag, median(cents) AS med FROM c GROUP BY 1)
    SELECT c.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(m.med) AS median_cents,
           median(abs(c.cents - m.med)) AS mad_cents
    FROM c JOIN m ON c.l_returnflag = m.l_returnflag
    GROUP BY c.l_returnflag
    ORDER BY c.l_returnflag
    """,
    doc="pandas_udf GROUPED_AGG (Series->scalar) — the third pandas-UDF "
    "shape next to vectorized-scalar and grouped-map: per-group median "
    "and median-absolute-deviation of price, computed in exact integer "
    "cents so the Arrow-batched Python aggregate is value-identical to "
    "the oracle's two-pass SQL (median of (half-)integers is exactly "
    "representable; no float-summation order seam). Spark runs it as a "
    "real aggregate: partial groups shuffle, the UDF sees each group "
    "once.",
)
def udf_grouped_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            _n_rows("l_extendedprice").alias("n"),
            _median_cents("l_extendedprice").alias("median_cents"),
            _mad_cents("l_extendedprice").alias("mad_cents"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "udtf_table_argument",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT) AS span_s
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Spark 4 UDTF with a TABLE argument (PARTITION BY ... ORDER BY "
    "...): the stateful table-function form — eval() accumulates over "
    "one partition's rows in order, terminate() emits the partition "
    "summary. Each user's rows are co-located and sorted by the engine "
    "before the UDTF sees them (one shuffle, exactly like a groupBy); "
    "this is the SQL-surfaced twin of applyInPandas. Epochs are "
    "floored per-endpoint in BOTH engines (floor-then-diff != "
    "diff-then-floor on fractional seconds), and the timestamp is cast "
    "to epoch seconds INSIDE the table argument: PySpark materializes "
    "TimestampType as naive datetimes via the SYSTEM timezone "
    "(datetime.fromtimestamp), so datetime math inside a UDTF is off "
    "by the DST delta on non-UTC hosts — integers can't drift.",
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    load_tables(spark, sf_dir, ("events",))

    @udtf(returnType="user_id bigint, n_events bigint, span_s bigint")
    class PerUserStats:
        def __init__(self):
            self.uid = None
            self.n = 0
            self.first = None
            self.last = None

        def eval(self, row):
            self.uid = row["user_id"]
            self.n += 1
            if self.first is None:
                self.first = row["ts_s"]  # ORDER BY: first row is min
            self.last = row["ts_s"]

        def terminate(self):
            if self.uid is None:
                return
            yield self.uid, self.n, self.last - self.first

    spark.udtf.register("per_user_stats", PerUserStats)
    # CAST(ts AS LONG) = floor(epoch seconds), matching the oracle's
    # floor(epoch(...)) per endpoint
    return spark.sql(
        """
        SELECT * FROM per_user_stats(
            TABLE(SELECT user_id, CAST(ts AS LONG) AS ts_s FROM events)
            PARTITION BY user_id ORDER BY ts_s
        )
        ORDER BY user_id
        """
    )


@register(
    "udtf_polymorphic_split",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS tok1,
           split_part(text, ' ', 2) AS tok2,
           split_part(text, ' ', 3) AS tok3
    FROM documents
    ORDER BY doc_id
    """,
    doc="Spark 4 polymorphic UDTF: analyze() computes the output schema "
    "AT PLAN TIME from the constant column-count argument (k=3 → "
    "columns tok1..tok3), so one table function serves any width "
    "without per-width registrations — the dynamic-schema capability "
    "classic engines get from macros/codegen. The TABLE argument has "
    "no PARTITION BY, so rows stream through eval() wherever they "
    "already live: a map-side operator, zero shuffle, same plan shape "
    "at 100 TB. Missing positions emit '' to match SQL split_part "
    "semantics in both engines.",
)
def udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    load_tables(spark, sf_dir, ("documents",))

    @udtf
    class SplitToCols:
        @staticmethod
        def analyze(
            row: AnalyzeArgument, delim: AnalyzeArgument, k: AnalyzeArgument
        ) -> AnalyzeResult:
            if not isinstance(k.value, int) or k.value <= 0:
                raise ValueError("k must be a positive integer literal")
            schema = StructType().add("doc_id", LongType())
            for i in range(k.value):
                schema = schema.add(f"tok{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, row, delim: str, k: int):
            parts = (row["text"] or "").split(delim)
            yield (
                row["doc_id"],
                *[parts[i] if i < len(parts) else "" for i in range(k)],
            )

    spark.udtf.register("split_to_cols", SplitToCols)
    return spark.sql(
        """
        SELECT * FROM split_to_cols(
            TABLE(SELECT doc_id, text FROM documents), ' ', 3
        )
        ORDER BY doc_id
        """
    )
