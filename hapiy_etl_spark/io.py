"""Table IO: parquet scans/writes and view registration.

The driver test tables (TESTDATA.md) are one parquet file per table under
``{sf_dir}/{name}.parquet``. ``load_tables`` registers each as a temp
view so queries can be written in either the DataFrame or SQL API —
Catalyst produces the same plan. Scans get predicate pushdown + column
pruning for free because everything downstream is declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as long
# nanos (legacy.parquet.nanosAsLong) — converted to timestamp on scan.
# Verified lossless: no sub-microsecond components at any sf.
_NANOS_TS_COLS = {"events": ("ts",)}

# DataFrame handles are immutable plans — safe to share across queries.
# Memoizing skips repeated file listing + footer reads when many named
# queries hit the same tables in one session (bench, driver runs).
_TABLE_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver parquet table (normalizing nanos timestamps)."""
    key = (id(spark), sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
    tune_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        if dict(df.dtypes).get(col) == "bigint":
            # Integer `div`, NOT `/`: epoch-nanos (~1.7e18) exceed double's
            # 53-bit mantissa, so float division loses microseconds.
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Parquet timestamp[us] without a timezone annotation reads as
    # TIMESTAMP_NTZ in Spark 4 (inferTimestampNTZ). Normalize to the
    # session-timezone TIMESTAMP (session is pinned UTC): same instant,
    # but NTZ forbids cast-to-epoch (used by resample/sessionize) and
    # DuckDB's naive-timestamp oracle semantics already match UTC.
    for fld in df.schema.fields:
        if fld.dataType.typeName() == "timestamp_ntz":
            df = df.withColumn(fld.name, F.col(fld.name).cast("timestamp"))
    _TABLE_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register every driver table as a temp view; return name → DataFrame.

    Also tunes the (possibly driver-owned) session: UTC timezone and AQE
    are required for oracle parity and sane shuffles.
    """
    tune_session(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# Exchange-vs-parallelism floor for spread(): inputs below this are too
# small for map-side fan-out to beat the repartition's fixed cost (the
# threshold guards MICRO-batches; any production input whose map stage
# matters is orders of magnitude above it).
SPREAD_MIN_BYTES = 384 << 10


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Fan a narrow input out to the session's parallelism before
    CPU-heavy per-row map work (optimization guide §2.5, input skew:
    a single-file / single-row-group parquet is UNSPLITTABLE, so the
    whole map side — tokenize, shingle, explode, Arrow kernels — runs
    in ONE task no matter how many cores the session has; the driver
    testdata tables are exactly that shape).

    Scale-adaptive, not a local[32] constant: a no-op whenever the
    plan already carries >= ``defaultParallelism`` partitions (the
    production case — a 100 TB table scans as thousands of splits, and
    an extra exchange there would be pure cost). Locally it pays one
    tiny shuffle of the base rows (the documents table is ~0.6 MB at
    sf0.1) to unlock full-width map-side compute. Hash-repartitions on
    ``key_cols`` — deterministic under task retry, unlike round-robin
    (SPARK-38388) — so callers pass the row id. Only safe above
    set-semantics consumers (aggregation / join / per-row functions);
    never insert above limit()/head-style operators.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        # size floor: never pay an exchange to parallelize a trivially
        # small input (measured at sf0.1: spreading the healers'
        # micro-batches cost +0.2-0.3 s each while the full-corpus
        # builds won 0.3-2.1 s). Catalyst's optimizedPlan stats give
        # file bytes for scans (the callers' shape); an UNKNOWN size
        # reports Long.MaxValue and conservatively counts as big.
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        if int(stats.sizeInBytes()) < SPREAD_MIN_BYTES:
            return df
        if df.rdd.getNumPartitions() >= target:
            return df
    except Exception as ex:  # unplannable frame: leave untouched — but
        # say so (ADVICE r15): the probe rides a private Spark API
        # (_jdf.queryExecution().optimizedPlan().stats()); if an upgrade
        # breaks it the fan-out would otherwise silently stop firing.
        import logging

        logging.getLogger(__name__).debug(
            "spread(): size/partition probe failed (%s: %s) — leaving "
            "the frame un-spread; if this appears after a Spark upgrade "
            "the private stats API likely moved",
            type(ex).__name__,
            ex,
        )
        return df
    return df.repartition(target, *[F.col(c) for c in key_cols])


def write_partitioned(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Partitioned parquet write — the scale-out sink.

    At 100 TB, partition by a low-cardinality pruning key (date, source)
    so downstream scans prune; writers should `repartition` on the
    partition columns first to avoid small-file explosion.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_partitions_dynamic(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Idempotent partition reload: overwrite ONLY the partitions
    present in ``df``, leaving every other partition untouched
    (``partitionOverwriteMode=dynamic``). The 100 TB daily-reload
    pattern — re-running a day's job replaces that day's partitions
    atomically-per-partition instead of truncating the whole table or
    appending duplicates. Static mode (the default) would delete ALL
    partitions first. Set as a PER-WRITER option, not the session
    conf: a save/restore of the global conf races with concurrent
    writers on the same session (one writer's restore flips another's
    in-flight overwrite back to static = full-table truncate)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Bucketed table write: pay the shuffle ONCE at write time.

    Both sides of a recurring join bucketed by the join key (same
    bucket count) make every later join/aggregation on that key
    exchange-free — the planner reads co-located buckets instead of
    shuffling 100 TB per query. ``sortBy`` additionally pre-sorts
    within buckets so SortMergeJoin skips its sort. This is the
    pre-partitioning lever for fact-fact joins too big to broadcast;
    tests assert the joined plan contains no Exchange.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table_name)


def read_json_robust(
    spark: SparkSession,
    path: str,
    schema: str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """JSON scan with explicit schema and a corrupt-record policy — the
    ingestion-hardening knob a REST/log pipeline needs when upstream
    emits the occasional malformed line.

    - ``PERMISSIVE`` (default): bad lines become a row with every data
      column null and the raw line captured in ``corrupt_col`` —
      quarantine-able downstream (filter on the column, route to a
      dead-letter sink) without failing the batch;
    - ``DROPMALFORMED``: bad lines silently dropped;
    - ``FAILFAST``: abort on the first bad line.

    Explicit schema is mandatory (inference both costs an extra scan at
    scale and hides drift); the corrupt column is appended to it here.
    """
    full = schema + (f", {corrupt_col} string" if mode.upper() == "PERMISSIVE" else "")
    return (
        spark.read.schema(full)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def read_parquet_resilient(
    spark: SparkSession, path: str, ignore_corrupt: bool = True
) -> DataFrame:
    """Directory-scan that survives damaged files — the long-running
    ingestion posture: one truncated/zero-byte part file (failed
    writer, partial copy) must not fail a 100 TB backfill.

    ``ignore_corrupt=True`` maps to ``spark.sql.files.ignoreCorruptFiles``
    semantics per-read (corrupt files contribute zero rows and the scan
    continues); ``False`` restores fail-fast. Missing-file tolerance for
    snapshot-then-delete races is the sibling knob
    (``ignoreMissingFiles``), also set here.
    """
    flag = "true" if ignore_corrupt else "false"
    return (
        spark.read.option("ignoreCorruptFiles", flag)
        .option("ignoreMissingFiles", flag)
        .parquet(path)
    )
