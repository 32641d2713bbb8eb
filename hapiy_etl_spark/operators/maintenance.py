"""Table maintenance: small-file compaction and stratified sampling.

At 100 TB the silent killers are file-count explosions (streaming
sinks, per-batch appends) and unbalanced samples; both fixes are
one-liners that belong in the operator library so jobs reach for them.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def auto_compact(
    table,
    max_dirs: int = 16,
    vacuum_keep_last: int | None = None,
    vacuum_min_age_s: float = 3600.0,
    **optimize_kw,
) -> int | None:
    """Threshold compaction policy for a TxTable: OPTIMIZE when the
    current snapshot has accumulated ``max_dirs`` or more data dirs,
    else do nothing. Returns the new version when it compacted, None
    when under threshold.

    This is the missing half of every per-epoch streaming sink
    (``foreach_batch_tx_append`` and family land one dir per
    micro-batch): without a policy, reader planning cost and the
    manifest grow O(epochs) forever. Safe to run mid-stream from the
    sink itself — optimize commits are row-preserving, so the CDC
    change stream delivers them as no-data micro-batches
    (sources/txtable_source.py), replay-detection state carries
    forward through the optimize commit (txstore.last_stream_state),
    and pruning metadata survives as union stats/blooms. Forward
    ``zorder_by=`` / ``partition_by=`` when the table relies on
    clustering or a Hive layout — a bare optimize would flatten it
    (TxTable.optimize documents the hazard).

    ``cluster_by=`` dispatches to ``optimize_clustered`` instead: the
    snapshot is re-sorted into key-tight dirs with per-dir stats, so a
    bucket-keyed INDEX (signature band buckets, sign buckets, IVF
    cells, term buckets) regains ``where_in`` dir pruning after the
    policy fires — the maintenance half of every pruned streaming-sink
    read (VERDICT r9).

    ``vacuum_keep_last`` adds the RETENTION half (VERDICT r9 item 3):
    compaction bounds the LIVE snapshot's dirs but copy-on-write
    leaves every superseded dir on disk until a vacuum — an always-on
    stream otherwise grows storage O(epochs) forever. When set, each
    policy compaction is followed by ``table.vacuum(keep_last=...,
    min_age_s=vacuum_min_age_s)``. Size the keep window ABOVE the
    maximum version lag of any CDC consumer of the table: a consumer
    inside the window resumes normally across the compaction (its
    manifests and their dirs survive), one beyond it gets the loud
    vacuumed-offset resync error instead of silent data loss
    (sources/txtable_source.py) — never raw misses. ``min_age_s``
    keeps the concurrency guard: in-flight writers spool data dirs
    before their commit, so never reclaim anything younger than the
    longest plausible write."""
    if table.n_dirs() < max_dirs:
        return None
    if "cluster_by" in optimize_kw:
        v = table.optimize_clustered(**optimize_kw)
    else:
        v = table.optimize(**optimize_kw)
    if vacuum_keep_last is not None:
        table.vacuum(keep_last=vacuum_keep_last, min_age_s=vacuum_min_age_s)
    return v


def sized_cluster_dirs(
    index_rows: int,
    n_buckets: int,
    max_dirs: int,
    target_rows_per_dir: int = 4_000_000,
    floor: int | None = None,
) -> int:
    """Clustered-compaction dir count for a bucket-keyed index, derived
    from its CURRENT size (VERDICT r10 item 4 — the sinks used to pin
    ``max_dirs // 2`` forever, so production had to hand-tune).

    The rule: enough dirs that each holds ~``target_rows_per_dir``
    rows, growing with the index until ONE DIR PER BUCKET
    (``n_buckets``) — past that point more dirs cannot improve bucket
    pruning (a single bucket would span dirs and every probe of it
    reads them all), so the count pins there and dirs grow in bytes
    instead. A trickle tick probing ``n_bands`` buckets therefore
    reads ≤ ``min(n_dirs, n_bands)`` dirs at EVERY index size —
    constant, not constant-fraction (the growth harness's
    ``narrow_tick_dirs_read`` column pins this).

    ``floor`` (default ``max_dirs // 2``, the pre-r11 behavior) keeps
    early compactions from collapsing a small index into one dir and
    losing pruning before the rows-based term kicks in. The result is
    capped at ``max_dirs - max(1, max_dirs // 4)`` — a quarter-headroom
    below the fire threshold, not just one dir (ADVICE r11): landing at
    ``max_dirs - 1`` would mean a SINGLE append puts the table back at
    the ``>= max_dirs`` threshold and the full O(index) clustered
    rewrite re-fires on EVERY tick. With quarter headroom the policy
    keeps its amortized every-``max_dirs/4``-epochs cadence even when
    the rows term saturates. Callers should size ``max_dirs >
    n_buckets`` when they want the one-dir-per-bucket steady state to
    be reachable, and ``max_dirs`` must be >= 2 (a threshold of 1
    cannot leave any post-compaction headroom)."""
    if max_dirs < 2:
        raise ValueError(f"max_dirs must be >= 2, got {max_dirs}")
    cap = max_dirs - max(1, max_dirs // 4)
    if floor is None:
        floor = max(1, max_dirs // 2)
    by_rows = max(1, -(-int(index_rows) // max(1, int(target_rows_per_dir))))
    return max(1, min(max(floor, by_rows), n_buckets, cap))


def reconcile_index_deletes(
    corpus, index, on: str, corpus_on: str | None = None, max_keys: int = 100_000
) -> int:
    """Crash-recovery / drift repair for a derived index after corpus
    erasures: delete index rows whose key no longer exists in the
    corpus. A takedown is two ``delete_keys`` commits (corpus, then
    each index) with no cross-table transaction — a crash between them
    leaves ORPHANED postings that a probe would still surface. This
    reconciler recomputes the orphan set from table contents (distinct
    index keys anti-joined against distinct corpus keys — narrow id
    columns, one shuffle each, orphan count bounded by erasures) and
    erases it through the same bloom-pruned ``delete_keys`` path, so
    it is IDEMPOTENT: a second run finds nothing and commits nothing.
    NULL index keys are ignored (they can never match a corpus key).
    ``on`` names the INDEX's key column; ``corpus_on`` the corpus's
    when it differs (e.g. signature postings key on ``doc`` while the
    corpus keys on ``doc_id``). Returns the number of orphaned keys
    erased (0 = already consistent)."""
    from pyspark.sql import functions as F

    if index.latest_version() == 0:
        return 0  # never-written index: vacuously consistent
    if corpus.latest_version() == 0:
        raise ValueError(
            "corpus table is empty/never-written — every index key would "
            "be an orphan; if the corpus was truly dropped, drop or "
            "rebuild the index rather than erasing it row by row"
        )
    orphans = (
        index.read()
        .select(F.col(on).alias("__k"))
        .where("__k IS NOT NULL")
        .distinct()
        .join(
            corpus.read().select(F.col(corpus_on or on).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
    )
    vals = [r[0] for r in orphans.limit(max_keys + 1).collect()]
    if not vals:
        return 0
    if len(vals) > max_keys:
        raise ValueError(
            f"{len(vals)}+ orphaned keys exceeds max_keys={max_keys} — "
            "that is corpus-rebuild territory, not an erasure repair; "
            "rebuild the index from the corpus snapshot instead"
        )
    index.delete_keys(vals, on=on, max_keys=max_keys)
    return len(vals)


def prefix_bucketed_row_number(
    df,
    partition_cols: Sequence[str],
    hash_col,
    tiebreak_cols: Sequence[str],
    out_col: str = "pos",
    prefix_len: int = 2,
):
    """``row_number() OVER (PARTITION BY partition_cols ORDER BY
    hash_col, tiebreak_cols)`` computed WITHOUT a per-partition global
    sort — the scale-safe global-rank kernel factored out of the r11
    curriculum rewrite.

    Spark plans a window partitioned only by a low-cardinality column
    (a curriculum stage, a split label, a shard id) as ONE task per
    partition value — the whole slice through a single reducer. This
    kernel instead buckets every row by the first ``prefix_len`` hex
    chars of ``hash_col``; because the bucket is a PREFIX of the sort
    key, ordering by (bucket, hash) equals ordering by hash, so
    within-bucket row_numbers plus per-bucket offsets compose to a
    position bit-identical to the global window's while no task ever
    sees more than ~1/16^prefix_len of a partition. Offsets come from
    a (partition, bucket) count aggregate — at most
    |partitions| x 16^prefix_len tiny rows — ranked by a window over
    that AGGREGATE (never the data) and broadcast back.

    ``hash_col`` must be a lowercase-hex string column (md5/sha) so
    prefix order equals value order; positions are 1-based like
    ``row_number``. Requires ties on (hash, tiebreak) to be broken by
    ``tiebreak_cols`` (pass the row's unique key). NULL hashes (md5 of
    a NULL input) keep the window's NULLS-FIRST semantics: they land
    in a dedicated ''-bucket that sorts before every hex bucket (a
    non-null prefix is ≥1 char, so the bucket is unambiguous), rather
    than silently dropping out of the offsets equi-join (review r11).
    NULL values in ``partition_cols`` likewise keep window semantics —
    a window treats a NULL partition value as its own group — via
    null-safe (``<=>``) join conditions on the offsets join (ADVICE
    r11: a plain equi-join silently dropped those rows)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    pc = list(partition_cols)
    tb = list(tiebreak_cols)
    h = F.col(hash_col) if isinstance(hash_col, str) else hash_col
    hb = F.when(h.isNull(), F.lit("")).otherwise(
        F.substring(h, 1, prefix_len)
    )
    keyed = df.withColumn("__pbh", h).withColumn("__pbb", hb)
    local = keyed.withColumn(
        "__pblpos",
        F.row_number().over(
            W.partitionBy(*pc, "__pbb").orderBy("__pbh", *tb)
        ),
    )
    counts = keyed.groupBy(*pc, "__pbb").agg(F.count("*").alias("__pbn"))
    offsets = counts.select(
        *pc,
        "__pbb",
        (
            F.sum("__pbn").over(W.partitionBy(*pc).orderBy("__pbb"))
            - F.col("__pbn")
        ).alias("__pboff"),
    )
    # Null-safe conditions so NULL partition values join to their own
    # offsets group instead of dropping (an equi-join's NULL != NULL);
    # aliased sides + a condition list keeps the join unambiguous.
    lh, rh = local.alias("__pbl"), F.broadcast(offsets).alias("__pbr")
    cond = [
        F.col(f"__pbl.{c}").eqNullSafe(F.col(f"__pbr.{c}"))
        for c in pc + ["__pbb"]
    ]
    return (
        lh.join(rh, cond)
        .select("__pbl.*", F.col("__pbr.__pboff"))
        .withColumn(out_col, (F.col("__pboff") + F.col("__pblpos")).cast("long"))
        .drop("__pbh", "__pbb", "__pblpos", "__pboff")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_files: int,
    partition_by: Sequence[str] | None = None,
) -> int:
    """Rewrite a parquet dir into ~target_files files (per partition when
    partitioned). coalesce() avoids a shuffle when reducing; the rewrite
    goes through a temp dir + swap like the upsert sink.

    Returns the file count after compaction.
    """
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    writer = df.coalesce(target_files).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*list(partition_by))
    tmp = tempfile.mkdtemp(prefix="compact_")
    writer.parquet(f"{tmp}/data")
    shutil.rmtree(path)
    shutil.move(f"{tmp}/data", path)
    shutil.rmtree(tmp, ignore_errors=True)
    return sum(1 for p in Path(path).rglob("*.parquet"))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (df.sampleBy) — balanced training
    subsets from skewed class distributions."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def zorder_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave key over 2+ numeric columns.

    Each column is first rank-normalized by the caller to [0, 2^bits)
    (e.g. ntile or min-max scaling); this helper interleaves the bit
    patterns so that sorting by the result clusters rows that are close
    in EVERY dimension. Writing a table z-ordered means a range filter
    on any participating column touches a small fraction of files
    (parquet min/max row-group stats line up with the clustering) —
    the lakehouse data-skipping layout, no table format required.
    Pure column algebra: bits x columns shift/mask/or operations.

    The key is a SIGNED long, so the interleave must stay out of bit 63:
    with bits=16 and 4 columns the last bit would land on the sign bit,
    flipping high-key rows negative and silently inverting the sort.
    ``bits`` is capped at ``63 // len(cols)`` (e.g. 4 cols -> 15 bits).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    bits = min(bits, 63 // n)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def zorder_sort(df, cols: list[str], bits: int = 16, num_partitions: int | None = None):
    """Repartition-by-range + sort on the Morton key of min-max-scaled
    columns — the write-side clustering pass (pair with compact()).

    ``num_partitions=None`` lets AQE size the range partitions to the
    advisory partition bytes (the production default — output files land
    near the target size). Pass an explicit count to pin the layout
    (AQE does not coalesce user-specified partition counts; small local
    datasets would otherwise collapse into one partition)."""
    from pyspark.sql import functions as F

    # Match zorder_key's sign-bit cap BEFORE scaling, so the rank
    # normalization targets exactly the bits that get interleaved
    # (otherwise the high-order — most clustering-relevant — bits of
    # the scaled value would be silently dropped).
    bits = min(bits, 63 // len(cols))
    bounds = df.agg(
        *[F.min(c).alias(f"__mn_{c}") for c in cols],
        *[F.max(c).alias(f"__mx_{c}") for c in cols],
    )
    scaled = df.crossJoin(F.broadcast(bounds))
    scale_cols = []
    for c in cols:
        mn, mx = F.col(f"__mn_{c}"), F.col(f"__mx_{c}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1))
        scale_cols.append(
            F.least(
                F.floor((F.col(c) - mn) / span * ((1 << bits) - 1)),
                F.lit((1 << bits) - 1),
            ).cast("long")
        )
    keyed = scaled.withColumn("__zkey", zorder_key(scale_cols, bits))
    parted = (
        keyed.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else keyed.repartitionByRange("__zkey")
    )
    return parted.sortWithinPartitions("__zkey").drop(
        "__zkey", *[f"__mn_{c}" for c in cols], *[f"__mx_{c}" for c in cols]
    )


def assign_contiguous_ids(df, id_col: str = "row_id", order_within=None):
    """Assign contiguous ids 0..n-1 at scale (the zipWithIndex shape,
    DataFrame-native): per-partition counts roll up to offsets on the
    driver (one row per partition — a bounded collect), each row's id
    is its partition offset plus its local row_number. No global sort,
    no single-reducer window (``row_number() OVER ()`` funnels the
    whole table through ONE task — the anti-pattern this replaces);
    the only full-data operation is the per-partition window, which
    sorts each partition locally without any exchange.

    Ids are dense and unique for THIS materialization; they are not
    reproducible across different partitionings (partition assignment
    is layout-dependent). For ids that must be stable across reruns and
    engines, key on content instead (md5/xxhash64 of a natural key —
    the sample_deterministic pattern) — OR feed a
    ``repartitionByRange(...)`` of the frame on a total order and pass
    the same order as ``order_within``: range partition i sorts wholly
    before partition i+1, so pid-ordered offsets + within-partition
    row_number reproduce the global ``row_number() OVER (ORDER BY ...)``
    exactly, without its single-reducer window. ``order_within`` pins
    the within-partition order to a column, a Column expression, or a
    list of them (deterministic given a layout); default is the
    partition's physical row order.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    # localCheckpoint BEFORE the count job: the offsets map and the
    # returned plan must see the SAME partitioning — over a
    # non-deterministic source (sample, unordered limit, task retry)
    # two uncoordinated evaluations can disagree, producing wrong
    # offsets and dropping rows whose re-evaluated pid had no offset
    # row. An eager localCheckpoint SEVERS the lineage (persist() only
    # caches it: an evicted block recomputes and can land on different
    # pids), so a recompute physically cannot disagree with the
    # collected counts; the checkpoint blocks are freed with the frame,
    # no caller-side unpersist obligation (ADVICE r6).
    with_pid = df.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=True)
    counts = {
        r["__pid"]: r["n"]
        for r in with_pid.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(p, o) for p, o in offsets.items()], "__pid int, __off long"
    )
    if order_within is None:
        order = [F.monotonically_increasing_id()]
    elif isinstance(order_within, (list, tuple)):
        order = [F.col(o) if isinstance(o, str) else o for o in order_within]
    elif isinstance(order_within, str):
        order = [F.col(order_within)]
    else:
        order = [order_within]
    w = W.partitionBy("__pid").orderBy(*order)
    return (
        with_pid.withColumn("__local", F.row_number().over(w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn(id_col, F.col("__off") + F.col("__local") - 1)
        .drop("__pid", "__local", "__off")
    )
