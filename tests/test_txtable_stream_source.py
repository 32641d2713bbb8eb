"""The TxTable change-stream source (sources/txtable_source.py):
version offsets, per-file partitions, exactly-once restarts, loud
failure on rewritten spans."""

from __future__ import annotations

import pytest

from hapiy_etl_spark.operators.txstore import TxTable
from hapiy_etl_spark.sources.txtable_source import register


def _drain(spark, path, ckpt):
    got = []
    q = (
        spark.readStream.format("txtable_changes")
        .option("path", path)
        .load()
        .writeStream.foreachBatch(
            lambda df, eid: got.extend(sorted(map(tuple, df.collect())))
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return got


def test_txtable_change_stream_exactly_once(spark, tmp_path):
    """First run delivers the whole table, later runs deliver exactly
    the appended rows, and a restart with no new commits re-delivers
    nothing — offsets are engine-checkpointed snapshot versions."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))

    assert _drain(spark, path, ckpt) == [(1, "a"), (2, "b"), (3, "c")]
    t.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    assert _drain(spark, path, ckpt) == [(4, "d")]
    assert _drain(spark, path, ckpt) == []


def test_txtable_change_stream_schema_evolution_null_fill(spark, tmp_path):
    """An appended dir with an added column: older files null-fill the
    new column (the stream uses the NEWEST recorded schema)."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(
        spark.createDataFrame([(2, "b", 7)], "k long, v string, stars long")
    )
    got = _drain(spark, path, ckpt)
    assert got == [(1, "a", None), (2, "b", 7)]


def test_txtable_change_stream_rejects_rewritten_span(spark, tmp_path):
    """A row-MUTATING rewrite between micro-batches (here a DELETE) is
    not representable as appended rows: the stream fails loudly instead
    of silently skipping or double-delivering. (A row-preserving
    OPTIMIZE no longer trips this — see the survives_optimize test.)"""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    assert _drain(spark, path, ckpt) == [(1, "a"), (2, "b")]
    t.delete_where("k = 1")
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="non-append history"):
        _drain(spark, path, ckpt)


def test_txtable_change_stream_survives_row_preserving_optimize(spark, tmp_path):
    """r8 verdict: a routine compaction mid-stream used to kill the CDC
    consumer. OPTIMIZE (and optimize_clustered) rewrite the snapshot
    verbatim, so the stream now treats them as no-data micro-batches:
    rows appended BEFORE the optimize are never re-delivered from the
    compacted dir, rows appended in the SAME span as an interleaved
    optimize still arrive exactly once from their original files, and
    appends after it stream normally."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert _drain(spark, path, ckpt) == [(1, "a")]

    # optimize alone: a no-data micro-batch, nothing re-delivered
    t.optimize()
    assert _drain(spark, path, ckpt) == []

    # append + optimize + append interleaved inside ONE span: the first
    # append's dir is superseded by the compaction but its files remain
    # (copy-on-write) — both rows arrive, each exactly once
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.optimize()
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert _drain(spark, path, ckpt) == [(2, "b"), (3, "c")]
    assert _drain(spark, path, ckpt) == []

    # clustered compaction commits op="optimize" too
    t.optimize_clustered("k", n_dirs=2)
    t.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    assert _drain(spark, path, ckpt) == [(4, "d")]

    # a fresh consumer bootstrapping AFTER the optimizes still gets the
    # whole snapshot, once
    assert _drain(spark, path, str(tmp_path / "ckpt2")) == [
        (1, "a"),
        (2, "b"),
        (3, "c"),
        (4, "d"),
    ]


def test_txtable_change_stream_into_dynamic_view(spark, tmp_path):
    """The full loop closed: a TxTable commit log streamed through the
    exactly-once MV sink — commit-log source and dynamic-table sink
    composed, both ends incremental."""
    from hapiy_etl_spark.operators.incremental_mv import IncrementalAggView
    from hapiy_etl_spark.streaming.jobs import foreach_batch_tx_append_with_mv

    register(spark)
    src_path = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    view = str(tmp_path / "view")
    src = TxTable(spark, src_path)

    def run():
        stream = (
            spark.readStream.format("txtable_changes")
            .option("path", src_path)
            .load()
        )
        foreach_batch_tx_append_with_mv(
            stream, sink, ckpt, view, ["k"], "v"
        ).awaitTermination()

    src.append(spark.createDataFrame([("a", 1.0), ("b", 2.0)], "k string, v double"))
    run()
    src.append(spark.createDataFrame([("a", 3.0)], "k string, v double"))
    run()
    mv = IncrementalAggView(spark, TxTable(spark, sink), view, ["k"], "v")
    assert {(r.k, r.n, r.sum_value) for r in mv.result().collect()} == {
        ("a", 2, 4.0),
        ("b", 1, 2.0),
    }


def test_txtable_change_stream_snapshot_then_stream_handoff(spark, tmp_path):
    """startingVersion: batch-read the snapshot at v, stream appends
    after v — the recovery path after a rewrite invalidates a
    checkpoint. The union of snapshot + streamed rows equals the
    table, with no overlap."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.optimize()  # a rewrite: version-0 streams would refuse this span
    v = t.latest_version()
    snapshot = sorted(map(tuple, t.read(version=v).collect()))
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))

    got = []
    q = (
        spark.readStream.format("txtable_changes")
        .option("path", path)
        .option("startingVersion", str(v))
        .load()
        .writeStream.foreachBatch(
            lambda df, eid: got.extend(sorted(map(tuple, df.collect())))
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert snapshot == [(1, "a")]
    assert got == [(2, "b")]  # only post-snapshot appends, no overlap


def test_txtable_change_stream_partitioned_dirs(spark, tmp_path):
    """VERDICT r7 task 4: Hive-partitioned dirs stream. Partition
    values are parsed from subdirectory names and injected typed per
    the dir's PINNED written schema — a string repo '012' stays a
    string (no re-inference), a numeric partition column comes back
    numeric. This is the daemon's merge(partition_by=...) state table
    composed with the change stream: the bootstrap batch (span from
    v0) delivers the partitioned snapshot, later flat appends stream
    incrementally."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.merge(
        spark.createDataFrame(
            [("012", 7, 1), ("beta", 9, 2)], "repo string, bucket long, n long"
        ),
        keys=["repo"],
        partition_by=["repo", "bucket"],
    )
    got = _drain(spark, path, ckpt)
    assert got == [("012", 7, 1), ("beta", 9, 2)]  # types + values pinned
    # flat append after the partitioned snapshot streams incrementally
    t.append(
        spark.createDataFrame([("c", 1, 3)], "repo string, bucket long, n long")
    )
    assert _drain(spark, path, ckpt) == [("c", 1, 3)]


def test_txtable_change_stream_max_versions_per_trigger(spark, tmp_path):
    """VERDICT r7 task 3: admission control. A consumer restarting
    behind a 6-version backlog with maxVersionsPerTrigger=2 drains in
    3 bounded micro-batches — each delivering exactly its 2-version
    slice, exactly-once, restart-safe — instead of one giant catch-up
    batch."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(0, "seed")], "k long, v string"))

    def drain_paced():
        batches = []
        q = (
            spark.readStream.format("txtable_changes")
            .option("path", path)
            .option("maxVersionsPerTrigger", "2")
            .load()
            .writeStream.foreachBatch(
                lambda df, eid: batches.append(sorted(map(tuple, df.collect())))
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [b for b in batches if b]

    assert drain_paced() == [[(0, "seed")]]
    for i in range(1, 7):  # 6-version backlog while the consumer is down
        t.append(spark.createDataFrame([(i, f"v{i}")], "k long, v string"))

    slices = []
    while True:
        got = drain_paced()
        if not got:
            break
        slices.extend(got)
    # 3 non-empty drains, each a 2-version slice, nothing re-delivered
    assert slices == [
        [(1, "v1"), (2, "v2")],
        [(3, "v3"), (4, "v4")],
        [(5, "v5"), (6, "v6")],
    ]


def test_txtable_change_stream_refuses_narrowed_partition_schema(spark, tmp_path):
    """The stream schema is the newest dir's recorded schema; if a
    later append dropped a partitioned dir's partition columns,
    emitting that dir's rows would silently lose them — refuse loudly
    (a stream cannot widen its schema mid-run)."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.merge(
        spark.createDataFrame([("a", 1)], "repo string, n long"),
        keys=["repo"],
        partition_by=["repo"],
    )
    # schema-narrowing append: no repo column
    t.append(spark.createDataFrame([(9,)], "n long"))
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="no longer carries"):
        _drain(spark, path, ckpt)


def test_txtable_change_stream_refuses_wider_partitioned_older_dir(spark, tmp_path):
    """r8 verdict edge: a mixed-layout span whose NEWEST dir is flat
    while an OLDER dir is partitioned WIDER (extra partition columns
    the newest schema no longer carries). The stream schema derives
    from the newest dir, so emitting the older dir's rows would
    silently drop its extra partition column — the bootstrap must
    refuse loudly, not null-fill."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    # older dir: partitioned on (repo, bucket)
    t.merge(
        spark.createDataFrame(
            [("a", 1, 10)], "repo string, bucket long, n long"
        ),
        keys=["repo"],
        partition_by=["repo", "bucket"],
    )
    # newest dir: flat, carries repo but NOT bucket — the stream schema
    # (newest dir's) is narrower than the older dir's layout
    t.append(spark.createDataFrame([("b", 20)], "repo string, n long"))
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="no longer carries"):
        _drain(spark, path, ckpt)


def test_txtable_change_stream_timestamp_decimal_arrow_path(spark, tmp_path):
    """The Arrow batch path must round-trip the awkward types: session
    timestamps (parquet UTC-adjusted → arrow tz cast), timestamp_ntz,
    and decimals — byte-exact against what the table's batch read
    returns."""
    import datetime as dt
    from decimal import Decimal

    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 3, 1, 12, 30), dt.datetime(2024, 3, 1, 7),
             Decimal("12345.6789")),
            (2, dt.datetime(2025, 1, 1), dt.datetime(2025, 1, 1),
             Decimal("-0.0001")),
        ],
        "k long, ts timestamp, tn timestamp_ntz, amt decimal(18,4)",
    )
    t.append(df)
    got = _drain(spark, path, ckpt)
    want = sorted(map(tuple, t.read().collect()))
    assert got == want


def test_txtable_change_stream_vacuumed_offset_fails_loudly(spark, tmp_path):
    """Vacuum vs a lagging stream (r9): data dirs can only be removed
    together with every manifest that references them, so a consumer
    whose checkpoint predates retention hits a MISSING MANIFEST as the
    first symptom — and the error must name vacuum and the recovery
    (snapshot resync + fresh checkpoint), not read as a bare file miss.
    A vacuum whose keep window still covers the consumer's offset
    version leaves the stream able to resume normally — even across an
    optimize whose superseded dirs the same vacuum removed."""
    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.optimize()  # v3 supersedes the append dirs
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert _drain(spark, path, ckpt) == [(1, "a"), (2, "b"), (3, "c")]

    # checkpoint offset is v4; a vacuum keeping v4+ removes the
    # pre-optimize manifests AND the superseded append dirs, yet the
    # stream resumes cleanly because its span never looks below v4
    t.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    t.append(spark.createDataFrame([(5, "e")], "k long, v string"))
    removed = t.vacuum(keep_last=3, min_age_s=0.0)
    assert removed  # the v1/v2 manifests + their dirs actually went
    assert _drain(spark, path, ckpt) == [(4, "d"), (5, "e")]
    assert _drain(spark, path, ckpt) == []

    # aggressive vacuum ages out everything below the newest version —
    # the checkpoint (v6) now predates retention
    t.append(spark.createDataFrame([(6, "f")], "k long, v string"))
    t.append(spark.createDataFrame([(7, "g")], "k long, v string"))
    t.vacuum(keep_last=1, min_age_s=0.0)
    with pytest.raises(Exception) as ei:
        _drain(spark, path, ckpt)
    msg = str(ei.value)
    assert "vacuumed" in msg and "snapshot" in msg and "retention" in msg


def test_txtable_change_stream_missing_dir_names_vacuum(spark, tmp_path):
    """ADVICE r9: the optimize-skip relies on pre-optimize append dirs
    outliving the rewrite until the consumer drains. If retention (or
    an external cleaner, or a vacuum that crashed between its manifest
    and dir passes) removes a superseded dir while the span's manifests
    still exist, globbing the missing dir would yield [] and the batch
    would SILENTLY drop those rows — the source must instead raise the
    curated vacuumed-offset resync diagnosis."""
    import shutil

    register(spark)
    path, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    t = TxTable(spark, path)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    assert _drain(spark, path, ckpt) == [(1, "a")]

    # span: append (2,b) -> optimize supersedes its dir -> append (3,c)
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    appended = set(t._manifest(t.latest_version())["dirs"])
    t.optimize()
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    gone = appended - set(t._manifest(t.latest_version())["dirs"])
    for d in gone:  # simulate the dir reclaimed while manifests remain
        shutil.rmtree(str(t.path / "data" / d))

    with pytest.raises(Exception) as ei:
        _drain(spark, path, ckpt)
    msg = str(ei.value)
    assert "vacuumed" in msg and "retention" in msg and "snapshot" in msg
