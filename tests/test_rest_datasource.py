"""Spark 4 Python Data Source: partition-parallel paginated REST scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from hapiy_etl_spark.pipeline.ingest import parse_commits
from hapiy_etl_spark.sources.rest_source import PagedRestDataSource

WIRE_DDL = (
    "sha string, commit struct<author: struct<email: string, date: string>, "
    "committer: struct<email: string, date: string>, message: string>"
)


def _read(spark, n_pages=5, ppp=2):
    spark.dataSource.register(PagedRestDataSource)
    return (
        spark.read.format("paged_rest")
        .schema(WIRE_DDL)
        .option("endpoint", "o/r")
        .option("n_pages", n_pages)
        .option("pages_per_partition", ppp)
        .option("fetcher", "tests.fixtures_rest.fake_fetch_page")
        .load()
    )


def test_paged_rest_reads_all_pages(spark):
    df = _read(spark)
    assert df.count() == 230
    assert df.select("sha").distinct().count() == 230
    # nested wire fields survive the partition reader
    assert df.where(F.col("commit.author.email") == "a@x").count() == 230


def test_paged_rest_partitions_by_page_range(spark):
    df = _read(spark, n_pages=5, ppp=2)
    assert df.rdd.getNumPartitions() == 3  # pages [1,2],[3,4],[5]


def test_paged_rest_streaming_incremental(spark, tmp_path):
    """Streaming source: micro-batch 1 reads pages 1-2; after the
    upstream grows to 3 pages, the next batch reads ONLY page 3."""
    import tests.fixtures_rest as fx

    fx.set_current_pages(2)
    spark.dataSource.register(PagedRestDataSource)
    stream = (
        spark.readStream.format("paged_rest")
        .schema(WIRE_DDL)
        .option("endpoint", "o/r")
        .option("fetcher", "tests.fixtures_rest.fetch_fixed_page")
        .option("latest_page", "tests.fixtures_rest.latest_page")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_stream_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    n1 = spark.sql("SELECT count(*) n FROM rest_stream_out").first().n
    assert n1 == 2 * fx.PER_PAGE

    fx.set_current_pages(3)  # upstream grows by one page
    q.processAllAvailable()
    q.stop()
    n2 = spark.sql("SELECT count(*) n FROM rest_stream_out").first().n
    assert n2 == 3 * fx.PER_PAGE  # only the new page arrived (no re-read)
    dupes = spark.sql(
        "SELECT sha FROM rest_stream_out GROUP BY sha HAVING count(*) > 1"
    ).count()
    assert dupes == 0


def test_paged_rest_feeds_parse_commits(spark):
    parsed = parse_commits(_read(spark), "o/r")
    assert parsed.where(F.col("commit_ts").isNull()).count() == 0
    assert parsed.select("commit_hash").distinct().count() == 230


def test_paged_rest_streaming_partial_tail_page(spark, tmp_path):
    """(page, row) offsets: rows appended to a partially-filled tail
    page after it was read must still arrive in the next micro-batch
    (whole-page offsets would silently drop them)."""
    import tests.fixtures_rest as fx

    fx.set_current_pages(2)
    fx.set_tail_rows(30)  # page 2 is only 30/50 full
    spark.dataSource.register(PagedRestDataSource)
    stream = (
        spark.readStream.format("paged_rest")
        .schema("sha string")
        .option("endpoint", "o/r")
        .option("fetcher", "tests.fixtures_rest.fetch_growing_page")
        .option("latest_page", "tests.fixtures_rest.latest_page")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_tail_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    assert spark.sql("SELECT count(*) n FROM rest_tail_out").first().n == 50 + 30

    fx.set_tail_rows(50)  # page 2 finishes filling
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT count(*) n FROM rest_tail_out").first().n == 100
    dupes = spark.sql(
        "SELECT sha FROM rest_tail_out GROUP BY sha HAVING count(*) > 1"
    ).count()
    assert dupes == 0


def test_paged_rest_token_env_plumbing(spark):
    """R14: .option('token_env', VAR) resolves the env var (set before
    the Spark launch, as in production) and hands the token to the
    fetcher (reference git_etl.ts:340-346). FAKE_REST_PAT is exported in
    conftest.py before the JVM starts."""
    spark.dataSource.register(PagedRestDataSource)
    df = (
        spark.read.format("paged_rest")
        .schema("sha string")
        .option("endpoint", "o/r")
        .option("n_pages", 1)
        .option("fetcher", "tests.fixtures_rest.fetch_page_with_token")
        .option("token_env", "FAKE_REST_PAT")
        .load()
    )
    shas = [r.sha for r in df.collect()]
    assert shas and all(s.startswith("tok=s3cret-") for s in shas)


def test_paged_rest_token_literal_option(spark):
    """.option('token', ...) passes a literal credential through."""
    spark.dataSource.register(PagedRestDataSource)
    df = (
        spark.read.format("paged_rest")
        .schema("sha string")
        .option("endpoint", "o/r")
        .option("n_pages", 1)
        .option("fetcher", "tests.fixtures_rest.fetch_page_with_token")
        .option("token", "lit3ral")
        .load()
    )
    shas = [r.sha for r in df.collect()]
    assert shas and all(s.startswith("tok=lit3ral-") for s in shas)


def test_paged_rest_without_token_env(spark):
    """No token_env -> fetcher called with the plain 2-arg signature."""
    df = _read(spark, n_pages=1, ppp=1)
    assert df.count() > 0


def test_rest_batch_writer_commits_manifest(spark, tmp_path):
    """The write-side of the Python DataSource: every row lands exactly
    once across task spool files, and the job-level manifest (the
    all-or-nothing marker) matches the total."""
    import json as _json
    import os

    spark.dataSource.register(PagedRestDataSource)
    sink = str(tmp_path / "sink")
    os.makedirs(sink, exist_ok=True)
    df = spark.range(100).selectExpr("id", "concat('v', id) AS v").repartition(4)
    (
        df.write.format("paged_rest")
        .option("endpoint", sink)
        .option("poster", "tests.fixtures_rest.spool_post_batch")
        .mode("append")
        .save()
    )
    manifest = _json.load(open(os.path.join(sink, "_MANIFEST.json")))
    assert manifest["n_rows"] == 100
    rows = []
    for _, _, receipt in manifest["receipts"]:
        with open(os.path.join(sink, receipt)) as f:
            rows.extend(_json.loads(ln) for ln in f if ln.strip())
    assert sorted(r["id"] for r in rows) == list(range(100))


def test_rest_batch_writer_abort_publishes_nothing(spark, tmp_path):
    import os

    import pytest as _pytest

    spark.dataSource.register(PagedRestDataSource)
    sink = str(tmp_path / "sink_fail")
    os.makedirs(sink, exist_ok=True)
    with _pytest.raises(Exception):
        (
            spark.range(10).write.format("paged_rest")
            .option("endpoint", sink)
            .option("poster", "tests.fixtures_rest.failing_post_batch")
            .mode("append")
            .save()
        )
    assert not os.path.exists(os.path.join(sink, "_MANIFEST.json"))


def test_rest_batch_writer_overwrite_retires_prior_batches(spark, tmp_path):
    """mode('overwrite') must retire prior spool files at commit so a
    directory-listing consumer sees exactly the new job's rows; a
    failed overwrite leaves prior state untouched (commit-time action)."""
    import json as _json
    import os

    spark.dataSource.register(PagedRestDataSource)
    sink = str(tmp_path / "sink_ow")
    os.makedirs(sink, exist_ok=True)

    def write(df, mode):
        (
            df.write.format("paged_rest")
            .option("endpoint", sink)
            .option("poster", "tests.fixtures_rest.spool_post_batch")
            .mode(mode)
            .save()
        )

    write(spark.range(40).selectExpr("id"), "append")
    write(spark.range(100, 110).selectExpr("id"), "overwrite")
    files = [f for f in os.listdir(sink) if f.startswith("batch-")]
    rows = []
    for f in files:
        with open(os.path.join(sink, f)) as fh:
            rows.extend(_json.loads(ln) for ln in fh if ln.strip())
    assert sorted(r["id"] for r in rows) == list(range(100, 110))
    manifest = _json.load(open(os.path.join(sink, "_MANIFEST.json")))
    assert manifest["n_rows"] == 10


def test_rest_batch_writer_append_merges_manifest(spark, tmp_path):
    """A second append job must EXTEND the published manifest (not
    replace it with only its own receipts), and commit must sweep
    orphan batch files from retried task attempts in append mode too."""
    import json as _json
    import os

    spark.dataSource.register(PagedRestDataSource)
    sink = str(tmp_path / "sink_app")
    os.makedirs(sink, exist_ok=True)

    def write(df):
        (
            df.write.format("paged_rest")
            .option("endpoint", sink)
            .option("poster", "tests.fixtures_rest.spool_post_batch")
            .mode("append")
            .save()
        )

    write(spark.range(40).selectExpr("id"))
    # simulate an orphan spool file from a retried/speculative task
    # attempt whose receipt never reached the driver
    with open(os.path.join(sink, "batch-orphan.jsonl"), "w") as f:
        f.write('{"id": 999}\n')
    write(spark.range(100, 110).selectExpr("id"))

    manifest = _json.load(open(os.path.join(sink, "_MANIFEST.json")))
    assert manifest["n_rows"] == 50  # both jobs' rows survive the merge
    rows = []
    for _, _, receipt in manifest["receipts"]:
        with open(os.path.join(sink, receipt)) as f:
            rows.extend(_json.loads(ln) for ln in f if ln.strip())
    assert sorted(r["id"] for r in rows) == list(range(40)) + list(range(100, 110))
    # the orphan was retired at the second commit
    assert not os.path.exists(os.path.join(sink, "batch-orphan.jsonl"))
    # and every on-disk batch file is claimed by the manifest
    on_disk = {f for f in os.listdir(sink) if f.startswith("batch-")}
    assert on_disk == {r for _, _, r in manifest["receipts"]}
