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


def test_paged_rest_feeds_parse_commits(spark):
    parsed = parse_commits(_read(spark), "o/r")
    assert parsed.where(F.col("commit_ts").isNull()).count() == 0
    assert parsed.select("commit_hash").distinct().count() == 230
