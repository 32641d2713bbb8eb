"""Paginated REST source as a Spark 4 Python Data Source.

The scale path for the reference's R1 operator (SURVEY.md §2A): instead
of fetching every page on the driver (reference git_etl.ts:53-74 —
octokit.paginate pulls all pages sequentially into one process), each
*partition* fetches a contiguous page range inside an executor task, so
a backfill of N pages parallelizes N/pages_per_partition-wide and the
rows never pass through the driver.

The fetcher is injectable for tests (and because GitHub needs auth/rate
handling in production): ``fetch_page(endpoint, page) -> list[json str]``
must be a top-level importable callable so it pickles to executors.

Usage:
    spark.dataSource.register(PagedRestDataSource)
    df = (spark.read.format("paged_rest")
          .schema(WIRE_SCHEMA_DDL)
          .option("endpoint", "owner/repo")
          .option("n_pages", 10)
          .option("fetcher", "tests.fixtures_rest.fake_fetch_page")
          .load())
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _resolve(dotted: str):
    mod, name = dotted.rsplit(".", 1)
    return getattr(importlib.import_module(mod), name)


class PageRange(InputPartition):
    def __init__(self, endpoint: str, start: int, end: int, fetcher: str) -> None:
        self.endpoint, self.start, self.end, self.fetcher = endpoint, start, end, fetcher


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.endpoint = options.get("endpoint", "")
        self.n_pages = int(options.get("n_pages", "1"))
        self.pages_per_partition = int(options.get("pages_per_partition", "4"))
        self.fetcher = options["fetcher"]

    def partitions(self) -> list[PageRange]:
        step = self.pages_per_partition
        return [
            PageRange(self.endpoint, p, min(p + step, self.n_pages + 1), self.fetcher)
            for p in range(1, self.n_pages + 1, step)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        fetch_page = _resolve(partition.fetcher)
        names = [f.name for f in self.schema_.fields]
        for page in range(partition.start, partition.end):
            for raw in fetch_page(partition.endpoint, page):
                row = json.loads(raw)
                yield tuple(_to_row_value(row.get(n), self.schema_[n].dataType) for n in names)


def _to_row_value(v, dt):
    from pyspark.sql.types import StructType

    if v is None or not isinstance(dt, StructType):
        return v
    return tuple(_to_row_value(v.get(f.name), f.dataType) for f in dt.fields)


class PagedRestStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: each micro-batch covers the pages that appeared
    since the committed offset — the reference's cron-poll loop (R12)
    expressed as a genuine streaming source with checkpointable offsets
    (replacing its ad-hoc high-watermark with engine-managed
    exactly-once offsets).

    Offsets are page numbers: ``{"page": n}`` means pages 1..n are
    committed. ``latest_page(endpoint)`` (resolved like ``fetcher``)
    reports the current upstream extent. The Simple reader runs on the
    driver — right for a polling prototype; the partition-parallel batch
    reader above is the backfill path.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.endpoint = options.get("endpoint", "")
        self.fetcher = options["fetcher"]
        self.latest_page_fn = options["latest_page"]

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _rows(self, first_page: int, last_page: int) -> list[tuple]:
        fetch_page = _resolve(self.fetcher)
        names = [f.name for f in self.schema_.fields]
        out = []
        for page in range(first_page, last_page + 1):
            for raw in fetch_page(self.endpoint, page):
                row = json.loads(raw)
                out.append(tuple(_to_row_value(row.get(n), self.schema_[n].dataType) for n in names))
        return out

    def read(self, start: dict):
        latest = int(_resolve(self.latest_page_fn)(self.endpoint))
        end = {"page": max(latest, start["page"])}
        return iter(self._rows(start["page"] + 1, end["page"])), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["page"] + 1, end["page"]))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint


class PagedRestDataSource(DataSource):
    """format("paged_rest") — partition-parallel paginated REST scan
    (batch) and page-offset incremental micro-batches (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "paged_rest"

    def schema(self) -> str:
        raise NotImplementedError("paged_rest requires an explicit .schema(...)")

    def reader(self, schema: StructType) -> PagedRestReader:
        return PagedRestReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> PagedRestStreamReader:
        return PagedRestStreamReader(schema, self.options)
