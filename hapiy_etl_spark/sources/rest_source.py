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
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


def _resolve(dotted: str):
    mod, name = dotted.rsplit(".", 1)
    return getattr(importlib.import_module(mod), name)


def _resolve_token(options: dict) -> str | None:
    """R14 credential plumbing (reference git_etl.ts:12,340-346: the
    ``GITHUB_PAT`` env var read once in the driver process and handed to
    the client). ``.option("token_env", "GITHUB_PAT")`` names the env
    var; the token is resolved HERE, in the planning process (which
    inherits the Spark launch environment — set the var before
    spark-submit, exactly like the reference's process env), and shipped
    to tasks inside the pickled partition, like any Spark credential
    broadcast. ``.option("token", ...)`` passes a literal instead (e.g.
    from a driver-side secret manager lookup)."""
    if "token" in options:
        return options["token"]
    env = options.get("token_env")
    return os.environ.get(env) if env else None


def _call_fetcher(fetch_page, endpoint: str, page: int, token: str | None):
    # token-less fetchers keep the plain 2-arg signature
    return fetch_page(endpoint, page, token=token) if token is not None else fetch_page(endpoint, page)


class PageRange(InputPartition):
    def __init__(self, endpoint: str, start: int, end: int, fetcher: str, token: str | None) -> None:
        self.endpoint, self.start, self.end, self.fetcher = endpoint, start, end, fetcher
        self.token = token


class PagedRestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.endpoint = options.get("endpoint", "")
        self.n_pages = int(options.get("n_pages", "1"))
        self.pages_per_partition = int(options.get("pages_per_partition", "4"))
        self.fetcher = options["fetcher"]
        self.token = _resolve_token(options)

    def partitions(self) -> list[PageRange]:
        step = self.pages_per_partition
        return [
            PageRange(self.endpoint, p, min(p + step, self.n_pages + 1), self.fetcher, self.token)
            for p in range(1, self.n_pages + 1, step)
        ]

    def read(self, partition: PageRange) -> Iterator[tuple]:
        fetch_page = _resolve(partition.fetcher)
        names = [f.name for f in self.schema_.fields]
        for page in range(partition.start, partition.end):
            for raw in _call_fetcher(fetch_page, partition.endpoint, page, partition.token):
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

    Offsets are ``{"page": p, "row": r}``: every page < p is fully
    committed, plus the first r rows of page p. Tracking the row offset
    of the tail page matters for append-style upstreams whose newest
    page is still filling: a whole-page offset would commit the partial
    page and silently skip rows appended to it later, while (page, row)
    re-reads the tail page and emits only its suffix — exactly-once
    without data loss. ``latest_page(endpoint)`` (resolved like
    ``fetcher``) reports the current upstream extent. The Simple reader
    runs on the driver — right for a polling prototype; the
    partition-parallel batch reader above is the backfill path.
    """

    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.endpoint = options.get("endpoint", "")
        self.fetcher = options["fetcher"]
        self.latest_page_fn = options["latest_page"]
        self.token = _resolve_token(options)

    def initialOffset(self) -> dict:
        return {"page": 1, "row": 0}

    @staticmethod
    def _norm(off: dict) -> tuple[int, int]:
        # legacy whole-page offsets {"page": n} meant pages 1..n committed
        if "row" not in off:
            return int(off.get("page", 0)) + 1, 0
        return int(off["page"]), int(off["row"])

    def _fetch(self, page: int) -> list[tuple]:
        fetch_page = _resolve(self.fetcher)
        names = [f.name for f in self.schema_.fields]
        return [
            tuple(_to_row_value(json.loads(raw).get(n), self.schema_[n].dataType) for n in names)
            for raw in _call_fetcher(fetch_page, self.endpoint, page, self.token)
        ]

    def read(self, start: dict):
        start_page, start_row = self._norm(start)
        latest = max(int(_resolve(self.latest_page_fn)(self.endpoint)), start_page)
        out: list[tuple] = []
        end_page, end_row = start_page, start_row
        for page in range(start_page, latest + 1):
            page_rows = self._fetch(page)
            skip = start_row if page == start_page else 0
            out.extend(page_rows[skip:])
            end_page, end_row = page, max(len(page_rows), skip if page == start_page else 0)
        return iter(out), {"page": end_page, "row": end_row}

    def readBetweenOffsets(self, start: dict, end: dict):
        start_page, start_row = self._norm(start)
        end_page, end_row = self._norm(end)
        out: list[tuple] = []
        for page in range(start_page, end_page + 1):
            page_rows = self._fetch(page)
            lo = start_row if page == start_page else 0
            hi = end_row if page == end_page else len(page_rows)
            out.extend(page_rows[lo:hi])
        return iter(out)

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

    def writer(self, schema: StructType, overwrite: bool) -> "RestBatchWriter":
        return RestBatchWriter(self.options, overwrite=overwrite)


class _PostReceipt(WriterCommitMessage):
    def __init__(self, partition_id: int, n_rows: int, receipt: str) -> None:
        self.partition_id, self.n_rows, self.receipt = partition_id, n_rows, receipt


class RestBatchWriter(DataSourceWriter):
    """Batch REST sink (the write-side twin of the paged reader): each
    executor task serializes its partition to JSON-lines and hands it to
    an injectable ``poster(endpoint, lines) -> receipt`` (a real client
    would POST a bulk payload; the shipped test double spools to files).

    Two-phase commit contract: a task's POST may be retried by Spark
    (speculation, task restart), so the poster must be idempotent or
    dedup-able by receipt; the job-level ``commit`` publishes a
    manifest of every task receipt ONLY after all tasks succeed — the
    all-or-nothing marker downstream consumers gate on (the same role
    as parquet's _SUCCESS). ``abort`` publishes nothing, so a failed
    job is invisible (reference R6's idempotent-upsert discipline,
    carried to an external sink)."""

    def __init__(self, options: dict, overwrite: bool = False) -> None:
        self.endpoint = options["endpoint"]
        self.poster = options["poster"]
        self.token = _resolve_token(options)
        self.overwrite = overwrite

    def write(self, iterator) -> _PostReceipt:
        from pyspark import TaskContext

        post = _resolve(self.poster)
        lines = []
        for row in iterator:
            d = row.asDict(recursive=True)
            lines.append(json.dumps(d, default=str, sort_keys=True))
        pid = TaskContext.get().partitionId()
        receipt = (
            post(self.endpoint, lines, token=self.token)
            if self.token is not None
            else post(self.endpoint, lines)
        )
        return _PostReceipt(pid, len(lines), receipt)

    def commit(self, messages) -> None:
        receipts = sorted((m.partition_id, m.n_rows, m.receipt) for m in messages)
        manifest_path = os.path.join(self.endpoint, "_MANIFEST.json")
        if not self.overwrite and os.path.exists(manifest_path):
            # append: EXTEND the published manifest — replacing it would
            # silently drop earlier jobs' batches from the receipt list
            # consumers gate on.
            with open(manifest_path) as f:
                prior = json.load(f)
            prior_receipts = {tuple(r) for r in prior.get("receipts", [])}
            receipts = sorted(prior_receipts | set(receipts))
        # Retire batch files no committed receipt claims, in BOTH modes.
        # In overwrite this honors mode("overwrite") (prior jobs' data
        # retired); in append it sweeps orphans from retried/speculative
        # task attempts (only receipts returned to the driver commit).
        # Done at COMMIT time — a failed job must leave the prior state
        # untouched (same contract as abort).
        keep = {r for _, _, r in receipts}
        for name in os.listdir(self.endpoint):
            if name.startswith("batch-") and name not in keep:
                os.remove(os.path.join(self.endpoint, name))
        manifest = {"receipts": receipts, "n_rows": sum(r[1] for r in receipts)}
        with open(manifest_path, "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        # nothing was published; spooled task files carry no manifest,
        # so downstream consumers never see the partial write
        pass
