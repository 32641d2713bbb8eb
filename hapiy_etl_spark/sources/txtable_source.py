"""Stream the TxTable commit log: ``format("txtable_changes")``.

The missing half of the change-data-feed story: ``TxTable.changes``
(operators/txstore.py) answers "what was added between two versions"
as a batch question; this module turns the same manifest dir-diff into
a GENUINE Structured Streaming source (the Delta
``readChangeFeed``-streaming analogue, rebuilt on the Python
DataSource V2 API the REST source already uses —
sources/rest_source.py). Offsets are snapshot VERSIONS, managed by the
engine's checkpoint, so a consumer gets exactly-once delivery of every
appended row across restarts with zero bookkeeping of its own:

- ``latestOffset`` = the table's newest manifest version (one tiny
  JSON read, no file listing);
- ``partitions(start, end)`` = one InputPartition per parquet FILE of
  the dirs appended in the span — executors read files in parallel
  with pyarrow, the driver never materializes rows (unlike the
  Simple reader the polling REST prototype uses);
- a rewrite inside the span (overwrite/merge/delete/restore/optimize)
  raises the same loud not-representable error as the batch CDF —
  streaming consumers must resync from a snapshot, never silently
  miss a mutation.

Scale posture: each micro-batch touches exactly the files the span
appended (the manifest names them — no listing, no diff job), and the
per-file partitions give the batch the same parallelism as a native
parquet scan. Works on FLAT append dirs — the shape every appender
produces; Hive-partitioned merge dirs only ever enter a span as part
of a rewrite, which raises anyway.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class _Manifests:
    """Driver-side manifest access without a SparkSession (the stream
    reader runs where no session is available)."""

    def __init__(self, path: str) -> None:
        self.path = Path(path)

    def latest_version(self) -> int:
        vs = [int(p.stem[1:]) for p in (self.path / "_tx").glob("v*.json")]
        return max(vs) if vs else 0

    def manifest(self, version: int) -> dict:
        p = self.path / "_tx" / f"v{version:08d}.json"
        if not p.exists():
            raise FileNotFoundError(f"no version {version} at {self.path}")
        return json.loads(p.read_text())

    def stored_schema(self) -> StructType:
        m = self.manifest(self.latest_version())
        schemas = m.get("schemas") or {}
        for d in reversed(m["dirs"]):
            if d in schemas:
                return StructType.fromJson(schemas[d])
        raise ValueError(
            f"table at {self.path} records no schema in its manifest "
            "(written before schema tracking) — re-commit once with the "
            "current writer, or pass an explicit schema"
        )


class TxFilePartition(InputPartition):
    def __init__(self, file: str, columns: list[str]) -> None:
        self.file = file
        self.columns = columns


class TxChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.schema_ = schema
        self.table_path = options["path"]
        self.starting_version = int(options.get("startingversion", 0))

    def initialOffset(self) -> dict:
        # startingVersion > 0 is the snapshot-then-stream handoff: a
        # consumer batch-reads TxTable.read(version=v) for its initial
        # state, then streams appends AFTER v — the documented recovery
        # path when a rewritten span invalidated a previous checkpoint.
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        return {"version": _Manifests(self.table_path).latest_version()}

    def partitions(self, start: dict, end: dict) -> list[TxFilePartition]:
        sv, ev = int(start["version"]), int(end["version"])
        if ev <= sv:
            return []
        man = _Manifests(self.table_path)
        m_ev = man.manifest(ev)
        to_dirs = m_ev["dirs"]
        if sv == 0:
            new = list(to_dirs)
        else:
            from_dirs = set(man.manifest(sv)["dirs"])
            gone = from_dirs - set(to_dirs)
            if gone:
                raise ValueError(
                    f"non-append history between v{sv} and v{ev} at "
                    f"{self.table_path} (dirs rewritten: {sorted(gone)}); "
                    "the change stream only carries appended rows — resync "
                    "the consumer from a snapshot read and restart the "
                    "stream from a fresh checkpoint"
                )
            new = [d for d in to_dirs if d not in from_dirs]
        layouts = m_ev.get("layouts") or {}
        bad = [d for d in new if layouts.get(d)]
        if bad:
            # a Hive-partitioned dir keeps its partition columns in
            # SUBDIRECTORY NAMES, not in the files — a flat file read
            # would silently drop those columns (and a flat glob finds
            # no files at all). Only flat append dirs are streamable.
            raise ValueError(
                f"dirs {sorted(bad)} in the span v{sv}..v{ev} at "
                f"{self.table_path} are Hive-partitioned (written by "
                "merge/optimize partition_by) — the change stream carries "
                "flat append dirs only; read the snapshot with "
                "TxTable.read and restart from startingVersion"
            )
        cols = [f.name for f in self.schema_.fields]
        parts = []
        for d in new:
            dir_path = Path(self.table_path) / "data" / d
            for f in sorted(dir_path.glob("*.parquet")):
                parts.append(TxFilePartition(str(f), cols))
        return parts

    def read(self, partition: TxFilePartition):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.file)
        names = set(table.column_names)
        cols = []
        for c in partition.columns:
            if c in names:
                cols.append(table.column(c).to_pylist())
            else:  # schema evolution: column absent in an older file
                cols.append([None] * table.num_rows)
        return iter(zip(*cols)) if table.num_rows else iter(())

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint


class TxChangesDataSource(DataSource):
    """``spark.readStream.format("txtable_changes").option("path", p)``
    — register with ``spark.dataSource.registerPython`` via
    :func:`register` below."""

    @classmethod
    def name(cls) -> str:
        return "txtable_changes"

    def schema(self) -> StructType:
        return _Manifests(self.options["path"]).stored_schema()

    def streamReader(self, schema: StructType) -> TxChangesStreamReader:
        return TxChangesStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(TxChangesDataSource)
