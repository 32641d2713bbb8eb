"""Snapshot-versioned transactional parquet store with MERGE.

The reference's sink is a transactional KV (git_etl.ts:127-132,348 —
atomic upsert batches, readers never see partial writes). The lakehouse
answer is Delta/Iceberg MERGE (operators/table_formats.py gateway), but
this container ships no lakehouse jars — so this module provides the
same guarantees from first principles on plain parquet, the way Delta
itself does at the protocol level:

- every write is a NEW immutable snapshot directory; live data is named
  by a tiny JSON manifest, one per version, in ``_tx/``;
- a commit is the ATOMIC CREATION of the next manifest file
  (``os.open(O_CREAT|O_EXCL)``) — optimistic concurrency: two writers
  racing to version N+1 cannot both win, the loser re-reads and
  reapplies (exactly Delta's conflict protocol at file granularity);
- readers resolve the highest manifest and see a complete snapshot or
  nothing — no torn reads, and historical versions stay readable
  (time travel) until vacuumed.

Scale posture: the manifest holds directory names, never row data, so
commit cost is O(1) regardless of table size; MERGE is the oracle-
checked anti-join kernel from operators/upsert.py writing a
copy-on-write snapshot. Atomic-create works on POSIX and HDFS-likes;
on S3 the same protocol needs a conditional-put (documented seam, same
as every lakehouse).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hapiy_etl_spark.operators.upsert import upsert_by_key

# Index-geometry manifest-meta keys (bucket moduli, band layout, sign
# bits) that build/probe validation reads via
# textindex.recorded_stamp. _commit carries the parent's newest values
# forward into every commit that doesn't set its own, exactly like the
# epoch/run replay state — so a stamp survives optimize+vacuum and the
# NEWEST manifest always answers the lookup (ADVICE r10).
GEOMETRY_STAMP_KEYS = (
    "n_buckets",
    "n_band_buckets",
    "num_hashes",
    "band_size",
    "portable",
    "bits",
)


def _epoch_us(v) -> int:
    """Datetime → integer epoch microseconds (ordering-preserving,
    JSON-safe, and NUMERIC — so the pruner's string-type conservatism
    never confuses it with user string data). Tz-aware values convert
    to UTC then drop the zone: stats are collected from a UTC-session
    Spark, so a tz-aware caller bound lands on the same scale."""
    import datetime as _dt

    if v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return int((v - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def _stat_json_value(v):
    """Collected min/max → the manifest's JSON stats representation —
    shared by the per-dir and grouped stats passes so their recorded
    entries can never diverge. Dates/timestamps become epoch-micro
    NUMBERS, not ISO strings: numeric stats keep the pruner's
    str-vs-nonstr conservatism intact (an ISO string is
    indistinguishable from a user's plain-string data, so a datetime
    filter could strict-compare against a string column's stats and
    silently prune rows Spark's casting row filter would match). NaN
    never enters the manifest — it admits no total order, so a NaN
    bound is recorded as unusable."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return _epoch_us(v)
    if isinstance(v, _dt.date):
        return _epoch_us(_dt.datetime(v.year, v.month, v.day))
    if isinstance(v, float) and v != v:
        return None
    if isinstance(v, (int, float, str)) or v is None:
        return v
    return None


def _stats_norm(v):
    """Caller-side bound → the manifest's stats representation."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return _epoch_us(v)
    if isinstance(v, _dt.date):
        return _epoch_us(_dt.datetime(v.year, v.month, v.day))
    return v


def _meta_pair(a, b):
    """Normalize a metadata pair under the pruning conservatism rules;
    returns (a, b) when they are provably comparable, else None —
    "unknown, keep the dir" (cross-type pairs Spark's row filter would
    COERCE and match; NaN admits no total order; missing values).
    Shared by _meta_cmp and _meta_eq so the rules cannot diverge."""
    a, b = _stats_norm(a), _stats_norm(b)
    if a is None or b is None:
        return None
    if isinstance(a, str) != isinstance(b, str):
        return None
    if (isinstance(a, float) and a != a) or (isinstance(b, float) and b != b):
        return None
    # int-vs-float pair beyond 2^53: Python compares exactly, but
    # Spark's row filter COERCES bigint to double first — e.g. probe
    # 2**53+1 vs recorded max float(2**53) is "no overlap" exactly yet
    # the coerced filter would match rows. Not provably comparable →
    # keep the dir (ADVICE r7).
    if isinstance(a, int) != isinstance(b, int):
        iv = a if isinstance(a, int) else b
        if abs(iv) > 2**53:
            return None
    return a, b


def _meta_cmp(a, b):
    """``a <= b`` verdict under the conservatism rules, or None."""
    pair = _meta_pair(a, b)
    if pair is None:
        return None
    try:
        return bool(pair[0] <= pair[1])
    except TypeError:
        return None


def _meta_eq(a, b):
    """``a == b`` verdict under the conservatism rules, or None."""
    pair = _meta_pair(a, b)
    if pair is None:
        return None
    return pair[0] == pair[1]


_INT_RANGES = {
    "tinyint": (-(2**7), 2**7 - 1),
    "smallint": (-(2**15), 2**15 - 1),
    "int": (-(2**31), 2**31 - 1),
    "bigint": (-(2**63), 2**63 - 1),
}
_BLOOM_TYPES = frozenset({"string", *_INT_RANGES})


def stats_prune_dirs(
    m: dict, dirs: Sequence[str], where_range: dict
) -> list[str]:
    """Subset of ``dirs`` that can intersect ``where_range`` by the
    manifest's recorded per-dir [min, max] stats — the dir-level half
    of ``read(where_range=...)`` exposed for callers that must prune a
    specific dir SUBSET rather than the whole snapshot (e.g. the
    join-MV's F_old ⋈ ΔD term prunes only the CONSUMED fact dirs by
    the dim delta's key bounds; ``read()`` always prunes all current
    dirs). Same conservatism as read(): a dir without stats for a key
    is kept, bounds are inclusive, None means an open end."""
    stats = m.get("stats", {})

    def _keep(d: str) -> bool:
        for k, (lo, hi) in where_range.items():
            rng = stats.get(d, {}).get(k)
            if rng is None or rng[0] is None:
                continue
            if hi is not None and _meta_cmp(rng[0], hi) is False:
                return False  # dir min > hi
            if lo is not None and _meta_cmp(lo, rng[1]) is False:
                return False  # dir max < lo
        return True

    return [d for d in dirs if _keep(d)]


def dirs_read(df: DataFrame) -> set[str]:
    """The TxTable data-dir names a DataFrame's planned scan touches —
    the shared idiom for pruning assertions (queries, growth tools,
    tests). Forces file listing; use at demo/test scale."""
    return {f.split("/data/")[1].split("/")[0] for f in df.inputFiles()}


#: retighten_blooms resize ceiling: 2**20 bits = 128 KiB raw (~171 KiB
#: base64). Blooms inline in the JSON manifest that every subsequent
#: read carries forward, so an uncapped ~10-bits/key resize over a
#: consolidated survivor dir with millions of keys would inflate every
#: manifest scan by megabytes (ADVICE r13). Above the cap the residual
#: FPR is accepted — still far tighter than the union-widened bitmap
#: being replaced.
BLOOM_RESIZE_CAP_BITS = 2**20


def _bloom_bits_for(n: int, cap: int = BLOOM_RESIZE_CAP_BITS) -> int:
    """Smallest power-of-two byte-aligned bit count giving ~10 bits per
    distinct key (the append sizing guidance), capped at ``cap``."""
    bits = 256
    while bits < 10 * max(int(n or 0), 1) and bits < cap:
        bits *= 2
    return bits


def _validate_bloom_geometry(bits: int, k: int) -> None:
    """Shared bits/k validation for the per-dir AND grouped bloom
    builders (ADVICE r15: the grouped form dropped it, so bits like
    1001 surfaced as an IndexError mid-build instead of a clear
    ValueError, and k <= 0 silently recorded no bloom at all)."""
    if bits <= 0 or bits % 8:
        raise ValueError(f"bloom_bits must be a positive multiple of 8: {bits}")
    if k <= 0:
        raise ValueError(f"bloom_k must be positive: {k}")


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — re-read and retry."""


class TxTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        (self.path / "_tx").mkdir(parents=True, exist_ok=True)
        (self.path / "data").mkdir(parents=True, exist_ok=True)

    # -- snapshot resolution ------------------------------------------------
    def latest_version(self) -> int:
        vs = [int(p.stem[1:]) for p in (self.path / "_tx").glob("v*.json")]
        return max(vs) if vs else 0

    def _manifest(self, version: int) -> dict:
        p = self.path / "_tx" / f"v{version:08d}.json"
        if not p.exists():
            latest = self.latest_version()
            if 0 < version < latest:
                # versions are dense, so a missing lower version EXISTED
                # once — a vacuum aged it out. Same diagnosis the
                # streaming source gives (sources/txtable_source.py),
                # worded for the batch reader.
                raise FileNotFoundError(
                    f"version {version} at {self.path} was vacuumed "
                    f"(latest is v{latest}) — this read predates the "
                    "table's retention. Re-read from a retained "
                    "version, and keep vacuum retention above the "
                    "longest reader lag"
                )
            raise FileNotFoundError(f"no version {version} at {self.path}")
        return json.loads(p.read_text())

    def n_dirs(self, version: int | None = None) -> int:
        """Data-dir count of a snapshot — the small-files health metric
        compaction policies key on (one dir lands per append/micro-
        batch, so an always-on stream grows this without bound until
        someone compacts). 0 for an empty table."""
        v = self.latest_version() if version is None else version
        return len(self._manifest(v)["dirs"]) if v else 0

    def recorded_columns(self, version: int | None = None) -> list[str] | None:
        """Column names of the snapshot's NEWEST dir from the manifest's
        recorded per-dir schemas — a layout check that costs one JSON
        read instead of constructing a multi-dir DataFrame (parquet
        footer reads across every dir) just to look at ``.columns``
        (ADVICE r10). Returns None when the table is empty or the dir
        predates schema recording (fall back to ``read().columns``)."""
        v = self.latest_version() if version is None else version
        if not v:
            return None
        m = self._manifest(v)
        dirs = m.get("dirs") or []
        if not dirs:
            return None
        sch = (m.get("schemas") or {}).get(dirs[-1])
        if not sch:
            return None
        return [f["name"] for f in sch.get("fields", [])]

    def history(self) -> list[dict]:
        """Manifests that still exist, oldest first — after a vacuum the
        retained window starts above version 1, so this globs rather
        than assuming a gapless range."""
        vs = sorted(int(p.stem[1:]) for p in (self.path / "_tx").glob("v*.json"))
        return [self._manifest(v) for v in vs]

    def last_stream_epoch(self) -> int | None:
        """Most recent committed streaming epoch id. See
        ``last_stream_state`` for the full (epoch, run) pair."""
        return self.last_stream_state()[0]

    def last_stream_state(self) -> tuple[int | None, str | None]:
        """(epoch, run) of the newest committed streaming batch.

        Every commit carries the stream state forward in its meta
        (``_commit``), so for any table written by this version the
        FIRST manifest checked — the latest — answers: one file read
        per micro-batch, and optimize/restore/vacuum cannot erase
        replay-detection state. Older tables (pre-carry-forward) fall
        back to walking versions newest-first, parsing one manifest at
        a time rather than materializing the whole history."""
        vs = sorted(
            (int(p.stem[1:]) for p in (self.path / "_tx").glob("v*.json")),
            reverse=True,
        )
        for v in vs:
            meta = self._manifest(v).get("meta") or {}
            if "epoch" in meta:
                return meta["epoch"], meta.get("run")
        return None, None

    def read(
        self,
        version: int | None = None,
        merge_schema: bool = False,
        where: dict | None = None,
        where_range: dict | None = None,
        where_in: dict | None = None,
    ) -> DataFrame:
        """Resolve a snapshot. ``merge_schema=True`` unions the schemas
        of a multi-dir snapshot (appends may evolve the schema — added
        columns read as null on old dirs); without it Spark picks one
        file's schema and silently drops columns the others added.

        ``where={"col": value, ...}`` is MANIFEST-LEVEL partition
        pruning: data dirs appended with a partition spec
        (``append(..., partition=...)``) are skipped entirely when a
        recorded value contradicts the filter — at 100 TB the planner
        never even lists the pruned files, the Iceberg-style
        metadata-prune. Dirs without a spec (or without the filtered
        key) are always read, and the equality filter is re-applied
        row-level afterwards, so the result is exact regardless of how
        much was prunable. Equality filters also consult per-dir
        min/max STATS (``append(..., stats_cols=...)``): a dir whose
        recorded [min, max] cannot contain the value is skipped.

        ``where_range={"col": (lo, hi)}`` prunes on the same recorded
        stats with interval-intersection (inclusive bounds; pass None
        for an open end), then re-applies the range row-level — the
        metadata half of time-travel-free time-slicing: an
        append-mostly event table whose batches arrive roughly in time
        order prunes to the handful of dirs overlapping the window.

        ``where_in={"col": [v1, v2, ...]}`` is the BATCH point lookup:
        a dir is kept when ANY of the values might be present (spec /
        stats / bloom checks per value), and ``col IN (...)`` is
        re-applied row-level. All bloom probes — every (column, value,
        recorded geometry) combination across ``where`` and
        ``where_in`` — hash in ONE 1-row local job, so fetching a
        thousand documents by id costs one driver round-trip, not a
        thousand (the vectorized form VERDICT r7 asked for when bloom
        probing feeds a join)."""
        from pyspark.sql import functions as F

        v = self.latest_version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"empty table at {self.path}")
        for k, vals in (where_in or {}).items():
            if not vals:
                raise ValueError(f"where_in[{k!r}] is empty — nothing can match")
            if any(x is None for x in vals):
                raise ValueError(
                    f"where_in[{k!r}] contains None — SQL IN never matches "
                    "NULL; filter nulls explicitly"
                )
        m = self._manifest(v)
        dirs = m["dirs"]
        if where or where_range or where_in:
            specs = m.get("partitions", {})
            stats = m.get("stats", {})
            blooms = m.get("blooms", {})
            # probe positions once per (col, value, recorded geometry)
            # — not per dir — and ALL probes in one local job
            probes, seen = [], set()
            for k, val in list((where or {}).items()) + [
                (k, val) for k, vals in (where_in or {}).items() for val in vals
            ]:
                for d in dirs:
                    bl = blooms.get(d, {}).get(k)
                    if bl is not None:
                        key = (k, val, bl["type"], bl.get("bits"), bl.get("k"))
                        if key not in seen:
                            seen.add(key)
                            probes.append((key, bl))
            bloom_pos = dict(
                zip(
                    [key for key, _ in probes],
                    self._bloom_positions_many(
                        [(bl, key[1]) for key, bl in probes]
                    ),
                )
            )

            def _point_excludes(d: str, k: str, val) -> bool:
                return self._dir_point_excludes(
                    specs, stats, blooms, bloom_pos, d, k, val
                )

            def _keep(d: str) -> bool:
                for k, val in (where or {}).items():
                    if _point_excludes(d, k, val):
                        return False
                for k, vals in (where_in or {}).items():
                    if all(_point_excludes(d, k, val) for val in vals):
                        return False  # no listed value can be in d
                return True

            dirs = [d for d in dirs if _keep(d)]
            if where_range:
                # the one interval-pruning implementation — shared with
                # dir-subset callers (join-MV history pruning) so the
                # two can never desynchronize
                dirs = stats_prune_dirs(m, dirs, where_range)
        if not dirs:
            # every dir pruned: empty frame with the snapshot's schema
            full = self.read(v, merge_schema=merge_schema)
            df = full.limit(0)
        else:
            df = self._read_dirs(m, dirs, merge_schema)
        if where:
            for k, val in where.items():
                df = df.where(F.col(k) == F.lit(val))
        if where_in:
            for k, vals in where_in.items():
                df = df.where(F.col(k).isin(list(vals)))
        if where_range:
            for k, (lo, hi) in where_range.items():
                if lo is not None:
                    df = df.where(F.col(k) >= F.lit(lo))
                if hi is not None:
                    df = df.where(F.col(k) <= F.lit(hi))
        return df

    def _read_dirs(self, m: dict, dirs: list[str], merge_schema: bool) -> DataFrame:
        """Load a snapshot's data dirs honoring each dir's LAYOUT.

        A dir written by ``merge(partition_by=...)`` is Hive-partitioned
        inside; a dir from append/overwrite is flat. Spark's multi-path
        parquet read refuses to mix the two (CONFLICTING_DIRECTORY_
        STRUCTURES), so partitioned dirs are read one-by-one with their
        own ``basePath`` and unioned by name with the flat group.
        Partitioned dirs are read with the EXPLICIT schema recorded at
        write time: Hive partition values round-trip through directory
        names and Spark would otherwise re-infer their type (a string
        repo '012' silently becomes integer 12) — the stored schema pins
        the written types, and the trailing select pins column order so
        the snapshot schema is stable across layouts."""
        from pyspark.sql.types import StructType

        layouts = m.get("layouts") or {}
        schemas = m.get("schemas") or {}
        flat = [d for d in dirs if not layouts.get(d)]
        parted = [d for d in dirs if layouts.get(d)]
        frames = []
        if flat:
            reader = self.spark.read
            if merge_schema:
                reader = reader.option("mergeSchema", "true")
            frames.append(
                reader.parquet(*[str(self.path / "data" / d) for d in flat])
            )
        for d in parted:
            p = str(self.path / "data" / d)
            r = self.spark.read.option("basePath", p)
            sch = schemas.get(d)
            if sch is not None:
                r = r.schema(StructType.fromJson(sch))
            if merge_schema:
                r = r.option("mergeSchema", "true")
            f = r.parquet(p)
            if sch is not None:
                f = f.select(*[fld["name"] for fld in sch["fields"]])
            frames.append(f)
        df = frames[0]
        for f in frames[1:]:
            df = df.unionByName(f, allowMissingColumns=merge_schema)
        return df

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        keys: Sequence[str] | None = None,
    ) -> DataFrame:
        """Change-data-feed read: the rows ADDED between two versions,
        resolved as a manifest dir-set difference — no row-level diff
        job, no change-log infra; reading the delta of a 100 TB table
        touches only the appended files. ``from_version=0`` returns
        the whole ``to_version`` snapshot (everything is new).

        When a dir of ``from_version`` is gone in ``to_version`` (an
        overwrite/merge/delete/restore/optimize rewrote the snapshot),
        the file delta is not row-meaningful. With ``keys`` the read
        FALLS BACK to a row-level diff of the two snapshots
        (operators/upsert.py:table_diff — one full-outer join on the
        key): if the span only ADDED rows — the common
        append→OPTIMIZE→append case, where the rewrite was pure
        compaction — the inserted rows come back exactly as the fast
        path would have returned them, so CDC consumers survive an
        OPTIMIZE mid-span. A span that UPDATED or DELETED rows is not
        representable as rows-added and still raises (use table_diff
        directly for the op-tagged I/U/D feed). Without ``keys`` a
        rewritten span raises immediately.

        Keyed-fallback precondition (ENFORCED): the row diff sees KEYS,
        so it is only defined when both snapshots are key-unique — an
        appended physical duplicate would be invisible to it, and a
        same-key-different-values duplicate makes the join ambiguous.
        The fallback counts rows vs distinct keys on both snapshots and
        raises on violation (merge-fed and checked_append-fed tables
        always pass; plain-append tables with duplicate keys must use
        table_diff or a snapshot resync)."""
        to_v = self.latest_version() if to_version is None else to_version
        to_dirs = self._manifest(to_v)["dirs"]
        if from_version == 0:
            return self.read(to_v)
        from_dirs = set(self._manifest(from_version)["dirs"])
        gone = from_dirs - set(to_dirs)
        if gone and keys is not None:
            from pyspark.sql import functions as F

            from hapiy_etl_spark.operators.upsert import table_diff

            new_snap = self.read(to_v)
            old_snap = self.read(from_version)
            # the row diff resolves BY KEY, so it is only meaningful on
            # key-unique snapshots: a physical duplicate (same key,
            # identical values, appended by a plain append) is invisible
            # to it, and a duplicate with DIFFERENT values makes the
            # join ambiguous. Enforce the precondition instead of
            # documenting it (ADVICE r7) — two tiny count jobs on this
            # rare recovery path, never on the fast path.
            for side, snap in (("old", old_snap), ("new", new_snap)):
                tot = snap.count()
                uniq = snap.select(*keys).distinct().count()
                if tot != uniq:
                    raise ValueError(
                        f"keys={list(keys)} are not unique in the {side} "
                        f"snapshot ({tot} rows, {uniq} distinct keys) — "
                        "the keyed CDF fallback is only defined for "
                        "key-unique tables (merge-fed or "
                        "checked_append-fed); use table_diff directly or "
                        "resync from a snapshot read"
                    )
            diff = table_diff(old_snap, new_snap, keys)
            mutated = diff.where(F.col("op") != "I")
            if mutated.limit(1).count():
                raise ValueError(
                    f"history between v{from_version} and v{to_v} updated or "
                    "deleted rows — a rows-added CDF cannot represent it; "
                    "use table_diff on the two snapshots for the op-tagged "
                    "I/U/D feed"
                )
            return diff.drop("op").select(*new_snap.columns)
        if gone:
            raise ValueError(
                f"non-append history between v{from_version} and v{to_v} "
                f"(dirs rewritten: {sorted(gone)}); row-level CDF is only "
                "defined over append-only spans — pass keys= to fall back "
                "to a row-level diff, or use table_diff on the two "
                "snapshots instead"
            )
        new = [d for d in to_dirs if d not in from_dirs]
        if not new:
            df = self.read(to_v)
            return df.limit(0)
        return self._read_dirs(self._manifest(to_v), new, merge_schema=False)

    # -- commit protocol ----------------------------------------------------
    def _write_data_dir(
        self, df: DataFrame, partition_by: Sequence[str] | None = None
    ) -> str:
        d = f"s-{uuid.uuid4().hex[:12]}"
        w = df.write
        if partition_by:
            # Hive-style layout INSIDE the snapshot dir: reads of this
            # snapshot get Spark's native PartitionFilters pruning on
            # these columns — the complement of the manifest-level
            # dir pruning appends get via ``append(partition=...)``
            # (that one skips whole dirs without listing; this one
            # prunes subdirectories of a rewritten snapshot).
            w = w.partitionBy(*partition_by)
        w.parquet(str(self.path / "data" / d))
        return d

    def _commit(
        self,
        parent: int,
        dirs: list[str],
        op: str,
        meta: dict | None = None,
        partitions: dict | None = None,
        layouts: dict | None = None,
        schemas: dict | None = None,
        stats: dict | None = None,
        blooms: dict | None = None,
    ) -> int:
        """Atomically create manifest parent+1; raise on a lost race.

        Streaming replay state (``epoch``/``run`` meta keys) and index
        geometry stamps (``GEOMETRY_STAMP_KEYS``) are carried forward
        from the parent into every commit that does not set its own —
        so optimize/merge/restore/delete cannot strand the exactly-once
        detection OR the build/probe geometry validation behind
        manifests that vacuum may drop (ADVICE r10: an aggressive
        ``vacuum_keep_last`` after a stamp-less optimize deleted every
        stamped append manifest and validation silently disabled).
        Carry-forward also makes ``recorded_stamp`` O(1) on any table
        whose history ever stamped: the NEWEST manifest always answers."""
        return self._publish_manifest(
            self._build_manifest(
                parent, dirs, op, meta,
                partitions=partitions, layouts=layouts, schemas=schemas,
                stats=stats, blooms=blooms,
            )
        )

    def _build_manifest(
        self,
        parent: int,
        dirs: list[str],
        op: str,
        meta: dict | None = None,
        partitions: dict | None = None,
        layouts: dict | None = None,
        schemas: dict | None = None,
        stats: dict | None = None,
        blooms: dict | None = None,
    ) -> dict:
        """The manifest CONTENT of version parent+1, fully determined
        (meta/geometry carry-forward applied) but not yet published —
        so a cross-table group commit can journal the exact bytes both
        tables will publish, and recovery can re-publish them verbatim
        (``txgroup_commit_appends``)."""
        version = parent + 1
        meta = dict(meta) if meta else {}
        if parent:
            pm = self._manifest(parent).get("meta") or {}
            if "epoch" not in meta and "epoch" in pm:
                meta["epoch"] = pm["epoch"]
                if "run" in pm:
                    meta["run"] = pm["run"]
            for k in GEOMETRY_STAMP_KEYS:
                if k not in meta and k in pm:
                    meta[k] = pm[k]
        return {
            "version": version,
            "parent": parent,
            "op": op,
            "dirs": dirs,
            "ts": time.time(),
            **({"meta": meta} if meta else {}),
            **({"partitions": partitions} if partitions else {}),
            # per-dir physical layout (Hive partition columns) and the
            # written schema: read() needs both to load mixed-layout
            # snapshots and to pin partition-column types (Delta keeps
            # the same facts in its transaction log for the same reason)
            **({"layouts": layouts} if layouts else {}),
            **({"schemas": schemas} if schemas else {}),
            # per-dir column min/max (Iceberg-style file statistics):
            # read(where/where_range) skips dirs whose recorded range
            # cannot match, without listing a single file
            **({"stats": stats} if stats else {}),
            # per-dir per-column Bloom filters (point-lookup pruning on
            # unordered keys); 4 KB base64 each
            **({"blooms": blooms} if blooms else {}),
        }

    def _publish_manifest(self, manifest: dict) -> int:
        """Atomically create the manifest file; raise on a lost race."""
        version = manifest["version"]
        p = self.path / "_tx" / f"v{version:08d}.json"
        # write the FULL content to a temp name first, then hard-link to
        # the final name: link() is atomic AND exclusive, so a reader
        # can never observe a partial manifest and a crash before the
        # link leaves only a temp file (swept by vacuum), never a
        # half-written version that would wedge the table.
        tmp = self.path / "_tx" / f".tmp-{uuid.uuid4().hex[:12]}"
        with open(tmp, "w") as f:
            f.write(json.dumps(manifest))
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, p)
        except FileExistsError:
            raise ConcurrentCommitError(
                f"version {version} already committed by another writer"
            ) from None
        finally:
            tmp.unlink(missing_ok=True)
        return version

    # -- write operations ---------------------------------------------------
    @staticmethod
    def _dir_maps(m: dict, dirs: list[str]) -> tuple[dict, dict, dict, dict, dict]:
        """(partitions, layouts, schemas, stats, blooms) from manifest
        ``m`` restricted to ``dirs`` — the carry-forward for commits
        that re-reference a parent's data dirs (append, restore)."""
        return tuple(
            {d: v[d] for d in dirs if d in v}
            for v in (
                m.get("partitions") or {},
                m.get("layouts") or {},
                m.get("schemas") or {},
                m.get("stats") or {},
                m.get("blooms") or {},
            )
        )

    @staticmethod
    def _union_stats(all_stats: dict, dirs: list[str]) -> dict:
        """Conservative [min, max] per column over several dirs' stats —
        valid bounds for any dir holding a SUBSET of their rows (the
        rewritten survivors of a delete, the compacted dir of an
        optimize). Only columns recorded on EVERY input dir survive;
        unusable or mixed-type ranges collapse to [None, None]
        (recorded-but-unusable, so readers stay conservative)."""
        if not dirs or not all(d in all_stats for d in dirs):
            return {}
        union: dict = {}
        for d in dirs:
            for col, rng in all_stats[d].items():
                if rng[0] is None:
                    union[col] = [None, None]
                elif col not in union:
                    union[col] = list(rng)
                elif union[col][0] is not None:
                    try:
                        union[col] = [
                            min(union[col][0], rng[0]),
                            max(union[col][1], rng[1]),
                        ]
                    except TypeError:  # mixed types across dirs
                        union[col] = [None, None]
        return {
            c: r for c, r in union.items() if all(c in all_stats[d] for d in dirs)
        }

    @staticmethod
    def _union_blooms(all_blooms: dict, dirs: list[str]) -> dict:
        """OR-union of several dirs' blooms — a valid (superset) bloom
        for any dir holding a subset of their rows (delete survivors,
        an optimize compaction). Only columns recorded on EVERY input
        dir with IDENTICAL geometry and type survive (bitmaps of
        different geometry cannot be merged)."""
        import base64

        if not dirs or not all(d in all_blooms for d in dirs):
            return {}
        out: dict = {}
        first = all_blooms[dirs[0]]
        for col, entry in first.items():
            sig = (entry.get("type"), entry.get("bits"), entry.get("k"))
            buf = bytearray(base64.b64decode(entry["b64"]))
            ok = True
            for d in dirs[1:]:
                other = all_blooms[d].get(col)
                if other is None or (
                    other.get("type"),
                    other.get("bits"),
                    other.get("k"),
                ) != sig:
                    ok = False
                    break
                ob = base64.b64decode(other["b64"])
                for i in range(len(buf)):
                    buf[i] |= ob[i]
            if ok:
                out[col] = {**entry, "b64": base64.b64encode(bytes(buf)).decode("ascii")}
        return out

    def _merge_stats(self, m: dict, touched: list[str], batch: DataFrame) -> dict:
        """[min, max] stats for a MERGE's rewritten dir, every recorded
        column — same containment argument as :meth:`_merge_blooms`:
        merged rows ⊆ touched rows ∪ batch rows, so
        ``union(touched ranges) ∪ batch range`` bounds the dir (possibly
        wider than actual — conservative, never wrong). Previously only
        ``prune_col`` survived a merge and every other column's range
        pruning silently degraded on exactly the tables that merge
        most. Rules per column:

        - touched dirs must ALL record it (``_union_stats``; a missing
          dir makes the true range unknowable → nothing recorded);
        - an unusable carried or batch range ([None, None] — NaN bound,
          non-JSON type, all-NULL batch column) records [None, None]
          (readers keep the dir);
        - a column absent from the batch contributes only NULLs — the
          touched union alone bounds it;
        - cross-type min/max (str vs number) collapses to
          [None, None]."""
        all_stats = m.get("stats") or {}
        if touched:
            base: dict = self._union_stats(all_stats, touched)
            if not base:
                return {}
        else:
            # fully-pruned merge: the batch is the whole dir; bound the
            # columns the parent snapshot records anywhere
            cols: set = set()
            for d in m.get("dirs", []):
                cols |= set(all_stats.get(d) or {})
            base = {c: None for c in cols}
        batch_cols = set(batch.columns)
        want = [c for c in base if c in batch_cols]
        bstats = self._column_stats(batch, want) if want else {}
        out: dict = {}
        for c, rng in base.items():
            if c not in batch_cols:
                if rng is not None:
                    out[c] = rng
                continue
            brng = bstats.get(c, [None, None])
            if rng is None:
                out[c] = brng
                continue
            if rng[0] is None or brng[0] is None:
                out[c] = [None, None]
                continue
            try:
                out[c] = [min(rng[0], brng[0]), max(rng[1], brng[1])]
            except TypeError:
                out[c] = [None, None]
        return out

    def _merge_blooms(self, m: dict, touched: list[str], batch: DataFrame) -> dict:
        """Blooms for a MERGE's rewritten dir. Every row of the merged
        dir is either a touched-dir survivor (verbatim, key unmatched)
        or a batch row (verbatim, upsert winner) — so
        ``OR(touched blooms) | bloom(batch)`` is a valid superset bloom
        for EVERY column, updates included. Without this a merge
        silently dropped point-lookup pruning on exactly the tables
        that merge most (VERDICT r7). Per column:

        - touched dirs must ALL bloom it with identical geometry
          (``_union_blooms``); when the merge pruned every dir away
          (``touched == []``) the batch is the whole dir and geometry
          is inherited from the newest parent dir blooming the column;
        - a column absent from the batch (schema-evolution merge)
          contributes only NULLs — the touched union alone covers it;
        - a batch column whose type differs from the recorded bloom
          type is not provably hash-consistent → no bloom (conservative,
          never wrong)."""
        import base64

        all_blooms = m.get("blooms") or {}
        if touched:
            base = self._union_blooms(all_blooms, touched)
        else:
            base = {}
            for d in m.get("dirs", []):  # later dirs overwrite: newest wins
                for col, entry in (all_blooms.get(d) or {}).items():
                    zero = base64.b64encode(
                        bytes(int(entry["bits"]) // 8)
                    ).decode("ascii")
                    base[col] = {**entry, "b64": zero}
        out: dict = {}
        batch_cols = {f.name: f.dataType.simpleString() for f in batch.schema.fields}
        for col, entry in base.items():
            if col not in batch_cols:
                out[col] = entry
                continue
            if batch_cols[col] != entry["type"]:
                continue
            bb = self._bloom_build(
                batch, [col], int(entry["bits"]), int(entry["k"])
            )[col]
            a = bytearray(base64.b64decode(entry["b64"]))
            b = base64.b64decode(bb["b64"])
            for i in range(len(a)):
                a[i] |= b[i]
            out[col] = {**entry, "b64": base64.b64encode(bytes(a)).decode("ascii")}
        return out

    # Default Bloom geometry: 32768 bits (4 KB per column per dir in
    # the manifest, base64) x 5 hashes ~= 1% false positives at ~3400
    # distinct keys per dir, degrading gracefully above — size bits to
    # ~10x the expected distinct keys per dir (append(bloom_bits=...)).
    # Geometry is RECORDED in each bloom entry and the probe replays
    # the recorded values, so tables written with any geometry stay
    # readable. A false positive only costs an unnecessary dir read —
    # never correctness.
    BLOOM_BITS = 32768
    BLOOM_K = 5

    def _bloom_build(
        self,
        df: DataFrame,
        cols: Sequence[str],
        bits: int | None = None,
        k: int | None = None,
    ) -> dict:
        """{col: {"b64", "type", "bits", "k"}} — one tiny distinct job
        per column; bit positions come from Spark's own xxhash64 over
        the column's NATIVE type (the probe replays the same hash with
        a cast literal, so build and probe can never disagree on
        representation)."""
        import base64

        from pyspark.sql import functions as F

        bits = int(bits or self.BLOOM_BITS)
        k = int(k or self.BLOOM_K)
        _validate_bloom_geometry(bits, k)
        out = {}
        for c in cols:
            typ = df.schema[c].dataType.simpleString()
            if typ not in _BLOOM_TYPES:
                # a bloom the probe can never consult would be 4 KB of
                # dead manifest weight carried forward forever
                raise ValueError(
                    f"bloom_cols[{c!r}] has type {typ}; blooms support "
                    f"{sorted(_BLOOM_TYPES)} (point lookups on other types "
                    "use stats_cols range pruning instead)"
                )
            seeds = F.array(
                *[
                    F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(bits))
                    for i in range(k)
                ]
            )
            rows = (
                df.where(F.col(c).isNotNull())
                .select(F.explode(seeds).alias("p"))
                .distinct()
                .collect()
            )
            buf = bytearray(bits // 8)
            for r in rows:
                pos = int(r["p"])
                buf[pos // 8] |= 1 << (pos % 8)
            out[c] = {
                "b64": base64.b64encode(bytes(buf)).decode("ascii"),
                "type": typ,
                "bits": bits,
                "k": k,
            }
        return out

    @staticmethod
    def _bloom_probe_ok(bloom: dict, val) -> bool:
        """A probe literal is only hash-replayable when its Python type
        maps onto the RECORDED column type (and, for ints, fits the
        type's range — under ANSI an overflowing cast RAISES; an
        out-of-range probe can simply skip the bloom: the value cannot
        be in the column anyway, and stats/row filtering stay exact)."""
        typ = bloom.get("type", "")
        return (isinstance(val, str) and typ == "string") or (
            isinstance(val, int)
            and not isinstance(val, bool)
            and typ in _INT_RANGES
            and _INT_RANGES[typ][0] <= val <= _INT_RANGES[typ][1]
        )

    def _bloom_positions_many(
        self, entries: list[tuple[dict, object]]
    ) -> list[list[int] | None]:
        """Probe positions for MANY (bloom entry, literal) pairs in ONE
        1-row local Spark job — the vectorized form of the per-probe
        round-trip (a batch of point lookups paid one driver job per
        key, VERDICT r7). Each pair replays exactly the build-side hash
        by casting its literal to the entry's recorded type (Spark's
        xxhash64 is type-sensitive; a Python re-implementation would
        silently diverge). A pair whose probe is not provably
        type-consistent yields None (bloom skipped, never pruned on).

        Probes are DATA-parallel, not expression-parallel (r10; the r8
        chunked-literal form kept each job small but still built ~4
        Column objects per probe — a 1000-key where_in spent ~25 s of
        pure py4j expression construction before any job ran): the
        probe values become ROWS of one tiny local DataFrame per
        recorded geometry, hashed by k constant column expressions —
        O(1) expressions and O(geometries) driver round-trips no matter
        how many keys are probed. The value column is created AT the
        recorded type, so xxhash64 sees exactly the build-side
        representation (same native-type contract as the cast-literal
        form it replaces)."""
        from pyspark.sql import functions as F

        results: list[list[int] | None] = [None] * len(entries)
        groups: dict[tuple, list[tuple[int, object]]] = {}
        for j, (bl, val) in enumerate(entries):
            if not self._bloom_probe_ok(bl, val):
                continue
            key = (
                bl.get("type", ""),
                int(bl.get("bits", self.BLOOM_BITS)),
                int(bl.get("k", self.BLOOM_K)),
            )
            groups.setdefault(key, []).append((j, val))
        for (typ, bits, k), items in groups.items():
            rows = self.spark.createDataFrame(
                items, f"j bigint, v {typ}"
            ).select(
                "j",
                *[
                    F.pmod(F.xxhash64(F.col("v"), F.lit(i)), F.lit(bits)).alias(
                        f"p{i}"
                    )
                    for i in range(k)
                ],
            ).collect()
            for r in rows:
                results[int(r["j"])] = [int(r[f"p{i}"]) for i in range(k)]
        return results

    def _bloom_positions(self, bloom: dict, val) -> list[int] | None:
        """Single-probe convenience over :meth:`_bloom_positions_many`."""
        return self._bloom_positions_many([(bloom, val)])[0]

    # decoded bloom buffers, keyed by their b64 text: a batch erasure
    # probes the same dir's bloom once per key (O(dirs x keys) decodes
    # at delete_keys' 100k cap without this); manifests are immutable
    # so a b64 string always decodes to the same buffer. Bounded local
    # scratch, cleared wholesale when it grows past ~6 MB.
    _BLOOM_BUFS: dict[str, bytes] = {}

    @staticmethod
    def _bloom_test(b64: str, positions: list[int]) -> bool:
        """True = might contain."""
        import base64

        buf = TxTable._BLOOM_BUFS.get(b64)
        if buf is None:
            if len(TxTable._BLOOM_BUFS) > 1024:
                TxTable._BLOOM_BUFS.clear()
            buf = base64.b64decode(b64)
            TxTable._BLOOM_BUFS[b64] = buf
        return all((buf[p // 8] >> (p % 8)) & 1 for p in positions)

    def _dir_point_excludes(
        self, specs: dict, stats: dict, blooms: dict, bloom_pos: dict,
        d: str, k: str, val,
    ) -> bool:
        """True when dir ``d`` provably cannot contain ``k == val`` —
        THE single spec/stats/bloom point-pruning rule, shared by
        ``read(where=/where_in=)`` and ``delete_keys`` so the scan and
        the erasure can never desynchronize about which dirs might
        hold a key. ``bloom_pos`` maps (k, val, type, bits, k_hashes)
        to precomputed probe positions (or None = not replayable)."""
        spec_val = specs.get(d, {}).get(k)
        if spec_val is not None and _meta_eq(spec_val, val) is False:
            return True
        rng = stats.get(d, {}).get(k)
        if rng is not None and rng[0] is not None:
            below = _meta_cmp(rng[0], val)  # rng[0] <= val ?
            above = _meta_cmp(val, rng[1])  # val <= rng[1] ?
            if below is False or above is False:
                return True
        bl = blooms.get(d, {}).get(k)
        if bl is not None:
            pos = bloom_pos.get((k, val, bl["type"], bl.get("bits"), bl.get("k")))
            if pos is not None and not self._bloom_test(bl["b64"], pos):
                return True  # bloom proves the key absent
        return False

    @staticmethod
    def _column_stats(df: DataFrame, cols: Sequence[str]) -> dict:
        """One tiny agg job → {col: [min, max]} for the manifest. Values
        must survive JSON: numbers and strings pass through, dates and
        timestamps are recorded as ISO strings (ordered the same way),
        anything else is skipped (recorded as [None, None] so readers
        know stats were requested but unusable)."""
        from pyspark.sql import functions as F

        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        row = df.agg(*aggs).collect()[0]

        out = {}
        for c in cols:
            mn = _stat_json_value(row[f"__mn_{c}"])
            mx = _stat_json_value(row[f"__mx_{c}"])
            out[c] = [mn, mx] if mn is not None and mx is not None else [None, None]
        return out

    @staticmethod
    def _grouped_column_stats(
        df: DataFrame, group_col: str, cols: Sequence[str]
    ) -> dict:
        """{group -> {col: [min, max]}} in ONE agg job — the grouped
        form of :meth:`_column_stats` (optimization r15): a clustered
        rewrite needs per-dir stats for every bucket, and one grouped
        pass over the spool replaces one driver-scheduled job per dir.
        Value normalization is shared (``_stat_json_value``), so the
        recorded entries are byte-identical to the per-dir form."""
        from pyspark.sql import functions as F

        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"__mn_{c}"), F.max(c).alias(f"__mx_{c}")]
        out: dict = {}
        for row in df.groupBy(group_col).agg(*aggs).collect():
            ent = {}
            for c in cols:
                mn = _stat_json_value(row[f"__mn_{c}"])
                mx = _stat_json_value(row[f"__mx_{c}"])
                ent[c] = (
                    [mn, mx] if mn is not None and mx is not None else [None, None]
                )
            out[int(row[group_col])] = ent
        return out

    def _grouped_bloom_build(
        self,
        df: DataFrame,
        group_col: str,
        col: str,
        bits: int,
        k: int,
        groups: Sequence[int] | None = None,
    ) -> dict:
        """{group -> bloom entry} in ONE job — the grouped form of
        :meth:`_bloom_build` (optimization r15): same xxhash64 seed
        positions, same geometry recording, one job for ALL of a
        clustered rewrite's dirs instead of one per dir.

        Bitmaps aggregate EXECUTOR-SIDE (optimization r16, VERDICT r15
        item 7): distinct (group, position) pairs reduce to per-(group,
        byte) ``bit_or`` partials, then one sparse byte list per group —
        so the driver collect is bounded at n_groups rows x ≤ bits/8
        set bytes, instead of n_groups x bits position rows (a wide
        compaction at scale would otherwise sum the old per-dir driver
        peaks into one collect; guide §5). Bit positions are identical
        to the per-dir form, so recorded entries stay byte-identical
        (pinned by tests/test_optimization_r15.py).

        ``groups`` pre-seeds an all-zero bloom for listed groups with
        no non-NULL rows (ADVICE r15: the per-dir form records an
        all-zero bloom for an all-NULL dir — which prunes every probe —
        and the grouped form silently dropped those entries)."""
        import base64

        from pyspark.sql import functions as F

        typ = df.schema[col].dataType.simpleString()
        if typ not in _BLOOM_TYPES:
            raise ValueError(
                f"bloom_cols[{col!r}] has type {typ}; blooms support "
                f"{sorted(_BLOOM_TYPES)} (point lookups on other types "
                "use stats_cols range pruning instead)"
            )
        _validate_bloom_geometry(bits, k)
        seeds = F.array(
            *[
                F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(bits))
                for i in range(k)
            ]
        )
        rows = (
            df.where(F.col(col).isNotNull())
            .select(F.col(group_col).alias("g"), F.explode(seeds).alias("p"))
            .distinct()
            # executor-side bitmap fold: OR the single-bit values into
            # per-(group, byte) partials, then pack each group's sparse
            # (byte index, byte value) pairs into one row
            .select(
                "g",
                (F.col("p") / 8).cast("int").alias("byte"),
                F.expr("shiftleft(1, int(p % 8))").cast("int").alias("v"),
            )
            .groupBy("g", "byte")
            .agg(F.bit_or("v").alias("v"))
            .groupBy("g")
            .agg(F.collect_list(F.struct("byte", "v")).alias("bv"))
            .collect()
        )
        bufs: dict[int, bytearray] = {
            int(g): bytearray(bits // 8) for g in (groups or ())
        }
        for r in rows:
            buf = bufs.setdefault(int(r["g"]), bytearray(bits // 8))
            for e in r["bv"]:
                buf[int(e["byte"])] = int(e["v"])
        return {
            g: {
                "b64": base64.b64encode(bytes(buf)).decode("ascii"),
                "type": typ,
                "bits": bits,
                "k": k,
            }
            for g, buf in bufs.items()
        }

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        d = self._write_data_dir(df)
        return self._commit(
            self.latest_version(),
            [d],
            "overwrite",
            meta,
            schemas={d: df.schema.jsonValue()},
        )

    def append(
        self,
        df: DataFrame,
        meta: dict | None = None,
        partition: dict | None = None,
        stats_cols: Sequence[str] | None = None,
        bloom_cols: Sequence[str] | None = None,
        bloom_bits: int | None = None,
        bloom_k: int | None = None,
    ) -> int:
        """New version = parent's dirs + one new dir — no data rewrite.
        ``meta`` lands in the manifest (e.g. a streaming epoch id for
        exactly-once replay detection). ``partition`` declares constant
        column values for every row of this batch (e.g.
        ``{"lang": "en"}``); recorded in the manifest so
        ``read(where=...)`` can prune the dir without listing it. The
        declaration is trusted, like a Hive partition directory — write
        through validate_split/checked_append when the upstream isn't.
        ``stats_cols`` records this batch's per-column [min, max] in the
        manifest (one tiny agg job, computed from the WRITTEN data so it
        is never a trusted declaration): ``read(where=...,
        where_range=...)`` then skips dirs whose range cannot match —
        Iceberg-style file statistics at dir granularity. ``bloom_cols``
        additionally records a 4 KB Bloom filter per column — the
        POINT-LOOKUP complement of min/max for unordered keys (uuids,
        content hashes): ``read(where={key: v})`` skips every dir whose
        bloom proves the key absent, so finding one document in a
        100 TB corpus touches ~one dir instead of all of them. A false
        positive costs an extra dir read, never a wrong answer; like
        stats, blooms are computed from the written data.

        Stats and blooms are computed by READING BACK the committed
        parquet files, not by re-executing ``df``: a non-deterministic
        plan (sample, rand, unordered limit, task retry) evaluated once
        for the write and again for the metadata could record bounds
        that do not cover the written rows, and a later pruned read
        would silently drop them (ADVICE r7). The read-back costs one
        extra scan of the NEW dir only (page-cache warm), never of the
        table — the same reason Delta derives file stats from written
        footers."""
        d, stats_entry, bloom_entry = self._stage_append(
            df, stats_cols, bloom_cols, bloom_bits, bloom_k
        )
        while True:
            try:
                return self._publish_manifest(
                    self._append_manifest(
                        d, df.schema.jsonValue(), meta, partition,
                        stats_entry, bloom_entry,
                    )
                )
            except ConcurrentCommitError:
                continue  # re-resolve parent; the spooled dir is reusable

    def _stage_append(
        self,
        df: DataFrame,
        stats_cols: Sequence[str] | None = None,
        bloom_cols: Sequence[str] | None = None,
        bloom_bits: int | None = None,
        bloom_k: int | None = None,
    ) -> tuple[str, dict | None, dict | None]:
        """Spool the batch to a data dir + read back its stats/blooms
        WITHOUT committing — the staging half of ``append``, shared by
        the cross-table group commit (an unpublished dir is invisible
        to readers and swept by vacuum if never referenced)."""
        d = self._write_data_dir(df)
        stats_entry = bloom_entry = None
        if stats_cols or bloom_cols:
            try:
                written = self.spark.read.parquet(str(self.path / "data" / d))
                if stats_cols and bloom_cols:
                    # the stats agg and the bloom distinct are
                    # independent jobs over the same committed bytes —
                    # submit them together (guide §2.6) so the second
                    # back-fills the first's tail instead of idling
                    # through it; every append with both pays this pair
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=2) as pool:
                        f_stats = pool.submit(
                            self._column_stats, written, stats_cols
                        )
                        f_bloom = pool.submit(
                            self._bloom_build,
                            written, bloom_cols, bloom_bits, bloom_k,
                        )
                        stats_entry = f_stats.result()
                        bloom_entry = f_bloom.result()
                elif stats_cols:
                    stats_entry = self._column_stats(written, stats_cols)
                elif bloom_cols:
                    bloom_entry = self._bloom_build(
                        written, bloom_cols, bloom_bits, bloom_k
                    )
            except Exception:
                # never-committed spool dir: remove it rather than leave
                # an orphan for vacuum (e.g. bloom_cols on an unsupported
                # type raises, which used to happen before the write)
                shutil.rmtree(self.path / "data" / d, ignore_errors=True)
                raise
        return d, stats_entry, bloom_entry

    def _append_manifest(
        self,
        d: str,
        schema_json: dict,
        meta: dict | None,
        partition: dict | None,
        stats_entry: dict | None,
        bloom_entry: dict | None,
    ) -> dict:
        """The append manifest CONTENT against the CURRENT latest
        parent (unpublished) — the resolve-and-build half of ``append``,
        shared by the cross-table group commit."""
        parent = self.latest_version()
        if parent:
            pm = self._manifest(parent)
            dirs = pm["dirs"] + [d]
            parts, layouts, schemas, stats, blooms = self._dir_maps(
                pm, pm["dirs"]
            )
        else:
            dirs, parts, layouts, schemas, stats, blooms = (
                [d],
                {},
                {},
                {},
                {},
                {},
            )
        if partition:
            parts[d] = dict(partition)
        if stats_entry:
            stats[d] = stats_entry
        if bloom_entry:
            blooms[d] = bloom_entry
        schemas[d] = schema_json
        return self._build_manifest(
            parent,
            dirs,
            "append",
            meta,
            partitions=parts or None,
            layouts=layouts or None,
            schemas=schemas,
            stats=stats or None,
            blooms=blooms or None,
        )

    def merge(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        order_col: str | None = None,
        max_retries: int = 5,
        allow_missing_columns: bool = False,
        partition_by: Sequence[str] | None = None,
        prune_col: str | None = None,
    ) -> int:
        """MERGE (upsert): new rows win by key, survivors carry over —
        copy-on-write snapshot, optimistic retry on writer races. Each
        retry re-reads the NEW latest snapshot, so a concurrent commit's
        rows are merged, not lost (write skew is resolved by key: last
        committer's batch wins on overlapping keys).
        ``allow_missing_columns=True`` is the schema-evolution MERGE:
        columns on only one side survive as nulls (see
        operators/upsert.upsert_by_key).

        ``prune_col`` (must be one of ``keys``) is MERGE FILE PRUNING —
        the Delta-style optimization that makes upserts affordable on a
        100 TB table: the batch's [min, max] on that key is COMPUTED
        (one tiny agg job — never a trusted declaration), and dirs
        whose recorded ``stats_cols`` range cannot contain any batch
        key carry forward UNTOUCHED. Only intersecting dirs join the
        upsert; the batch's own rows land in the rewritten dir either
        way, so new keys are never lost. With time-ordered ingest
        (commit logs, event streams) a merge touches the recent tail,
        not the table. Dirs without stats on the key are conservatively
        rewritten; NULL batch keys cannot match any row by key equality
        and need no dir. Incompatible with ``partition_by`` (the
        rewritten dir would cover only part of the table)."""
        if prune_col is not None and prune_col not in keys:
            raise ValueError(f"prune_col {prune_col!r} must be one of keys {keys}")
        if prune_col is not None and partition_by:
            raise ValueError("prune_col and partition_by are mutually exclusive")
        if prune_col is not None and allow_missing_columns:
            # a schema-evolution merge must consolidate to ONE dir so
            # every later read sees the evolved column; pruning would
            # leave untouched dirs on the old schema and a default
            # (merge_schema=False) read silently drops the new column
            raise ValueError(
                "prune_col and allow_missing_columns are mutually exclusive — "
                "a schema-evolution merge must rewrite the whole snapshot"
            )
        v0 = self.latest_version()
        if prune_col is not None or (
            v0
            and (
                self._manifest(v0).get("blooms")
                or self._manifest(v0).get("stats")
            )
        ):
            # pin the batch before deriving metadata from it: the prune
            # decision, the recorded bounds, and the batch-side bloom
            # must describe the same rows the upsert writes, and a
            # non-deterministic batch plan (sample, rand, task retry)
            # re-evaluated by the write could contain keys outside a
            # pre-computed range — leaving an unrewritten dir that
            # actually held batch keys (ADVICE r7). The batch is the
            # small side of a merge, so materializing it is cheap at
            # any table size.
            batch = batch.localCheckpoint(eager=True)
        batch_rng = (
            self._column_stats(batch, [prune_col])[prune_col]
            if prune_col is not None
            else None
        )
        for _ in range(max_retries):
            parent = self.latest_version()
            m = self._manifest(parent) if parent else {"dirs": []}
            touched, untouched = list(m["dirs"]), []
            if parent and prune_col is not None and batch_rng[0] is not None:
                stats = m.get("stats") or {}

                def _overlaps(d: str) -> bool:
                    rng = stats.get(d, {}).get(prune_col)
                    if rng is None or rng[0] is None:
                        return True  # no stats: conservatively rewrite
                    if _meta_cmp(rng[0], batch_rng[1]) is False:
                        return False  # dir min > batch max
                    if _meta_cmp(batch_rng[0], rng[1]) is False:
                        return False  # dir max < batch min
                    return True

                touched = [d for d in m["dirs"] if _overlaps(d)]
                untouched = [d for d in m["dirs"] if d not in set(touched)]
            existing = (
                self._read_dirs(m, touched, allow_missing_columns)
                if parent and touched
                else None
            )
            merged = upsert_by_key(
                existing, batch, keys, order_col, allow_missing_columns
            )
            d = self._write_data_dir(merged, partition_by)
            parts, layouts, schemas, stats_map, blooms = self._dir_maps(
                m, untouched
            )
            schemas[d] = merged.schema.jsonValue()
            merged_bloom = self._merge_blooms(m, touched, batch)
            if merged_bloom:
                blooms[d] = merged_bloom
            if partition_by:
                layouts[d] = list(partition_by)
            # the rewritten dir holds touched survivors + the batch:
            # union-bounds over both keep EVERY recorded column's stats
            # usable (not just prune_col — r8; see _merge_stats for the
            # conservatism rules, which preserve the r7 review semantics
            # of never stamping batch-only bounds over an unknown
            # carried range).
            merged_stats = self._merge_stats(m, touched, batch)
            if merged_stats:
                stats_map[d] = merged_stats
            try:
                return self._commit(
                    parent,
                    untouched + [d],
                    "merge",
                    partitions=parts or None,
                    layouts=layouts or None,
                    schemas=schemas,
                    stats=stats_map or None,
                    blooms=blooms or None,
                )
            except ConcurrentCommitError:
                shutil.rmtree(self.path / "data" / d, ignore_errors=True)
        raise ConcurrentCommitError(f"merge lost {max_retries} races at {self.path}")

    def delete_where(
        self,
        condition: str,
        max_retries: int = 5,
        range_hint: dict | None = None,
    ) -> int:
        """Transactional DELETE — copy-on-write of the surviving rows.
        A no-op (returns the current version, commits nothing) on a
        never-written table: SQL DELETE from an empty relation deletes
        zero rows, it does not error (edge surfaced by the
        IncrementalAggView property test's delete-first sequences).

        ``range_hint={"col": (lo, hi)}`` is file-level delete pruning
        (what Delta does with file stats): dirs whose recorded
        ``stats_cols`` range cannot intersect the hint are carried
        forward UNTOUCHED — no read, no rewrite — and only intersecting
        dirs are rewritten. The hint is a caller CONTRACT, like a Hive
        partition declaration: the condition must imply
        ``col BETWEEN lo AND hi`` (a wrong hint silently skips rows the
        condition would have deleted). Dirs without recorded stats are
        conservatively rewritten. At 100 TB a retention delete
        ("drop last week") rewrites the handful of dirs under the
        window instead of the whole table."""
        for _ in range(max_retries):
            parent = self.latest_version()
            if parent == 0:
                return 0
            m = self._manifest(parent)
            touched, untouched = list(m["dirs"]), []
            if range_hint:
                stats = m.get("stats") or {}

                def _intersects(d: str) -> bool:
                    for col, (lo, hi) in range_hint.items():
                        rng = stats.get(d, {}).get(col)
                        if rng is None or rng[0] is None:
                            return True  # no stats: conservatively rewrite
                        if hi is not None and _meta_cmp(rng[0], hi) is False:
                            return False  # dir min > hi
                        if lo is not None and _meta_cmp(lo, rng[1]) is False:
                            return False  # dir max < lo
                    return True

                touched = [d for d in m["dirs"] if _intersects(d)]
                untouched = [d for d in m["dirs"] if d not in set(touched)]
                if not touched:
                    return parent  # stats prove nothing matches: no commit
            # ANSI DELETE semantics: only rows where the condition is
            # TRUE are deleted — a NULL condition (e.g. a range test on
            # a null timestamp) KEEPS the row. `NOT (cond)` alone would
            # silently drop null-condition rows.
            survivors = self._read_dirs(m, touched, merge_schema=False).where(
                f"NOT coalesce(({condition}), false)"
            )
            d = self._write_data_dir(survivors)
            parts, layouts, schemas, stats_map, blooms = self._dir_maps(
                m, untouched
            )
            schemas[d] = survivors.schema.jsonValue()
            # conservative stats for the rewritten dir: survivors are a
            # subset of the touched dirs, so the union of their recorded
            # ranges bounds the new dir (possibly wider than actual) —
            # later range-pruned reads and hinted deletes keep working
            # across deletes instead of degrading to always-rewrite.
            # Same argument for blooms (OR-union is a superset bloom).
            shared = self._union_stats(m.get("stats") or {}, touched)
            if shared:
                stats_map[d] = shared
            bloom_u = self._union_blooms(m.get("blooms") or {}, touched)
            if bloom_u:
                blooms[d] = bloom_u
            try:
                return self._commit(
                    parent,
                    untouched + [d],
                    "delete",
                    partitions=parts or None,
                    layouts=layouts or None,
                    schemas=schemas,
                    stats=stats_map or None,
                    blooms=blooms or None,
                )
            except ConcurrentCommitError:
                shutil.rmtree(self.path / "data" / d, ignore_errors=True)
        raise ConcurrentCommitError(f"delete lost {max_retries} races at {self.path}")

    def delete_keys(
        self,
        keys,
        on: str,
        max_retries: int = 5,
        max_keys: int = 100_000,
    ) -> int:
        """Transactional anti-join DELETE of an explicit key set — the
        right-to-be-forgotten / takedown primitive: erase these ids
        from a 100 TB table (and, called on each derived index, from
        its postings) without a full-table condition scan.

        ``keys`` is a sequence of values or a 1-column DataFrame
        (collected driver-side, capped at ``max_keys`` — an erasure
        batch is a request queue of thousands of ids, never data-sized;
        bigger sweeps belong to ``delete_where``). Dir pruning mirrors
        ``read(where_in=...)``: a dir is rewritten only when at least
        one key survives its partition spec, min/max stats, AND Bloom
        checks (append with ``stats_cols``/``bloom_cols`` on the key
        column to make this bite) — erasing one document from an
        id-ordered corpus rewrites ~one dir, and dirs the metadata
        proves clean are carried forward byte-untouched, stats/blooms
        and all. Row filtering is a broadcast LEFT ANTI join, which
        keeps NULL-key rows (SQL semantics: NULL never equals an
        erasure id). If every dir is provably clean the call commits
        NOTHING and returns the current version — an idempotent retry
        of an already-applied erasure is free."""
        from pyspark.sql import functions as F

        if isinstance(keys, DataFrame):
            if len(keys.columns) != 1:
                raise ValueError(
                    f"keys DataFrame must have exactly one column, got "
                    f"{keys.columns} — select the key column explicitly"
                )
            rows = keys.limit(max_keys + 1).collect()
            vals = [r[0] for r in rows]
        else:
            vals = list(keys)
        if len(vals) > max_keys:
            raise ValueError(
                f"{len(vals)}+ erasure keys exceeds max_keys={max_keys} — "
                "an erasure batch is a bounded request queue; stage a "
                "condition and use delete_where for data-sized sweeps"
            )
        if not vals:
            raise ValueError("empty key set — nothing to erase")
        if any(v is None for v in vals):
            raise ValueError(
                "None in erasure keys — NULL never matches a row key; "
                "filter nulls out explicitly"
            )
        keys_df = self.spark.createDataFrame([(v,) for v in vals], [on]).distinct()
        for _ in range(max_retries):
            parent = self.latest_version()
            if parent == 0:
                return 0
            m = self._manifest(parent)
            specs = m.get("partitions") or {}
            stats = m.get("stats") or {}
            blooms = m.get("blooms") or {}
            # hash every (value, recorded bloom geometry) pair once, in
            # one local job (the read(where_in=) probe pattern)
            probes, seen = [], set()
            for d in m["dirs"]:
                bl = blooms.get(d, {}).get(on)
                if bl is not None:
                    for v in vals:
                        pk = (on, v, bl["type"], bl.get("bits"), bl.get("k"))
                        if pk not in seen:
                            seen.add(pk)
                            probes.append((pk, bl))
            pos_map = dict(
                zip(
                    [pk for pk, _ in probes],
                    self._bloom_positions_many([(bl, pk[1]) for pk, bl in probes]),
                )
            )
            # the SAME point-pruning rule the read path uses (shared
            # method — scan and erasure can never disagree about which
            # dirs might hold a key)
            touched = [
                d
                for d in m["dirs"]
                if any(
                    not self._dir_point_excludes(
                        specs, stats, blooms, pos_map, d, on, v
                    )
                    for v in vals
                )
            ]
            if not touched:
                return parent  # metadata proves nothing matches: no commit
            untouched = [d for d in m["dirs"] if d not in set(touched)]
            base = self._read_dirs(m, touched, merge_schema=False)
            # a name-join reorders the key column to the front — restore
            # the stored column order so rewritten dirs keep the schema
            survivors = base.join(F.broadcast(keys_df), on, "left_anti").select(
                *base.columns
            )
            d = self._write_data_dir(survivors)
            parts, layouts, schemas, stats_map, blooms_map = self._dir_maps(
                m, untouched
            )
            schemas[d] = survivors.schema.jsonValue()
            # conservative carry for the rewritten dir, exactly as
            # delete_where: union of the touched dirs' ranges/blooms
            # bounds the surviving subset
            shared = self._union_stats(m.get("stats") or {}, touched)
            if shared:
                stats_map[d] = shared
            bloom_u = self._union_blooms(m.get("blooms") or {}, touched)
            if bloom_u:
                blooms_map[d] = bloom_u
            try:
                return self._commit(
                    parent,
                    untouched + [d],
                    "delete",
                    partitions=parts or None,
                    layouts=layouts or None,
                    schemas=schemas,
                    stats=stats_map or None,
                    blooms=blooms_map or None,
                )
            except ConcurrentCommitError:
                shutil.rmtree(self.path / "data" / d, ignore_errors=True)
        raise ConcurrentCommitError(f"delete_keys lost {max_retries} races at {self.path}")

    def bloom_fpr_estimates(self, col: str, version: int | None = None) -> dict:
        """Estimated false-positive rate per dir of the recorded bloom
        on ``col``: fill_fraction ** k — the standard Bloom estimate
        (p ≈ (set bits / bits)^k), computed from the 4 KB bitmaps in
        the manifest alone, no data read. The maintenance signal for
        :meth:`retighten_blooms`: union blooms carried through
        copy-on-write rewrites (delete_keys / delete_where / optimize)
        are SUPERSETS by construction — every rewrite ORs the touched
        dirs' bitmaps, so repeated erasures monotonically raise the
        survivor dir's fill and with it the odds the NEXT erasure
        false-positives into rewriting it again (the 1↔9 bounce in
        BASELINE.md's r12 erasure growth table)."""
        import base64

        v = version or self.latest_version()
        if v == 0:
            return {}
        m = self._manifest(v)
        out: dict = {}
        for d in m["dirs"]:
            bl = (m.get("blooms") or {}).get(d, {}).get(col)
            if not bl:
                continue
            buf = base64.b64decode(bl["b64"])
            fill = sum(bin(b).count("1") for b in buf) / bl["bits"]
            out[d] = fill ** bl["k"]
        return out

    def retighten_blooms(
        self,
        cols: Sequence[str],
        fpr_threshold: float = 0.05,
        max_retries: int = 5,
    ) -> list[str]:
        """Metadata-only bloom + stats re-tighten (r13, the decay half
        of the erasure bounce): every dir whose ESTIMATED bloom FPR on
        any listed column exceeds ``fpr_threshold`` gets its blooms and
        min-max stats rebuilt from a read-back of its OWN rows — at a
        geometry RESIZED to the dir's actual distinct-key count (~10
        bits/key, never narrower than recorded, never wider than
        ``BLOOM_RESIZE_CAP_BITS`` — the manifest-inlining cap;
        copy-on-write erasures consolidate many dirs' survivors into
        one, so the inherited geometry can be genuinely outgrown, not
        just stale) — committed
        as a ``retighten`` manifest that re-references every data dir
        byte-untouched (cheaper than an OPTIMIZE: no data rewrite, no
        copy-on-write churn; run it AS the fpr-keyed optimize trigger
        after takedown batches). A dir whose bloom was built from its
        own rows at the right size sits far under any sane threshold,
        so only union-bloom survivors qualify and repeated erasures
        stop bouncing off their accumulated false positives. A dir can
        still sit over threshold AFTER an own-rows rebuild when its
        distinct-key count outgrows ``BLOOM_RESIZE_CAP_BITS`` — the
        rebuild is idempotent there, so entries are stamped
        ``src: "own"`` and the staleness scan EXCLUDES them (r15,
        ADVICE: without the marker every maintenance tick re-read the
        capped dir's full rows, rebuilt an identical bitmap, and
        committed a no-op ``retighten`` manifest forever). Returns
        the re-tightened dir names ([] = nothing over threshold or
        nothing actually changed, no commit)."""
        from pyspark.sql import functions as F

        cols = list(cols)
        for _ in range(max_retries):
            parent = self.latest_version()
            if parent == 0:
                return []
            m = self._manifest(parent)
            ests = {c: self.bloom_fpr_estimates(c, parent) for c in cols}
            all_blooms_scan = m.get("blooms") or {}
            stale = [
                d
                for d in m["dirs"]
                if any(
                    ests[c].get(d, 0.0) > fpr_threshold
                    # src=="own" → bloom already rebuilt from this dir's
                    # own rows at capped-or-right geometry; a re-rebuild
                    # is bitwise identical, so the dir is settled even
                    # though its capped FPR estimate stays elevated
                    and all_blooms_scan.get(d, {}).get(c, {}).get("src") != "own"
                    for c in cols
                )
            ]
            if not stale:
                return []
            parts, layouts, schemas, stats_map, blooms_map = self._dir_maps(
                m, m["dirs"]
            )
            all_blooms = m.get("blooms") or {}
            changed: list[str] = []
            for d in stale:
                rows = self._read_dirs(m, [d], merge_schema=False)
                rebuilt: dict = {}
                for c in cols:
                    old = all_blooms.get(d, {}).get(c)
                    if old is None or c not in rows.columns:
                        continue
                    # re-SIZE, not just re-set: copy-on-write erasures
                    # consolidate many dirs' survivors into one, so the
                    # dir's genuine distinct-key count can outgrow the
                    # geometry its parents were appended with — rebuild
                    # at ~10 bits/key (the append guidance), never
                    # narrower than recorded; per-dir geometry is
                    # recorded in the entry and probes replay it, so
                    # mixed geometries across dirs stay correct
                    n_distinct = rows.where(F.col(c).isNotNull()).agg(
                        F.countDistinct(c)
                    ).collect()[0][0]
                    bits = max(int(old["bits"]), _bloom_bits_for(n_distinct))
                    entry = self._bloom_build(rows, [c], bits, old["k"])
                    # own-rows provenance marker: the scan above skips
                    # src=="own" dirs, ending the capped-dir livelock
                    entry[c]["src"] = "own"
                    rebuilt.update(entry)
                if not rebuilt:
                    continue
                if all(
                    all_blooms.get(d, {}).get(c) == e for c, e in rebuilt.items()
                ):
                    # idempotent rebuild (marker already recorded,
                    # bitmap identical) — nothing to commit for this dir
                    continue
                changed.append(d)
                blooms_map[d] = {**all_blooms.get(d, {}), **rebuilt}
                # stats re-tighten rides along: the same read-back
                # yields exact bounds for the columns whose recorded
                # ranges were union-widened by the same rewrites
                stat_cols = [
                    c for c in (m.get("stats") or {}).get(d, {}) if c in rows.columns
                ]
                if stat_cols:
                    stats_map[d] = self._column_stats(rows, stat_cols)
            if not changed:
                # every stale candidate rebuilt to an identical entry —
                # committing would be pure version/history churn
                return []
            try:
                self._commit(
                    parent,
                    m["dirs"],
                    "retighten",
                    partitions=parts or None,
                    layouts=layouts or None,
                    schemas=schemas or None,
                    stats=stats_map or None,
                    blooms=blooms_map or None,
                )
                return changed
            except ConcurrentCommitError:
                continue  # metadata-only: nothing to clean up, re-resolve
        raise ConcurrentCommitError(
            f"retighten_blooms lost {max_retries} races at {self.path}"
        )

    def restore(self, version: int) -> int:
        """Roll the table back to an earlier snapshot AS A NEW COMMIT
        (lakehouse RESTORE semantics): history is append-only, so the
        bad versions stay inspectable, readers mid-query on them are
        unaffected, and the rollback itself can race other writers like
        any commit. No data is copied — the new manifest re-references
        the restored version's dirs (so vacuum keeps them live)."""
        rm = self._manifest(version)
        dirs = rm["dirs"]
        parts, layouts, schemas, stats, blooms = self._dir_maps(rm, dirs)
        while True:
            try:
                return self._commit(
                    self.latest_version(),
                    dirs,
                    "restore",
                    {"restored_from": version},
                    partitions=parts or None,
                    layouts=layouts or None,
                    schemas=schemas or None,
                    stats=stats or None,
                    blooms=blooms or None,
                )
            except ConcurrentCommitError:
                continue

    def optimize(
        self,
        zorder_by: Sequence[str] | None = None,
        target_partitions: int | None = None,
        max_retries: int = 5,
        partition_by: Sequence[str] | None = None,
    ) -> int:
        """Snapshot compaction (the OPTIMIZE half of the lakehouse
        lifecycle): rewrite the current snapshot — K append dirs and
        their small files — into one fresh dir, optionally Z-order
        clustered (operators/maintenance.zorder_sort) so min-max file
        skipping works on the listed columns. ``partition_by`` keeps
        (or introduces) a Hive layout in the compacted dir — without it
        a compaction would silently FLATTEN a partitioned table and
        every subsequent pruned read degrades to a full scan. Copy-on-
        write like merge: readers of old versions are untouched, a
        racing writer costs a retry, and the superseded dirs age out
        via vacuum()."""
        from hapiy_etl_spark.operators.maintenance import zorder_sort

        for _ in range(max_retries):
            parent = self.latest_version()
            snap = self.read(parent, merge_schema=True)
            if zorder_by:
                snap = zorder_sort(
                    snap, list(zorder_by), num_partitions=target_partitions
                )
            elif target_partitions:
                snap = snap.coalesce(target_partitions)
            d = self._write_data_dir(snap, partition_by)
            # carry union-bounds stats AND OR-union blooms into the
            # compacted dir — without this one OPTIMIZE would silently
            # discard every dir's pruning metadata and later range
            # reads / point lookups degrade to full scans of exactly
            # the large dir they most need to skip
            m = self._manifest(parent)
            shared = self._union_stats(m.get("stats") or {}, m["dirs"])
            bloom_u = self._union_blooms(m.get("blooms") or {}, m["dirs"])
            try:
                return self._commit(
                    parent,
                    [d],
                    "optimize",
                    schemas={d: snap.schema.jsonValue()},
                    layouts={d: list(partition_by)} if partition_by else None,
                    stats={d: shared} if shared else None,
                    blooms={d: bloom_u} if bloom_u else None,
                )
            except ConcurrentCommitError:
                shutil.rmtree(self.path / "data" / d, ignore_errors=True)
        raise ConcurrentCommitError(f"optimize lost {max_retries} races at {self.path}")

    def optimize_clustered(
        self,
        cluster_by: str | Sequence[str],
        n_dirs: int = 8,
        stats_cols: Sequence[str] | None = None,
        bloom_cols: Sequence[str] | None = None,
        bloom_bits: int | None = None,
        bloom_k: int | None = None,
        max_retries: int = 5,
    ) -> int:
        """Range-CLUSTERED compaction: rewrite the snapshot as
        ``n_dirs`` dirs clustered on ``cluster_by``, each with TIGHT
        per-dir stats (and blooms) computed from a read-back of its
        written files. Plain ``optimize()`` compacts to one dir whose
        union-bounds stats span the whole table — correct but useless
        for pruning, so a compaction silently destroys the dir-skipping
        an append-mostly table accumulated. This is the Delta
        ``OPTIMIZE ZORDER``-to-many-files analogue at dir granularity:
        after it, a range or point read on the cluster key touches ~one
        of n dirs.

        ``cluster_by`` may be a LIST of numeric columns (r9): buckets
        then come from percentiles of the Morton Z-order interleave of
        the min-max-scaled columns (operators/maintenance.zorder_key),
        so a slice predicated on EVERY listed column prunes to ~one dir
        — single-column range clustering makes a two-predicate slice
        scan every dir that matches the first column alone.
        ``stats_cols`` defaults to the cluster columns (each dir records
        tight per-column bounds, which is what makes the multi-column
        prune exact regardless of boundary placement).

        Blooms (r9): with ``bloom_cols`` explicit, each dir blooms
        those columns at the given geometry. With ``bloom_cols=None``,
        the columns AND geometry are INHERITED from the parent
        manifest's newest blooming dir — the same inheritance MERGE
        uses — so a table that accumulated bloom pruning keeps it
        through a re-clustering instead of silently degrading point
        lookups to full scans (the r8 merge fix, applied to the
        clustered rewrite's read-back pass).

        Scale shape: ONE distributed pass — approximate percentile
        boundaries on the cluster key (one agg; boundary precision only
        affects bucket balance, never pruning exactness, because each
        dir's recorded bounds derive from read-back), one shuffle-write
        into a Hive-partitioned spool on the computed bucket id, then
        the bucket subdirs are PROMOTED to data dirs by rename (no
        second copy); per-dir metadata derives from reading back the
        committed files (the same provably-covering contract appends
        use). Ties and skew are safe: equal keys land in one bucket
        (dirs may be uneven, their recorded bounds stay exact); empty
        buckets are skipped."""
        from pyspark.sql import functions as F

        cols = [cluster_by] if isinstance(cluster_by, str) else list(cluster_by)
        if not cols:
            raise ValueError("cluster_by must name at least one column")
        stats_cols = list(stats_cols) if stats_cols is not None else list(cols)
        if n_dirs < 1:
            raise ValueError(f"n_dirs must be >= 1: {n_dirs}")
        for _ in range(max_retries):
            parent = self.latest_version()
            snap = self.read(parent, merge_schema=True)
            missing = [c for c in cols if c not in snap.columns]
            if missing:
                raise ValueError(
                    f"cluster_by {missing!r} not in snapshot columns "
                    f"{snap.columns}"
                )
            if len(cols) == 1:
                keycol = F.col(cols[0])
            else:
                # Morton interleave of min-max-scaled columns. Bounds
                # come from one scalar agg (driver literals — boundary
                # precision affects balance only); a NULL in any column
                # scales to 0, so all-NULL rows land in bucket 0 like
                # the single-column NULLS FIRST behavior.
                from hapiy_etl_spark.operators.maintenance import zorder_key

                zbits = min(16, 63 // len(cols))
                brow = snap.agg(
                    *[F.min(c).alias(f"__mn_{c}") for c in cols],
                    *[F.max(c).alias(f"__mx_{c}") for c in cols],
                ).collect()[0]
                scaled = []
                for c in cols:
                    mn, mx = brow[f"__mn_{c}"], brow[f"__mx_{c}"]
                    if mn is None or mx is None or mx <= mn:
                        scaled.append(F.lit(0).cast("long"))
                        continue
                    span = float(mx) - float(mn)
                    scaled.append(
                        F.coalesce(
                            F.least(
                                F.floor(
                                    (F.col(c) - F.lit(mn))
                                    / F.lit(span)
                                    * F.lit((1 << zbits) - 1)
                                ),
                                F.lit((1 << zbits) - 1),
                            ),
                            F.lit(0),
                        ).cast("long")
                    )
                keycol = zorder_key(scaled, zbits)
            qs = [i / n_dirs for i in range(1, n_dirs)]
            if qs:
                # approx_percentile, not exact percentile: the exact
                # form buffers every value per partition (a scale-killer
                # at 100 TB), and boundary precision only affects bucket
                # BALANCE — each dir's recorded bounds come from reading
                # back its written files, so pruning stays exact no
                # matter where the boundaries land
                bounds = (
                    snap.select(keycol.alias("__ck"))
                    .where(F.col("__ck").isNotNull())
                    .agg(
                        F.expr(
                            "approx_percentile(__ck, array("
                            + ",".join(str(q) for q in qs)
                            + "), 10000)"
                        ).alias("b")
                    )
                    .collect()[0]["b"]
                ) or []
            else:
                bounds = []
            # bucket id = how many boundaries the key has passed; NULL
            # keys sort first (bucket 0), matching NULLS FIRST reads
            b = F.lit(0)
            for bound in bounds:
                b = b + F.when(keycol > F.lit(bound), 1).otherwise(0)
            # the spool bucket column must not collide with a real
            # column — withColumn would silently REPLACE it and the
            # partitionBy would then strip it from the rewritten files.
            # withColumn resolves case-INSENSITIVELY by default, so the
            # guard must compare case-folded names ('__B' collides too)
            taken = {c.lower() for c in snap.columns}
            bcol = "__b"
            while bcol.lower() in taken:
                bcol = f"__b_{uuid.uuid4().hex[:8]}"
            # bloom inheritance (r9): with no explicit bloom_cols, the
            # parent's bloomed columns + geometry carry through the
            # rewrite — newest blooming dir wins per column, the same
            # rule _merge_blooms uses for batch-only dirs
            inherited: dict[str, tuple[int, int]] = {}
            if bloom_cols is None and parent:
                pm = self._manifest(parent)
                pbl = pm.get("blooms") or {}
                for pd_ in reversed(pm["dirs"]):
                    for col, entry in (pbl.get(pd_) or {}).items():
                        inherited.setdefault(
                            col,
                            (
                                int(entry.get("bits", self.BLOOM_BITS)),
                                int(entry.get("k", self.BLOOM_K)),
                            ),
                        )
            spool = self.path / "data" / f".opt-{uuid.uuid4().hex[:12]}"
            snap.withColumn(bcol, b.cast("int")).write.partitionBy(
                bcol
            ).parquet(str(spool))
            dirs, schemas, stats, blooms = [], {}, {}, {}
            try:
                subs = sorted(
                    spool.glob(f"{bcol}=*"),
                    key=lambda p: int(p.name[len(bcol) + 1 :]),
                )
                # Per-dir metadata from ONE grouped pass over the spool
                # (optimization r15, guide §1.2 "remove passes"): the
                # per-dir read-back loop ran ONE stats job + one bloom
                # job per column PER DIR — n_dirs x cols tiny jobs whose
                # driver-side scheduling gaps dominated the compaction
                # (measured: 48 jobs / 3.1 s of gaps on the zorder
                # slice). The spool files ARE the committed bytes (the
                # rename below moves, never rewrites them), so grouping
                # by the spool's partition column reads back exactly the
                # written data — the provably-covering contract is
                # unchanged. Bucket subdir order maps 1:1 to dir order.
                buckets = [int(p.name[len(bcol) + 1 :]) for p in subs]
                bloom_geoms: dict[str, tuple[int, int]] = {}
                if bloom_cols:
                    for col in bloom_cols:
                        bloom_geoms[col] = (
                            int(bloom_bits or self.BLOOM_BITS),
                            int(bloom_k or self.BLOOM_K),
                        )
                else:
                    for col, (bb, bk) in inherited.items():
                        if col in snap.columns:
                            bloom_geoms[col] = (bb, bk)
                if subs:
                    written_all = self.spark.read.parquet(str(spool))
                    stats_by_bucket = self._grouped_column_stats(
                        written_all, bcol, stats_cols
                    )
                    blooms_by_bucket: dict[int, dict] = {}
                    for col, (bb, bk) in bloom_geoms.items():
                        # groups=buckets: a bucket whose bloom column is
                        # entirely NULL still records an all-zero bloom,
                        # exactly as the per-dir read-back did (ADVICE
                        # r15) — it prunes every probe against that dir
                        for bkt, entry in self._grouped_bloom_build(
                            written_all, bcol, col, bb, bk, groups=buckets
                        ).items():
                            blooms_by_bucket.setdefault(bkt, {})[col] = entry
                    # every bucket file was written by the one snapshot
                    # job above — a single schema read covers all dirs
                    schema_json = self.spark.read.parquet(
                        str(subs[0])
                    ).schema.jsonValue()
                for sub, bkt in zip(subs, buckets):
                    d = f"s-{uuid.uuid4().hex[:12]}"
                    os.rename(sub, self.path / "data" / d)
                    dirs.append(d)
                    schemas[d] = schema_json
                    stats[d] = stats_by_bucket.get(
                        bkt, {c: [None, None] for c in stats_cols}
                    )
                    if blooms_by_bucket.get(bkt):
                        blooms[d] = blooms_by_bucket[bkt]
                if not dirs:
                    # an empty snapshot writes no bucket subdirs; a
                    # manifest needs at least one dir to carry the schema
                    d = self._write_data_dir(snap)
                    dirs.append(d)
                    written = self.spark.read.parquet(
                        str(self.path / "data" / d)
                    )
                    schemas[d] = written.schema.jsonValue()
                    stats[d] = self._column_stats(written, stats_cols)
                    # the empty-fallback dir records all-zero blooms too
                    # (ADVICE r15): they prune every probe, same as the
                    # per-dir read-back form recorded for a rowless dir
                    empty_blooms = {
                        col: self._bloom_build(written, [col], bb, bk)[col]
                        for col, (bb, bk) in bloom_geoms.items()
                        if col in written.columns
                    }
                    if empty_blooms:
                        blooms[d] = empty_blooms
            except Exception:
                for d in dirs:
                    shutil.rmtree(self.path / "data" / d, ignore_errors=True)
                shutil.rmtree(spool, ignore_errors=True)
                raise
            shutil.rmtree(spool, ignore_errors=True)
            try:
                return self._commit(
                    parent,
                    dirs,
                    "optimize",
                    schemas=schemas,
                    stats=stats,
                    blooms=blooms or None,
                )
            except ConcurrentCommitError:
                for d in dirs:
                    shutil.rmtree(self.path / "data" / d, ignore_errors=True)
        raise ConcurrentCommitError(
            f"optimize_clustered lost {max_retries} races at {self.path}"
        )

    # -- maintenance ----------------------------------------------------------
    def vacuum(self, keep_last: int = 1, min_age_s: float = 3600.0) -> list[str]:
        """Drop data dirs referenced only by manifests older than the
        last ``keep_last`` versions, plus debris from aborted writes.
        Time travel stays valid for the kept versions.

        ``min_age_s`` is the concurrency guard (same role as Delta's
        vacuum retention): a writer spools its data dir BEFORE the
        manifest commit, so an unreferenced dir younger than the window
        may be an in-flight write, not garbage — only dirs (and temp
        manifests) older than the window are removed. Keep it above the
        longest plausible write duration.

        The return value lists EVERYTHING removed — data dirs and
        manifest files — so a caller can audit exactly which versions
        lost time-travel. Manifests below the keep window honor the
        same ``min_age_s`` gate as data dirs: destroying time-travel
        metadata is irreversible, so a default-retention vacuum never
        touches anything younger than the window."""
        import time as _time

        latest = self.latest_version()
        keep_from = max(1, latest - keep_last + 1)
        cutoff = _time.time() - min_age_s
        removed = []
        # Age-gated manifest drop first: only manifests BOTH below the
        # keep window AND older than the retention window go. Survivors
        # (young, below-window) keep their dirs live so time travel to
        # them stays valid until a later vacuum ages them out.
        surviving = []
        for v in range(1, latest + 1):
            p = self.path / "_tx" / f"v{v:08d}.json"
            if not p.exists():
                continue
            if v < keep_from and p.stat().st_mtime < cutoff:
                p.unlink(missing_ok=True)
                removed.append(p.name)
            else:
                surviving.append(v)
        live: set[str] = set()
        for v in surviving:
            live.update(self._manifest(v)["dirs"])
        for d in (self.path / "data").iterdir():
            if d.name not in live and d.stat().st_mtime < cutoff:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(d.name)
        for tmp in (self.path / "_tx").glob(".tmp-*"):
            if tmp.stat().st_mtime < cutoff:
                tmp.unlink(missing_ok=True)
        return sorted(removed)


# -- cross-table atomic group commit ----------------------------------------
# The online-dedup sink appends to TWO tables per micro-batch (corpus +
# signature index). Before r14 their consistency hung on commit ORDER
# (corpus first) plus heal-on-replay reasoning; the group commit removes
# the window entirely (VERDICT r13 item 6): both appends stage invisibly,
# ONE journal record holding the exact manifest bytes of both tables is
# created atomically — THE commit point — and the manifests then publish
# from it. A crash anywhere leaves either (a) no record: neither table
# advanced, staged dirs are vacuum debris, the replay recomputes both; or
# (b) a record: ``txgroup_recover`` re-publishes the missing manifests
# verbatim before the next batch runs — a generic journal roll-forward,
# no domain-specific self-heal reasoning. Requires the single-writer
# setting a checkpointed streaming sink guarantees per table.


def txgroup_commit_appends(group_path: str, appends: list[dict]) -> list[int]:
    """Atomically append one batch to SEVERAL TxTables.

    ``appends``: one dict per table — ``{"table": TxTable, "df":
    DataFrame, "meta": ..., "partition": ..., "stats_cols": ...,
    "bloom_cols": ...}``. All stage (data dirs written, stats/blooms
    read back), all manifests build against their current parents, then
    ONE group record (tmp + fsync + exclusive hard-link, the same
    atomicity as a manifest publish) journals every manifest's exact
    content; the publishes follow in list order and the record unlinks
    when all of them exist. Returns the committed versions."""
    gp = Path(group_path)
    gp.mkdir(parents=True, exist_ok=True)
    # Stage CONCURRENTLY (optimization r16, guide §2.6): each table's
    # spool write (+ stats/bloom read-back) is an independent Spark
    # job, and the driver previously submitted them back-to-back so the
    # cluster idled through each one's tail. Staging order is
    # irrelevant — nothing is visible until the group record publishes,
    # and the manifests build sequentially below AFTER all stages — so
    # overlapping 2-3 jobs changes no byte of what commits. A failed
    # stage propagates before any manifest is built, leaving only
    # unreferenced spool dirs (vacuum debris), same as the serial form.
    from concurrent.futures import ThreadPoolExecutor

    def _stage(a):
        t = a["table"]
        d, se, be = t._stage_append(
            a["df"], a.get("stats_cols"), a.get("bloom_cols")
        )
        return (t, a, d, se, be)

    if len(appends) > 1:
        with ThreadPoolExecutor(max_workers=min(4, len(appends))) as pool:
            staged = list(pool.map(_stage, appends))
    else:
        staged = [_stage(a) for a in appends]
    manifests = [
        (
            t,
            t._append_manifest(
                d, a["df"].schema.jsonValue(), a.get("meta"),
                a.get("partition"), se, be,
            ),
        )
        for t, a, d, se, be in staged
    ]
    record = {
        "ts": time.time(),
        "tables": [
            {"path": str(t.path), "manifest": m} for t, m in manifests
        ],
    }
    rid = uuid.uuid4().hex[:16]
    rp = gp / f"g-{rid}.json"
    tmp = gp / f".tmp-{rid}"
    with open(tmp, "w") as f:
        f.write(json.dumps(record))
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, rp)  # THE commit point: all-or-nothing from here
    finally:
        tmp.unlink(missing_ok=True)
    versions = []
    for t, m in manifests:
        versions.append(_txgroup_publish(t, m))
    rp.unlink(missing_ok=True)
    return versions


def _txgroup_publish(t: "TxTable", m: dict) -> int:
    """Publish a journaled manifest, tolerating an identical file that
    a concurrent recovery already published; any OTHER content at the
    version is a single-writer violation and raises."""
    try:
        return t._publish_manifest(m)
    except ConcurrentCommitError:
        if t._manifest(m["version"]) == m:
            return m["version"]
        raise


def txgroup_recover(spark: SparkSession, group_path: str) -> int:
    """Roll forward interrupted group commits: for every journal record,
    publish each member manifest that is not on disk yet (verbatim from
    the record — byte-identical to what the crashed writer would have
    published), then drop the record. Returns the number of manifests
    published. Run before a sink's first batch (``ingest_dedup_batch``
    does); with no records it is one empty directory listing."""
    gp = Path(group_path)
    if not gp.exists():
        return 0
    published = 0
    for rp in sorted(gp.glob("g-*.json")):
        rec = json.loads(rp.read_text())
        for entry in rec["tables"]:
            t = TxTable(spark, entry["path"])
            m = entry["manifest"]
            p = t.path / "_tx" / f"v{m['version']:08d}.json"
            if p.exists():
                if json.loads(p.read_text()) != m:
                    raise RuntimeError(
                        f"group record {rp.name} conflicts with published "
                        f"v{m['version']} at {t.path} — a second writer "
                        "committed this version with different content; "
                        "the group commit requires single-writer tables"
                    )
                continue
            if t.latest_version() >= m["version"]:
                raise RuntimeError(
                    f"group record {rp.name} is stale: {t.path} is past "
                    f"v{m['version']} but that manifest is gone (vacuumed?) "
                    "— refusing to re-create a historical version"
                )
            t._publish_manifest(m)
            published += 1
        rp.unlink(missing_ok=True)
    return published
