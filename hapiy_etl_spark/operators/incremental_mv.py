"""Incrementally-maintained materialized aggregate view over a TxTable.

The lakehouse "dynamic table" capability: a per-group aggregate that
refreshes by reading ONLY the data files added since its last refresh,
never rescanning history. The reference re-aggregates nothing (its KV
sink holds raw rows, `git_etl.ts:127-132`); this is the target-surface
generalization for the 100 TB posture — refresh cost is proportional to
NEW data, while a naive view recompute is proportional to the table.

Mechanics:
- A TxTable append commit's manifest lists the snapshot's data dirs as
  parent dirs + one new dir (`txstore.py:append`), so "what's new since
  version v" is a dir-set difference — no file-level diffing, no change
  feed infra.
- The view stores per-group ALGEBRAIC PARTIALS (count / decimal sum /
  min / max), not finalized values: merging a batch is
  `re-aggregate(old_partials ∪ partials(new_rows))`, the same
  mergeability contract `incremental_agg_merge` oracle-proves
  (queries/aggregates.py). avg is finalized from sum/count at read
  time, never stored (it does not merge).
- The view itself is a TxTable: its refresh commit atomically carries
  `{source_version, dirs_seen}` in the manifest meta, so view content
  and refresh cursor can never disagree (a crash between them is
  impossible by construction), and a restart resumes from the
  manifest, not from driver memory.
- Non-append source commits (overwrite / merge / delete / restore /
  optimize) rewrite or drop dirs the view already consumed; the
  dir-diff detects that (a seen dir is gone) and falls back to a full
  rebuild — incremental when possible, correct always.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.operators.txstore import TxTable

DEC = "decimal(28,4)"


class IncrementalAggView:
    """Materialized ``GROUP BY group_cols`` view with count/sum/min/max
    over ``value_col``, maintained incrementally from a source TxTable.

    >>> mv = IncrementalAggView(spark, source, "/path/view", ["event_type"], "value")
    >>> mv.refresh()   # scans only dirs appended since the last refresh
    >>> mv.result()    # finalized: n, sum_value, avg_value, min_value, max_value
    """

    def __init__(
        self,
        spark: SparkSession,
        source: TxTable,
        view_path: str,
        group_cols: Sequence[str],
        value_col: str,
    ):
        self.spark = spark
        self.source = source
        self.view = TxTable(spark, view_path)
        self.group_cols = list(group_cols)
        self.value_col = value_col

    # -- partial aggregation (algebraic, mergeable) -------------------------
    def _partials(self, df: DataFrame) -> DataFrame:
        v = F.col(self.value_col)
        return df.groupBy(*self.group_cols).agg(
            F.count("*").alias("n"),
            F.sum(v.cast(DEC)).alias("sum_dec"),
            F.min(v).alias("min_v"),
            F.max(v).alias("max_v"),
        )

    @staticmethod
    def _merge_partials(parts: DataFrame, group_cols: Sequence[str]) -> DataFrame:
        return parts.groupBy(*group_cols).agg(
            F.sum("n").alias("n"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )

    # -- refresh cursor -----------------------------------------------------
    def _cursor(self) -> tuple[int, set[str]]:
        v = self.view.latest_version()
        if v == 0:
            return 0, set()
        meta = self.view._manifest(v).get("meta") or {}
        return meta.get("source_version", 0), set(meta.get("dirs_seen", []))

    def refresh(self) -> dict:
        """Advance the view to the source's latest snapshot.

        Returns a report: {"mode": "noop"|"incremental"|"full",
        "source_version": int, "new_dirs": int}.
        """
        sv = self.source.latest_version()
        last_sv, seen = self._cursor()
        if sv == last_sv:
            return {"mode": "noop", "source_version": sv, "new_dirs": 0}
        cur_dirs = set(self.source._manifest(sv)["dirs"])

        if seen and seen == cur_dirs:
            # Version advanced but the dir set is unchanged (e.g. a
            # RESTORE back to the exact snapshot the view consumed):
            # the content the view reflects is identical — nothing to
            # scan, nothing to commit. The cursor intentionally stays
            # behind; the next refresh re-diffs from the same set.
            return {"mode": "noop", "source_version": sv, "new_dirs": 0}
        if seen and seen <= cur_dirs:
            # Pure appends since the cursor: aggregate ONLY the new dirs
            # and merge with the stored partials.
            new_dirs = sorted(cur_dirs - seen)
            paths = [str(self.source.path / "data" / d) for d in new_dirs]
            new_parts = self._partials(self.spark.read.parquet(*paths))
            merged = self._merge_partials(
                self.view.read().unionByName(new_parts), self.group_cols
            )
            mode = "incremental"
        else:
            # First refresh, or a seen dir was rewritten/dropped
            # (overwrite/merge/delete/restore/optimize): recompute.
            new_dirs = sorted(cur_dirs)
            merged = self._partials(self.source.read(sv))
            mode = "full"

        self.view.overwrite(
            merged,
            meta={"source_version": sv, "dirs_seen": sorted(cur_dirs)},
        )
        return {"mode": mode, "source_version": sv, "new_dirs": len(new_dirs)}

    # -- finalized read -----------------------------------------------------
    def result(self) -> DataFrame:
        """Finalized aggregates from the stored partials. Raises until
        the first refresh materializes the view — before any source
        data exists there is no schema to synthesize an empty frame
        from, so "not materialized yet" is an explicit state, not an
        empty result."""
        if self.view.latest_version() == 0:
            raise FileNotFoundError(
                f"view at {self.view.path} not materialized yet — call "
                "refresh() after the source table has at least one commit"
            )
        p = self.view.read()
        return p.select(
            *self.group_cols,
            F.col("n"),
            F.col("sum_dec").cast("double").alias("sum_value"),
            F.round(F.col("sum_dec").cast("double") / F.col("n"), 6).alias("avg_value"),
            F.col("min_v").alias("min_value"),
            F.col("max_v").alias("max_value"),
        )
