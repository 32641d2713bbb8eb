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
- The view stores per-group ALGEBRAIC PARTIALS (count / decimal sums /
  mins / maxes over any number of value columns, plus an optional KMV
  distinct sketch), not finalized values: merging a batch is
  `re-aggregate(old_partials ∪ partials(new_rows))`, the same
  mergeability contract `incremental_agg_merge` oracle-proves
  (queries/aggregates.py). avg is finalized from sum/count at read
  time, never stored (it does not merge); the KMV sketch merges by
  union-and-keep-k-smallest (operators/sketches.py), so even the
  distinct count refreshes without rescanning history — and stays
  EXACT while a group's distinct count is below k.
- The view itself is a TxTable: its refresh commit atomically carries
  `{source_version, dirs_seen}` in the manifest meta, so view content
  and refresh cursor can never disagree (a crash between them is
  impossible by construction), and a restart resumes from the
  manifest, not from driver memory.
- Non-append source commits (overwrite / merge / delete / restore /
  optimize) rewrite or drop dirs the view already consumed; the
  dir-diff detects that (a seen dir is gone) and falls back to a full
  rebuild — incremental when possible, correct always. Appends onto a
  partitioned snapshot, and appends carrying manifest partition specs,
  are still pure appends: the dir-diff does not care about layout, and
  new dirs are loaded through the same layout-aware reader read() uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hapiy_etl_spark.operators.sketches import (
    kll_merge_agg,
    kll_quantile,
    kll_sketch,
    kmv_estimate,
    kmv_sketch,
    loghist_merge_agg,
    loghist_quantile,
    loghist_sketch,
)
from hapiy_etl_spark.operators.txstore import TxTable, stats_prune_dirs

DEC = "decimal(28,4)"


def _join_groups_nullsafe(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "left"
) -> DataFrame:
    """Join sketch partials back to the aggregate rows by group key with
    NULL-SAFE equality. The name-list join form uses plain ``=``, so a
    group whose key is NULL silently loses its sketch column (NULL kmv /
    kllrank / loghist) even though groupBy happily produced a partial
    for it (r8 advice, incremental_mv.py). ``eqNullSafe`` per key keeps
    the NULL group paired with its own sketch."""
    ren = {k: f"__mvgk_{k}" for k in keys}
    r = right
    for k, rk in ren.items():
        r = r.withColumnRenamed(k, rk)
    cond = F.lit(True)
    for k, rk in ren.items():
        cond = cond & left[k].eqNullSafe(r[rk])
    return left.join(r, cond, how).drop(*ren.values())


class IncrementalAggView:
    """Materialized ``GROUP BY group_cols`` view with count/sum/min/max
    over one or more value columns — and optionally an approximate
    distinct count over ``distinct_col`` — maintained incrementally
    from a source TxTable.

    Single-column form (result columns ``n, sum_value, avg_value,
    min_value, max_value``):

    >>> mv = IncrementalAggView(spark, source, "/path/view", ["event_type"], "value")

    Multi-aggregate form (per-column ``sum_<c>, avg_<c>, min_<c>,
    max_<c>`` plus ``approx_distinct_<distinct_col>``):

    >>> mv = IncrementalAggView(spark, source, "/path/view", ["event_type"],
    ...                         value_cols=["value", "latency"],
    ...                         distinct_col="day", kmv_k=512)
    >>> mv.refresh()   # scans only dirs appended since the last refresh
    >>> mv.result()    # finalized aggregates
    """

    def __init__(
        self,
        spark: SparkSession,
        source: TxTable,
        view_path: str,
        group_cols: Sequence[str],
        value_col: str | None = None,
        *,
        value_cols: Sequence[str] | None = None,
        distinct_col: str | None = None,
        kmv_k: int = 512,
        histogram_col: str | None = None,
        quantiles: Sequence[float] = (0.5, 0.95, 0.99),
        rank_sketch: str = "loghist",
        kll_k: int = 2048,
        topk_col: str | None = None,
        topk_k: int = 5,
        topk_track: int = 1024,
    ):
        if (value_col is None) == (value_cols is None):
            raise ValueError("pass exactly one of value_col / value_cols")
        if rank_sketch not in ("loghist", "kll"):
            raise ValueError(
                f"rank_sketch must be 'loghist' or 'kll', got {rank_sketch!r}"
            )
        if topk_col is not None and topk_k > topk_track:
            raise ValueError(
                f"topk_k={topk_k} exceeds topk_track={topk_track} — the "
                "sketch can never return more items than it tracks"
            )
        self.spark = spark
        self.source = source
        self.view = TxTable(spark, view_path)
        self.group_cols = list(group_cols)
        # legacy single-column mode keeps the original partial/result
        # column names so existing views and oracles are untouched
        self.legacy = value_cols is None
        self.value_cols = [value_col] if self.legacy else list(value_cols)
        self.distinct_col = distinct_col
        self.kmv_k = kmv_k
        self.histogram_col = histogram_col
        self.quantiles = list(quantiles)
        # quantile-panel sketch: "loghist" (bounded RELATIVE error,
        # exact element-wise merge — the default) or "kll" (bounded
        # RANK error; exact while a group holds ≤ kll_k values, so
        # narrow-range distributions resolve beyond a 1.33x log bucket)
        self.rank_sketch = rank_sketch
        self.kll_k = kll_k
        # heavy-hitter panel (r10): per-group approx-top-k sketch over
        # topk_col — Spark's mergeable approx_top_k_accumulate/combine
        # (JVM-side, parquet-serializable struct), EXACT while a
        # group's distinct count stays ≤ topk_track, bounded-error
        # frequent-items above. Finalized as a deterministic
        # "item:count,..." string (count desc, item asc tie-break) so
        # results are engine-comparable and oracle-hashable.
        self.topk_col = topk_col
        self.topk_k = topk_k
        self.topk_track = topk_track

    def _names(self, c: str) -> tuple[str, str, str, str]:
        if self.legacy:
            return "sum_dec", "min_v", "max_v", "cnt_v"
        return f"sum__{c}", f"min__{c}", f"max__{c}", f"cnt__{c}"

    # -- partial aggregation (algebraic, mergeable) -------------------------
    def _partials(self, df: DataFrame) -> DataFrame:
        aggs = [F.count("*").alias("n")]
        for c in self.value_cols:
            s, mn, mx, cnt = self._names(c)
            v = F.col(c)
            aggs += [
                F.sum(v.cast(DEC)).alias(s),
                F.min(v).alias(mn),
                F.max(v).alias(mx),
                # per-column NON-NULL count: avg finalizes as sum/cnt,
                # matching SQL AVG on columns with NULLs — dividing by
                # the row count n would silently count NULLs in the
                # denominator while min/max/sum skip them (ADVICE r7)
                F.count(v).alias(cnt),
            ]
        if self.topk_col:
            # mergeable heavy-hitter partial — a plain JVM aggregate,
            # so it rides the same groupBy as the algebraic partials
            aggs.append(
                F.expr(
                    f"approx_top_k_accumulate(`{self.topk_col}`, "
                    f"{self.topk_track})"
                ).alias("topk")
            )
        parts = df.groupBy(*self.group_cols).agg(*aggs)
        if self.distinct_col:
            # KMV partial per group (operators/sketches.py:kmv_sketch —
            # k smallest unit hashes of the distinct values; the heavy
            # reduction is over 8-byte hashes, the per-group window
            # bounds each sketch to k)
            sk = kmv_sketch(
                df, self.group_cols, self.distinct_col, self.kmv_k
            ).withColumnRenamed("sketch", "kmv")
            parts = _join_groups_nullsafe(parts, sk, self.group_cols)
        if self.histogram_col:
            # rank-sketch partial for the quantile panel — loghist
            # merges EXACTLY (element-wise integer sums); kll merges
            # exactly while within capacity, with bounded rank error
            # above (operators/sketches.py)
            sk = (
                kll_sketch(df, self.group_cols, self.histogram_col, self.kll_k)
                if self.rank_sketch == "kll"
                else loghist_sketch(df, self.group_cols, self.histogram_col)
            )
            parts = _join_groups_nullsafe(parts, sk, self.group_cols)
        return parts

    def _merge_partials(self, parts: DataFrame) -> DataFrame:
        aggs = [F.sum("n").alias("n")]
        for c in self.value_cols:
            s, mn, mx, cnt = self._names(c)
            aggs += [
                F.sum(s).alias(s),
                F.min(mn).alias(mn),
                F.max(mx).alias(mx),
                F.sum(cnt).alias(cnt),
            ]
        if self.distinct_col:
            # union-and-keep-k-smallest across all of a group's
            # sketches — associative/commutative/idempotent, so the
            # merged sketch equals the sketch of the union
            aggs.append(
                F.slice(
                    F.array_sort(
                        F.array_distinct(
                            F.flatten(
                                F.collect_list(
                                    F.coalesce(
                                        F.col("kmv"),
                                        F.array().cast("array<double>"),
                                    )
                                )
                            )
                        )
                    ),
                    1,
                    self.kmv_k,
                ).alias("kmv")
            )
        if self.histogram_col and self.rank_sketch != "kll":
            aggs.append(loghist_merge_agg("loghist").alias("loghist"))
        if self.topk_col:
            aggs.append(
                F.expr(
                    f"approx_top_k_combine(topk, {self.topk_track})"
                ).alias("topk")
            )
        merged = parts.groupBy(*self.group_cols).agg(*aggs)
        if self.histogram_col and self.rank_sketch == "kll":
            # Spark forbids mixing GROUPED_AGG pandas UDFs with JVM
            # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT);
            # the kll merge runs as its own tiny aggregation over the
            # per-batch partial rows and joins back by group
            kll_m = parts.groupBy(*self.group_cols).agg(
                kll_merge_agg("kllrank", self.kll_k).alias("kllrank")
            )
            merged = _join_groups_nullsafe(merged, kll_m, self.group_cols)
        return merged

    def _partial_cols(self) -> set[str]:
        """The column set the CURRENT engine's partials carry — compared
        against a stored view before an incremental merge, so a view
        materialized by an older engine (e.g. one without the per-column
        non-null counts) triggers a full rebuild instead of a broken or
        silently-wrong union."""
        cols = {*self.group_cols, "n"}
        for c in self.value_cols:
            cols.update(self._names(c))
        if self.distinct_col:
            cols.add("kmv")
        if self.histogram_col:
            cols.add("kllrank" if self.rank_sketch == "kll" else "loghist")
        if self.topk_col:
            cols.add("topk")
        return cols

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
        m = self.source._manifest(sv)
        cur_dirs = set(m["dirs"])

        if seen and seen == cur_dirs:
            # Version advanced but the dir set is unchanged (e.g. a
            # RESTORE back to the exact snapshot the view consumed):
            # the content the view reflects is identical — nothing to
            # scan, nothing to commit. The cursor intentionally stays
            # behind; the next refresh re-diffs from the same set.
            return {"mode": "noop", "source_version": sv, "new_dirs": 0}
        stored = (
            self.view.read() if seen and seen <= cur_dirs else None
        )
        if stored is not None and set(stored.columns) == self._partial_cols():
            # Pure appends since the cursor: aggregate ONLY the new dirs
            # and merge with the stored partials. Loaded through the
            # layout-aware reader so partitioned dirs (and their pinned
            # schemas) round-trip exactly as read() sees them.
            new_dirs = sorted(cur_dirs - seen)
            new_parts = self._partials(
                self.source._read_dirs(m, new_dirs, merge_schema=False)
            )
            merged = self._merge_partials(stored.unionByName(new_parts))
            mode = "incremental"
        else:
            # First refresh, a seen dir rewritten/dropped (overwrite/
            # merge/delete/restore/optimize), or the stored partial
            # schema predates this engine: recompute.
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
        def _avg(s: str, cnt: str):
            # sum / NON-NULL count = SQL AVG; the when-guard keeps an
            # all-NULL group at NULL instead of an ANSI divide-by-zero
            return F.when(
                F.col(cnt) > 0,
                F.round(F.col(s).cast("double") / F.col(cnt), 6),
            )

        if self.legacy:
            cols = [
                *self.group_cols,
                F.col("n"),
                F.col("sum_dec").cast("double").alias("sum_value"),
                _avg("sum_dec", "cnt_v").alias("avg_value"),
                F.col("min_v").alias("min_value"),
                F.col("max_v").alias("max_value"),
            ]
        else:
            cols = [*self.group_cols, F.col("n")]
            for c in self.value_cols:
                s, mn, mx, cnt = self._names(c)
                cols += [
                    F.col(s).cast("double").alias(f"sum_{c}"),
                    _avg(s, cnt).alias(f"avg_{c}"),
                    F.col(mn).alias(f"min_{c}"),
                    F.col(mx).alias(f"max_{c}"),
                ]
        if self.distinct_col:
            cols.append(
                kmv_estimate(F.col("kmv"), self.kmv_k).alias(
                    f"approx_distinct_{self.distinct_col}"
                )
            )
        if self.histogram_col:
            for q in self.quantiles:
                label = f"p{int(q * 100)}" if (q * 100).is_integer() else f"p{q}"
                est = (
                    kll_quantile(F.col("kllrank"), q)
                    if self.rank_sketch == "kll"
                    else loghist_quantile(F.col("loghist"), q)
                )
                cols.append(est.alias(f"approx_{label}_{self.histogram_col}"))
        if self.topk_col:
            # estimate EVERY tracked item, then re-rank DETERMINISTICALLY
            # (count desc, item asc) and render "item:count,..." —
            # approx_top_k_estimate's own top-k tie order is
            # unspecified, which would make results (and oracle hashes)
            # flap; in the exact regime (distinct ≤ topk_track) counts
            # are exact so the string is fully reproducible
            ranked = F.expr(
                f"""array_join(transform(slice(array_sort(
                        approx_top_k_estimate(topk, {self.topk_track}),
                        (a, b) -> CASE
                            WHEN a.count > b.count THEN -1
                            WHEN a.count < b.count THEN 1
                            WHEN a.item < b.item THEN -1
                            WHEN a.item > b.item THEN 1
                            ELSE 0 END
                    ), 1, {self.topk_k}),
                    t -> concat(cast(t.item AS string), ':',
                                cast(t.count AS string))), ',')"""
            )
            cols.append(ranked.alias(f"top{self.topk_k}_{self.topk_col}"))
        return p.select(*cols)


class IncrementalJoinAggView(IncrementalAggView):
    """Materialized ``GROUP BY`` aggregate over an INNER EQUI-JOIN of
    two append-only TxTables (``fact JOIN dim ON join_keys``),
    maintained incrementally by the classic delta rule:

        Δ(F ⋈ D) = ΔF ⋈ D_new  ∪  F_old ⋈ ΔD

    (the two terms cover ΔF ⋈ ΔD exactly once). Contribution rows from
    the delta join feed the SAME algebraic-partial machinery as the
    single-table view — count / decimal sums / min / max / KMV /
    rank-sketch partials all merge, so every panel the base class
    offers works over a join.

    Refresh cost, honestly:
    - fact-only appends (the overwhelmingly common star-schema case):
      |ΔF| rows joined against one dim scan — the dim side is a
      broadcast candidate and the fact HISTORY IS NEVER READ. The
      refresh report says so (``scanned_fact_history=False``).
    - dim appends: the ``F_old ⋈ ΔD`` term re-reads consumed fact dirs
      once, with ΔD broadcast-tiny; with dir stats on the join key the
      fact read prunes to dirs that can contain ΔD's keys. At true
      scale, bucket both tables on the join key so this term is a
      co-located join.
    - anything non-append on either side (overwrite/merge/delete/
      restore/optimize) → detected by the dir-diff, full rebuild.
      Incremental when possible, correct always.

    Join keys use plain inner-equi semantics: a NULL join key matches
    nothing, exactly as the recompute would. The view's refresh commit
    carries BOTH source cursors ``{source_version, dirs_seen,
    dim_version, dim_dirs_seen}`` atomically with the content.

    >>> mv = IncrementalJoinAggView(spark, orders_tx, cust_tx, "/path/v",
    ...                             ["custkey"], ["mktsegment"], "totalprice")
    >>> mv.refresh()   # reads only appended dirs on either side
    >>> mv.result()
    """

    def __init__(
        self,
        spark: SparkSession,
        fact: TxTable,
        dim: TxTable,
        view_path: str,
        join_keys: Sequence[str],
        group_cols: Sequence[str],
        value_col: str | None = None,
        **kwargs,
    ):
        super().__init__(
            spark, fact, view_path, group_cols, value_col, **kwargs
        )
        self.dim = dim
        self.join_keys = list(join_keys)

    def _cursor(self) -> tuple[int, set[str], int, set[str]]:  # type: ignore[override]
        v = self.view.latest_version()
        if v == 0:
            return 0, set(), 0, set()
        meta = self.view._manifest(v).get("meta") or {}
        return (
            meta.get("source_version", 0),
            set(meta.get("dirs_seen", [])),
            meta.get("dim_version", 0),
            set(meta.get("dim_dirs_seen", [])),
        )

    def refresh(self) -> dict:
        fv = self.source.latest_version()
        dv = self.dim.latest_version()
        if fv == 0 or dv == 0:
            # no joinable content can exist yet, and an uncommitted side
            # has no schema to build an empty view from — explicit
            # state, mirroring result() before first materialization
            raise FileNotFoundError(
                "both sides need at least one commit before the first "
                f"refresh (fact v{fv}, dim v{dv})"
            )
        last_fv, seen_f, last_dv, seen_d = self._cursor()
        if fv == last_fv and dv == last_dv:
            return {"mode": "noop", "source_version": fv, "dim_version": dv,
                    "new_fact_dirs": 0, "new_dim_dirs": 0}
        m_f = self.source._manifest(fv)
        m_d = self.dim._manifest(dv)
        cur_f, cur_d = set(m_f["dirs"]), set(m_d["dirs"])
        if (seen_f or seen_d) and seen_f == cur_f and seen_d == cur_d:
            # versions advanced but both dir sets are unchanged (e.g.
            # RESTORE back to the consumed snapshots): content identical,
            # cursor intentionally stays behind
            return {"mode": "noop", "source_version": fv, "dim_version": dv,
                    "new_fact_dirs": 0, "new_dim_dirs": 0}
        stored = (
            self.view.read()
            if seen_f and seen_f <= cur_f and seen_d <= cur_d
            else None
        )
        scanned_fact_history = scanned_dim = True
        fact_dirs_rescanned = len(cur_f)
        if stored is not None and set(stored.columns) == self._partial_cols():
            new_f = sorted(cur_f - seen_f)
            new_d = sorted(cur_d - seen_d)
            deltas = []
            if new_f:
                # ΔF ⋈ D_new: new fact rows against the WHOLE current dim
                deltas.append(
                    self.source._read_dirs(m_f, new_f, merge_schema=False)
                    .join(self.dim.read(dv), self.join_keys)
                )
            scanned_fact_history = False
            fact_dirs_rescanned = 0
            if new_d and seen_f:
                # F_old ⋈ ΔD: late-arriving dim rows pick up the fact
                # rows already consumed (new fact rows were matched
                # against D_new above, ΔD included — no double count).
                # When the fact table records join-key stats, the
                # history read prunes to dirs intersecting the delta's
                # key bounds — one bounded agg over the (small) delta
                # buys dir-level skipping of consumed history; safe
                # because a skipped dir's rows could not equi-join any
                # delta key anyway (NULL keys never match an inner
                # join, and min/max ignore them).
                dd = self.dim._read_dirs(m_d, new_d, merge_schema=False)
                fact_stats = m_f.get("stats", {})
                has_stats = any(
                    k in fact_stats.get(d, {})
                    for d in seen_f
                    for k in self.join_keys
                )
                if has_stats:
                    # only pay the bounds job when it can buy pruning
                    bounds = dd.agg(
                        *[
                            f
                            for k in self.join_keys
                            for f in (
                                F.min(k).alias(f"__lo_{k}"),
                                F.max(k).alias(f"__hi_{k}"),
                            )
                        ]
                    ).first()
                    wr = {
                        k: (bounds[f"__lo_{k}"], bounds[f"__hi_{k}"])
                        for k in self.join_keys
                    }
                    if all(
                        lo is not None or hi is not None
                        for lo, hi in wr.values()
                    ):
                        cand = stats_prune_dirs(m_f, sorted(seen_f), wr)
                    else:
                        cand = []  # delta has no non-NULL key: joins nothing
                else:
                    cand = sorted(seen_f)
                fact_dirs_rescanned = len(cand)
                scanned_fact_history = bool(cand)
                if cand:
                    deltas.append(
                        self.source._read_dirs(
                            m_f, cand, merge_schema=False
                        ).join(F.broadcast(dd), self.join_keys)
                    )
            scanned_dim = bool(new_f)
            mode = "incremental"
            if deltas:
                rows = deltas[0]
                for d in deltas[1:]:
                    rows = rows.unionByName(d)
                merged = self._merge_partials(
                    stored.unionByName(self._partials(rows))
                )
            else:
                # no delta work: a version bump with no new dirs, or an
                # all-NULL-key dim delta whose history term was skipped
                merged = stored
            report_dirs = (len(new_f), len(new_d))
        else:
            merged = self._partials(
                self.source.read(fv).join(self.dim.read(dv), self.join_keys)
            )
            mode = "full"
            report_dirs = (len(cur_f), len(cur_d))
        self.view.overwrite(
            merged,
            meta={
                "source_version": fv,
                "dirs_seen": sorted(cur_f),
                "dim_version": dv,
                "dim_dirs_seen": sorted(cur_d),
            },
        )
        return {
            "mode": mode,
            "source_version": fv,
            "dim_version": dv,
            "new_fact_dirs": report_dirs[0],
            "new_dim_dirs": report_dirs[1],
            "scanned_fact_history": scanned_fact_history,
            "fact_dirs_rescanned": fact_dirs_rescanned,
            "scanned_dim": scanned_dim,
        }
