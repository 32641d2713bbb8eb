"""Property-based tests (hypothesis): operator semantics vs brute-force
Python reference implementations on randomized small inputs.

Each Spark round-trip is slow, so examples are capped — the value is in
the randomized edge shapes (empty sides, all-duplicate keys, equal
timestamps), not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from hapiy_etl_spark.operators.asof import asof_join
from hapiy_etl_spark.operators.upsert import dedup_by_key, upsert_by_key

SETTINGS = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

key_st = st.sampled_from(["a", "b", "c"])
ts_st = st.integers(min_value=0, max_value=20).map(
    lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s)
)


@given(
    left=st.lists(st.tuples(key_st, ts_st), max_size=8),
    right=st.lists(st.tuples(key_st, ts_st, st.integers(0, 100)), max_size=8),
)
@SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right):
    # dedupe right per (key, ts) — precondition of the operator — keeping max v
    rmap: dict[tuple, int] = {}
    for k, ts, v in right:
        rmap[(k, ts)] = max(rmap.get((k, ts), -1), v)
    right_rows = [(k, ts, v) for (k, ts), v in rmap.items()]

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k string, lts timestamp, lid long"
    )
    rdf = spark.createDataFrame(right_rows, "k string, rts timestamp, v long")
    out = {
        r.lid: r.v
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts", right_cols=["v"], how="left"
        ).collect()
    }

    for i, (k, ts) in enumerate(left):
        cands = [(rts, v) for (rk, rts, v) in right_rows if rk == k and rts <= ts]
        expected = max(cands)[1] if cands else None
        assert out.get(i) == expected, (i, k, ts, cands)


@given(
    existing=st.lists(st.tuples(key_st, st.integers(0, 9)), max_size=8),
    new=st.lists(st.tuples(key_st, st.integers(10, 19)), max_size=8),
)
@SETTINGS
def test_upsert_matches_dict_merge(spark, existing, new):
    # reference semantics: new wins per key; arbitrary-but-single row per
    # key within each batch → use last-write-wins on the value as tiebreak
    edf = dedup_by_key(
        spark.createDataFrame(existing + [("zz", -1)], "k string, v long"), ["k"], order_col="v"
    )
    ndf = dedup_by_key(
        spark.createDataFrame(new + [("zz9", -1)], "k string, v long"), ["k"], order_col="v"
    )
    merged = {r.k: r.v for r in upsert_by_key(edf, ndf, ["k"], order_col="v").collect()}

    emap: dict[str, int] = {}
    for k, v in existing + [("zz", -1)]:
        emap[k] = max(emap.get(k, -(10**9)), v)
    nmap: dict[str, int] = {}
    for k, v in new + [("zz9", -1)]:
        nmap[k] = max(nmap.get(k, -(10**9)), v)
    assert merged == {**emap, **nmap}


@given(rows=st.lists(st.tuples(key_st, st.integers(0, 50), st.text(max_size=3)), max_size=10))
@SETTINGS
def test_dedup_last_write_wins_property(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(
        [(k, s, v, i) for i, (k, s, v) in enumerate(rows)], "k string, seq long, v string, rid long"
    )
    # deterministic LWW: order by (seq, rid) — make seq unique via rid tiebreak
    out = {
        r.k: r.rid
        for r in dedup_by_key(
            df.withColumn("ord", df.seq * 1000 + df.rid), ["k"], order_col="ord"
        ).collect()
    }
    expected: dict[str, int] = {}
    best: dict[str, tuple] = {}
    for i, (k, s, _v) in enumerate(rows):
        if k not in best or (s, i) > best[k]:
            best[k] = (s, i)
            expected[k] = i
    assert out == expected


@given(
    left=st.lists(st.tuples(key_st, ts_st), max_size=6),
    right=st.lists(
        st.tuples(key_st, ts_st, st.one_of(st.none(), st.integers(0, 100))), max_size=6
    ),
)
@SETTINGS
def test_asof_join_with_null_right_values(spark, left, right):
    """Genuinely-null right values must round-trip as matches carrying
    null — never as no-match, and never mixed with another row's value
    (the struct-payload guarantee)."""
    rmap: dict[tuple, int | None] = {}
    for k, ts, v in right:
        rmap[(k, ts)] = v  # last wins; (key, ts) unique after this
    right_rows = [(k, ts, v) for (k, ts), v in rmap.items()]

    ldf = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(left)], "k string, lts timestamp, lid long"
    )
    rdf = spark.createDataFrame(right_rows, "k string, rts timestamp, v long")
    got = {
        r.lid: (True, r.v)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts", right_cols=["v"], how="inner"
        ).collect()
    }
    for i, (k, ts) in enumerate(left):
        cands = [(rts, v) for (rk, rts, v) in right_rows if rk == k and rts <= ts]
        if cands:
            expected_v = max(cands, key=lambda t: t[0])[1]
            assert got.get(i) == (True, expected_v), (i, k, ts, cands)
        else:
            assert i not in got, (i, k, ts)


@given(
    left=st.lists(st.tuples(key_st, st.integers(0, 30), st.integers(1, 20)), max_size=7),
    right=st.lists(st.tuples(key_st, st.integers(0, 30), st.integers(1, 20)), max_size=7),
)
@SETTINGS
def test_interval_overlap_bucketed_matches_bruteforce(spark, left, right):
    """Bucketized interval join == brute-force O(n^2) overlap scan,
    with multiplicity preserved (no dedup-collapse of identical rows)."""
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)

    def mk(rows, sname, ename, idname):
        return [
            (k, base + _dt.timedelta(minutes=s), base + _dt.timedelta(minutes=s + d), i)
            for i, (k, s, d) in enumerate(rows)
        ]

    lrows = mk(left, "ls", "le", "lid")
    rrows = mk(right, "rs", "re", "rid")
    ldf = spark.createDataFrame(lrows, "k string, ls timestamp, le timestamp, lid long")
    rdf = spark.createDataFrame(rrows, "k string, rs timestamp, re timestamp, rid long")
    from hapiy_etl_spark.operators.asof import interval_overlap_join

    out = interval_overlap_join(
        ldf, rdf, on="k", left_start="ls", left_end="le",
        right_start="rs", right_end="re", bucket_seconds=600,
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    expected = sorted(
        (li, ri)
        for (lk, ls, le, li) in lrows
        for (rk, rs, re, ri) in rrows
        if lk == rk and ls < re and rs < le
    )
    assert got == expected


@given(
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.lists(st.tuples(key_st, st.integers(-50, 50)), min_size=1, max_size=4),
            ),
            st.tuples(st.just("delete"), key_st),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_incremental_mv_matches_bruteforce_under_op_sequences(spark, tmp_path_factory, ops):
    """IncrementalAggView under randomized append/delete sequences with
    a refresh after every op: the finalized view must always equal a
    brute-force Python aggregate of the live rows — covering the
    incremental path (appends), the rewrite-fallback path (deletes),
    and their interleavings."""
    from hapiy_etl_spark.operators.incremental_mv import IncrementalAggView
    from hapiy_etl_spark.operators.txstore import TxTable

    tmp = tmp_path_factory.mktemp("mvprop")
    src = TxTable(spark, str(tmp / "src"))
    mv = IncrementalAggView(spark, src, str(tmp / "mv"), ["k"], "v")
    live: list[tuple[str, int]] = []

    for op in ops:
        if op[0] == "append":
            rows = op[1]
            src.append(spark.createDataFrame(rows, "k string, v long"))
            live.extend(rows)
        else:
            key = op[1]
            src.delete_where(f"k = '{key}'")
            live = [(k, v) for k, v in live if k != key]
        mv.refresh()
        if src.latest_version() == 0:
            # nothing ever written: the view is explicitly
            # not-materialized (no schema to synthesize), not empty
            import pytest as _pytest

            with _pytest.raises(FileNotFoundError, match="not materialized"):
                mv.result()
            continue
        got = {
            r.k: (r.n, r.sum_value, r.min_value, r.max_value)
            for r in mv.result().collect()
        }
        expect = {}
        for k in {k for k, _ in live}:
            vs = [v for kk, v in live if kk == k]
            expect[k] = (len(vs), float(sum(vs)), min(vs), max(vs))
        assert got == expect, (ops, got, expect)


@given(
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.lists(
                    st.tuples(key_st, st.integers(-50, 50), st.integers(0, 5)),
                    min_size=1,
                    max_size=4,
                ),
            ),
            st.tuples(st.just("delete"), key_st),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_incremental_mv_multi_partitioned_matches_bruteforce(
    spark, tmp_path_factory, ops
):
    """The multi-aggregate view (two value columns + KMV distinct
    sketch) over a source whose appends carry manifest partition specs:
    under randomized append/delete interleavings the finalized view —
    including the distinct count, which stays in the sketch's exact
    regime (≤6 distinct d values < k=64) — must equal a brute-force
    aggregate of the live rows, through both the incremental path and
    the rewrite fallback."""
    from hapiy_etl_spark.operators.incremental_mv import IncrementalAggView
    from hapiy_etl_spark.operators.txstore import TxTable

    tmp = tmp_path_factory.mktemp("mvprop2")
    src = TxTable(spark, str(tmp / "src"))
    mv = IncrementalAggView(
        spark,
        src,
        str(tmp / "mv"),
        ["k"],
        value_cols=["v", "w"],
        distinct_col="d",
        kmv_k=64,
    )
    live: list[tuple[str, int, int]] = []

    for i, op in enumerate(ops):
        if op[0] == "append":
            rows = [(k, v, v * 2, d) for k, v, d in op[1]]
            src.append(
                spark.createDataFrame(rows, "k string, v long, w long, d int"),
                partition={"batch": i},
            )
            live.extend(op[1])
        else:
            key = op[1]
            src.delete_where(f"k = '{key}'")
            live = [(k, v, d) for k, v, d in live if k != key]
        mv.refresh()
        if src.latest_version() == 0:
            continue
        got = {
            r.k: (
                r.n,
                r.sum_v,
                r.min_v,
                r.max_v,
                r.sum_w,
                r.min_w,
                r.max_w,
                r.approx_distinct_d,
            )
            for r in mv.result().collect()
        }
        expect = {}
        for k in {k for k, _, _ in live}:
            vs = [(v, d) for kk, v, d in live if kk == k]
            v_only = [v for v, _ in vs]
            w_only = [v * 2 for v in v_only]
            expect[k] = (
                len(vs),
                float(sum(v_only)),
                min(v_only),
                max(v_only),
                float(sum(w_only)),
                min(w_only),
                max(w_only),
                float(len({d for _, d in vs})),
            )
        assert got == expect, (ops, got, expect)


@given(
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.lists(
                    st.tuples(st.integers(-20, 120), st.floats(-50, 50).filter(lambda x: x == x)),
                    min_size=1,
                    max_size=5,
                ),
                st.booleans(),  # record stats for this dir?
            ),
            st.tuples(
                st.just("merge"),
                st.lists(
                    st.tuples(st.integers(-20, 120), st.floats(-50, 50).filter(lambda x: x == x)),
                    min_size=1,
                    max_size=3,
                ),
            ),
            st.tuples(st.just("delete"), st.integers(-20, 120), st.integers(0, 40)),
        ),
        min_size=1,
        max_size=5,
    ),
    probes=st.lists(
        st.tuples(st.integers(-30, 130), st.integers(0, 50)), min_size=1, max_size=2
    ),
)
@settings(
    max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_txstore_stats_pruning_always_exact(spark, tmp_path_factory, ops, probes):
    """Catch-all pruning invariant: under randomized stats-carrying and
    stats-less appends, pruned merges, and hinted range deletes, every
    range-pruned read must equal the brute-force filter of the live
    rows — pruning is an optimization, NEVER a semantics change."""
    from hapiy_etl_spark.operators.txstore import TxTable

    tmp = tmp_path_factory.mktemp("statprop")
    t = TxTable(spark, str(tmp / "t"))
    live: dict[int, float] = {}

    for op in ops:
        if op[0] == "append":
            rows = [(k, v) for k, v in op[1]]
            # appends model insert-only feeds here: drop keys that
            # already exist so `live` stays a dict (merge handles the
            # update path)
            rows = [(k, v) for k, v in rows if k not in live]
            seen = set()
            uniq = [(k, v) for k, v in rows if not (k in seen or seen.add(k))]
            if not uniq:
                continue
            t.append(
                spark.createDataFrame(uniq, "k long, v double"),
                stats_cols=["k"] if op[2] else None,
            )
            live.update(dict(uniq))
        elif op[0] == "merge":
            seen = set()
            uniq = [(k, v) for k, v in op[1] if not (k in seen or seen.add(k))]
            t.merge(
                spark.createDataFrame(uniq, "k long, v double"),
                keys=["k"],
                prune_col="k",
            )
            live.update(dict(uniq))
        else:
            lo, width = op[1], op[2]
            hi = lo + width
            if t.latest_version() == 0:
                continue
            t.delete_where(
                f"k >= {lo} AND k <= {hi}", range_hint={"k": (lo, hi)}
            )
            live = {k: v for k, v in live.items() if not (lo <= k <= hi)}

        if t.latest_version() == 0:
            continue
        for plo, pwidth in probes:
            phi = plo + pwidth
            got = {
                (r.k, r.v)
                for r in t.read(where_range={"k": (plo, phi)}).collect()
            }
            want = {(k, v) for k, v in live.items() if plo <= k <= phi}
            assert got == want, (ops, plo, phi, got, want)


@given(
    ops=st.lists(
        st.tuples(
            st.lists(st.integers(0, 60), min_size=1, max_size=6, unique=True),
            st.booleans(),  # bloom this dir?
        ),
        min_size=1,
        max_size=4,
    ),
    probes=st.lists(st.integers(-5, 70), min_size=1, max_size=3),
)
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_txstore_bloom_pruning_always_exact(spark, tmp_path_factory, ops, probes):
    """Catch-all bloom invariant: under randomized bloom-carrying and
    bloom-less appends (overlapping keys included — appends model a
    multiset), every point-lookup read equals the brute-force filter
    of all appended rows. A bloom may only ever cost an extra dir
    read, never hide or invent a row."""
    from hapiy_etl_spark.operators.txstore import TxTable

    tmp = tmp_path_factory.mktemp("bloomprop")
    t = TxTable(spark, str(tmp / "t"))
    live: list[int] = []
    for keys, use_bloom in ops:
        t.append(
            spark.createDataFrame([(k,) for k in keys], "k long"),
            bloom_cols=["k"] if use_bloom else None,
        )
        live.extend(keys)
        for p in probes:
            got = sorted(r.k for r in t.read(where={"k": p}).collect())
            want = sorted(k for k in live if k == p)
            assert got == want, (ops, p, got, want)


@given(
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.lists(
                    st.tuples(st.integers(0, 80), st.integers(-5, 5)),
                    min_size=1,
                    max_size=6,
                ),
                st.booleans(),  # bloom+stats this dir?
            ),
            st.tuples(
                st.just("merge"),
                st.lists(
                    st.tuples(st.integers(0, 80), st.integers(-5, 5)),
                    min_size=1,
                    max_size=4,
                ),
            ),
        ),
        min_size=1,
        max_size=4,
    ),
    probe_sets=st.lists(
        st.lists(st.integers(-5, 90), min_size=1, max_size=4, unique=True),
        min_size=1,
        max_size=2,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_txstore_where_in_pruning_always_exact(
    spark, tmp_path_factory, ops, probe_sets
):
    """Catch-all batch-lookup invariant (r8): under randomized
    bloom/stats-carrying appends and pruned merges (which rewrite dirs
    and OR-union their blooms), every where_in read equals the
    brute-force IN filter of the live rows — metadata pruning may only
    ever cost an extra dir read, never hide or invent a row."""
    from hapiy_etl_spark.operators.txstore import TxTable

    tmp = tmp_path_factory.mktemp("whereinprop")
    t = TxTable(spark, str(tmp / "t"))
    live: dict[int, int] = {}
    for op in ops:
        if op[0] == "append":
            rows = [(k, v) for k, v in op[1] if k not in live]
            seen = set()
            uniq = [(k, v) for k, v in rows if not (k in seen or seen.add(k))]
            if not uniq:
                continue
            t.append(
                spark.createDataFrame(uniq, "k long, v long"),
                stats_cols=["k"] if op[2] else None,
                bloom_cols=["k"] if op[2] else None,
            )
            live.update(dict(uniq))
        else:
            seen = set()
            uniq = [(k, v) for k, v in op[1] if not (k in seen or seen.add(k))]
            t.merge(
                spark.createDataFrame(uniq, "k long, v long"),
                keys=["k"],
                prune_col="k",
            )
            live.update(dict(uniq))
        if t.latest_version() == 0:
            continue
        for probes in probe_sets:
            got = sorted(
                (r.k, r.v)
                for r in t.read(where_in={"k": list(probes)}).collect()
            )
            want = sorted(
                (k, v) for k, v in live.items() if k in set(probes)
            )
            assert got == want, (ops, probes, got, want)


# -- KLL rank sketch: weight conservation (VERDICT r9 item 8) -------------
#
# The odd-buffer compaction fix (r8 advice, sketches.py:_kll_compress)
# alternates which END the leftover element comes from; the invariant it
# protects is that TOTAL WEIGHT (sum of len(level_i) * 2^i) equals the
# number of inserted values EXACTLY — compacting an odd buffer whole
# would drift it by ±w per compaction. The existing tests bound rank
# error; this one pins exact conservation across randomized interleaved
# insert/merge sequences with a tiny k (maximum compaction pressure).
# Pure Python (no Spark round-trip), so examples are cheap.

kll_vals_st = st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=32), max_size=40
)
kll_ops_st = st.lists(
    st.one_of(
        st.tuples(st.just("insert"), st.integers(0, 3), kll_vals_st),
        st.tuples(st.just("merge"), st.integers(0, 3), st.integers(0, 3)),
    ),
    max_size=25,
)


@given(ops=kll_ops_st, k=st.sampled_from([4, 8, 16]))
@settings(max_examples=200, deadline=None)
def test_kll_weight_exactly_conserved_over_random_op_sequences(ops, k):
    from hapiy_etl_spark.operators.sketches import (
        _kll_insert_many,
        _kll_merge_py,
        _kll_new,
    )

    def weight(s):
        return sum(len(buf) << lvl for lvl, buf in enumerate(s["levels"]))

    pool = [_kll_new(k) for _ in range(4)]
    counts = [0, 0, 0, 0]
    for op in ops:
        if op[0] == "insert":
            _, i, vals = op
            _kll_insert_many(pool[i], vals)
            counts[i] += len(vals)
        else:
            _, i, j = op
            # merge builds a NEW sketch; sources stay valid partials
            merged = _kll_merge_py(pool[i], pool[j])
            assert weight(merged) == counts[i] + counts[j]
            pool[i] = merged
            counts[i] = counts[i] + counts[j]
        for s, c in zip(pool, counts):
            assert weight(s) == c, (op, s["levels"], c)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            # partition value, incl. NULL: a window treats a NULL
            # partition value as its own group, so the kernel's offsets
            # join must be null-safe or those rows drop (ADVICE r11)
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
            st.integers(min_value=0, max_value=10**6),  # unique-ish key
        ),
        min_size=1,
        max_size=60,
    ),
    prefix_len=st.integers(min_value=1, max_value=2),
)
def test_prefix_bucketed_row_number_matches_global_window(
    spark, rows, prefix_len
):
    """The scale-safe global-rank kernel (r11, factored out of the
    curriculum rebuild) is BIT-IDENTICAL to the single-reducer window
    it replaces — `row_number() OVER (PARTITION BY p ORDER BY md5(k),
    k)` — for arbitrary partition shapes, hash-prefix collisions,
    empty-bucket gaps, and both prefix widths, because the bucket is a
    prefix of the sort key."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hapiy_etl_spark.operators.maintenance import (
        prefix_bucketed_row_number,
    )

    # dedupe (p, k): row_number ties on duplicate keys are arbitrary
    # (sort key maps the NULL partition to -1: None is unorderable)
    rows = sorted(set(rows), key=lambda t: (-1 if t[0] is None else t[0], t[1]))
    # every 7th key gets a NULL hash (md5-of-NULL in real callers):
    # the kernel must keep those rows with the window's NULLS-FIRST
    # placement, not drop them in the offsets equi-join (review r11)
    df = spark.createDataFrame(rows, "p int, k long").withColumn(
        "h",
        F.when(F.col("k") % 7 != 3, F.md5(F.col("k").cast("string"))),
    )
    got = {
        (r["p"], r["k"]): r["pos"]
        for r in prefix_bucketed_row_number(
            df, ["p"], "h", ["k"], prefix_len=prefix_len
        ).collect()
    }
    want = {
        (r["p"], r["k"]): r["pos"]
        for r in df.withColumn(
            "pos",
            F.row_number().over(W.partitionBy("p").orderBy("h", "k")),
        ).collect()
    }
    assert got == want


@given(
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.lists(st.integers(0, 60), min_size=1, max_size=8, unique=True),
            ),
            st.tuples(
                st.just("erase"),
                st.lists(st.integers(0, 70), min_size=1, max_size=4, unique=True),
            ),
            st.tuples(st.just("retighten"), st.just([])),
        ),
        min_size=2,
        max_size=6,
    ),
    probes=st.lists(st.integers(-5, 70), min_size=1, max_size=3),
)
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_txstore_erasure_retighten_reads_always_exact(
    spark, tmp_path_factory, ops, probes
):
    """Catch-all maintenance invariant (r13): under randomized
    interleavings of tight-bloomed appends, keyed erasures, and
    fpr-keyed retightens, the table always reads exactly like the
    Python multiset model — full scans AND point lookups. Retighten is
    METADATA-ONLY by contract, so it may never change any read; tiny
    256-bit blooms force real saturation so the retighten branch
    actually fires and resizes."""
    from hapiy_etl_spark.operators.txstore import TxTable

    tmp = tmp_path_factory.mktemp("rtprop")
    t = TxTable(spark, str(tmp / "t"))
    live: list[int] = []
    for op, keys in ops:
        if op == "append":
            t.append(
                spark.createDataFrame([(k,) for k in keys], "k long"),
                stats_cols=["k"],
                bloom_cols=["k"],
                bloom_bits=256,
                bloom_k=5,
            )
            live.extend(keys)
        elif op == "erase":
            if not live or t.latest_version() == 0:
                continue
            t.delete_keys(keys, on="k")
            live = [k for k in live if k not in set(keys)]
        else:
            if t.latest_version() == 0:
                continue
            t.retighten_blooms(["k"], fpr_threshold=0.05)
        if t.latest_version():
            got_all = sorted(r.k for r in t.read().collect())
            assert got_all == sorted(live), (ops, got_all, live)
            for p in probes:
                got = sorted(r.k for r in t.read(where={"k": p}).collect())
                want = sorted(k for k in live if k == p)
                assert got == want, (ops, p, got, want)


@given(
    bases=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2,
        max_size=10,
        unique=True,
    ),
    flips=st.lists(
        st.lists(st.integers(0, 63), min_size=0, max_size=3, unique=True),
        min_size=1,
        max_size=3,
    ),
)
@example(bases=[-1, 0], flips=[[63]])  # r13 falsifier: negative base + sign-bit flip
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
def test_signature_band_pairs_pigeonhole_recall(spark, bases, flips):
    """The Manku banding guarantee, property-tested: for ANY signature
    set, every pair within hamming <= 3 is emitted (pigeonhole recall
    1.0 — planted perturbations flip <= 3 random bits of a base), no
    emitted pair exceeds the refine threshold, and reported hamming is
    exact. The kernel under test is shared by SimHash and the whole
    perceptual multimodal family."""
    from hapiy_etl_spark.operators.dedup import signature_band_pairs

    rows = [(i, s) for i, s in enumerate(bases)]
    nxt = len(bases)
    planted = []
    for j, bits in enumerate(flips):
        base_id = j % len(bases)
        # Mask into the unsigned-64 domain before flipping: XOR on a
        # negative Python int flips an infinite sign extension, so e.g.
        # -1 ^ (1 << 63) = -2**63 - 1 which is outside LongType and the
        # positive-side wrap below never catches it (r13 red test).
        sig = bases[base_id] & ((1 << 64) - 1)
        for b in bits:
            sig ^= 1 << b
        sig = sig - (1 << 64) if sig >= (1 << 63) else sig
        rows.append((nxt + j, sig))
        planted.append((base_id, nxt + j, rows[base_id][1], sig))
    df = spark.createDataFrame(rows, "doc long, sig long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in signature_band_pairs(df, max_hamming=3).collect()
    }

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for a, b, sa, sb in planted:
        d = ham(sa, sb)
        if d <= 3:  # pigeonhole: MUST be found
            assert got.get((min(a, b), max(a, b))) == d, (rows, a, b, d)
    # soundness: nothing above the threshold, hamming values exact
    sigs = dict(rows)
    for (a, b), d in got.items():
        assert d == ham(sigs[a], sigs[b]) and d <= 3
