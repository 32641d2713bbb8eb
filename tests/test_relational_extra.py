"""Extra surface tests: seeded sampling stability, salted join/agg
equivalence, CSV/JSON source round-trips, plan-shape assertions
(pushdown + broadcast — the 100 TB posture checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hapiy_etl_spark.io import read_table
from hapiy_etl_spark.operators.skew import salted_agg, salted_join
from hapiy_etl_spark.queries.relational import q1_pricing_summary, q3_shipping_priority


def test_sample_seed_stable(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    a = [r.o_orderkey for r in o.sample(fraction=0.1, seed=42).select("o_orderkey").collect()]
    b = [r.o_orderkey for r in o.sample(fraction=0.1, seed=42).select("o_orderkey").collect()]
    assert a == b and 0 < len(a) < o.count()


def test_salted_join_matches_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand").withColumnRenamed(
        "p_partkey", "l_partkey"
    )
    plain = li.join(part, "l_partkey").groupBy("p_brand").agg(F.count("*").alias("n"))
    salted = salted_join(li, part, "l_partkey", n_salts=8).groupBy("p_brand").agg(
        F.count("*").alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_agg_matches_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.s, 2))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            aggs=[F.sum("c").alias("n"), F.sum("s").cast("double").alias("s")],
            partial_aggs=[
                F.count("*").alias("c"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
            ],
            n_salts=8,
        ).collect()
    }
    assert plain == salted


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    src = read_table(spark, sf_dir, "nation")
    csv_path, json_path = str(tmp_path / "n.csv"), str(tmp_path / "n.json")
    src.write.mode("overwrite").option("header", True).csv(csv_path)
    src.write.mode("overwrite").json(json_path)
    back_csv = spark.read.schema(src.schema).option("header", True).csv(csv_path)
    back_json = spark.read.schema(src.schema).json(json_path)
    orig = sorted(map(tuple, src.collect()))
    assert sorted(map(tuple, back_csv.collect())) == orig
    assert sorted(map(tuple, back_json.collect())) == orig


def test_q1_pushes_filter_to_scan(spark, sf_dir):
    plan = q1_pricing_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200], (
        "shipdate filter must reach the parquet scan"
    )


def test_q3_broadcasts_customer_dim(spark, sf_dir):
    plan = q3_shipping_priority(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "dim join must be broadcast, not shuffled"


def test_scan_prunes_columns(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0] if "ReadSchema:" in plan else ""
    assert "l_orderkey" in read_schema and "l_extendedprice" not in read_schema, (
        f"2-column projection must prune the scan, got {read_schema}"
    )


def test_read_json_robust_corrupt_record_modes(spark, tmp_path):
    """Malformed lines: PERMISSIVE quarantines into _corrupt_record,
    DROPMALFORMED drops, FAILFAST raises."""
    import pytest as _pytest

    from hapiy_etl_spark.io import read_json_robust

    p = tmp_path / "in.json"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "{this is not json}\n"
        '{"id": 3, "v": "c"}\n'
    )
    path, ddl = str(p), "id bigint, v string"

    perm = read_json_robust(spark, path, ddl).collect()
    assert len(perm) == 3
    bad = [r for r in perm if r._corrupt_record is not None]
    assert len(bad) == 1 and bad[0].id is None and "not json" in bad[0]._corrupt_record
    assert {r.id for r in perm if r._corrupt_record is None} == {1, 3}

    dropped = read_json_robust(spark, path, ddl, mode="DROPMALFORMED").collect()
    assert {r.id for r in dropped} == {1, 3}

    with _pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_json_robust(spark, path, ddl, mode="FAILFAST").collect()


def test_freq_items_superset_of_true_heavy_hitters(spark, sf_dir):
    """DataFrame.freqItems (approximate heavy hitters, one pass) must
    return a superset of the items above the support threshold."""
    from hapiy_etl_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    approx = set(ev.freqItems(["event_type"], support=0.15).first()[0])
    total = ev.count()
    true_heavy = {
        r.event_type
        for r in ev.groupBy("event_type").count().where(F.col("count") > 0.15 * total).collect()
    }
    assert true_heavy <= approx


def test_read_parquet_resilient_skips_corrupt_part(spark, sf_dir, tmp_path):
    """A truncated part file must not fail the scan in resilient mode,
    and must fail it in fail-fast mode."""
    import shutil

    import pytest as _pytest

    from hapiy_etl_spark.io import read_parquet_resilient, read_table

    d = tmp_path / "tbl"
    d.mkdir()
    shutil.copy(f"{sf_dir}/nation.parquet", d / "part-000.parquet")
    # truncated copy: valid magic prefix, broken footer
    raw = (d / "part-000.parquet").read_bytes()
    (d / "part-001.parquet").write_bytes(raw[: len(raw) // 3])

    good = read_table(spark, sf_dir, "nation").count()
    assert read_parquet_resilient(spark, str(d)).count() == good

    with _pytest.raises(Exception):
        read_parquet_resilient(spark, str(d), ignore_corrupt=False).count()


def test_orc_roundtrip_with_predicate_pushdown(spark, sf_dir, tmp_path):
    """ORC source/sink parity: values round-trip exactly and filters
    reach the ORC scan (PushedFilters) just like parquet."""
    src = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "ev.orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema
    assert back.count() == src.count()
    orig = sorted(map(tuple, src.limit(0).union(src.where("event_id < 50")).collect()))
    got = sorted(map(tuple, back.where("event_id < 50").collect()))
    assert got == orig
    plan = back.where("event_id < 50")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_id" in plan.split("PushedFilters")[1][:200]


def test_join_strategy_hints_are_honored(spark, sf_dir):
    """At 100 TB the optimizer's stats can be wrong; strategy hints are
    the escape hatch and must actually switch the physical join."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    merged = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert "SortMergeJoin" in plan(merged)
    shuffled = li.join(
        orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey
    )
    assert "ShuffledHashJoin" in plan(shuffled)
    bcast = li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
    assert "BroadcastHashJoin" in plan(bcast)


def test_read_table_normalizes_ntz_timestamps(spark, tmp_path, sf_dir):
    """Parquet timestamp[us] without timezone reads as TIMESTAMP_NTZ in
    Spark 4; read_table must normalize to session-timezone TIMESTAMP or
    every epoch cast downstream breaks (r4 testdata regeneration)."""
    from hapiy_etl_spark.io import read_table

    ev = read_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # the epoch cast that broke under NTZ must work
    assert ev.select(F.col("ts").cast("long")).first()[0] is not None
    # and parity with what the raw file stores (same instant, UTC session)
    import pyarrow.parquet as pq

    raw = pq.read_table(f"{sf_dir}/events.parquet", columns=["ts"]).to_pandas()
    got = ev.agg(F.min("ts"), F.max("ts")).first()
    assert got[0] == raw["ts"].min() and got[1] == raw["ts"].max()


def test_aqe_skew_join_splits_hot_key(spark, sf_dir):
    """AQE must split the hot reduce partition of a deliberately skewed
    shuffle join: final adaptive plan carries SortMergeJoin(skew=true)
    and an `AQEShuffleRead skewed` on the fact side. Local data sits far
    below the production skew thresholds, so the test lowers them — at
    real scale the defaults (256 MB partition, 5x median) fire on their
    own. The x8 wall-clock evidence lives in tools/scale_growth.py
    --skew and BASELINE.md."""
    from hapiy_etl_spark.operators.skew import hot_key_join

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        j = hot_key_join(spark, sf_dir, k=8, hot_share=0.4)
        rows = j.collect()  # finalize THIS DataFrame's adaptive plan
        assert len(rows) > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
        # reads "AQEShuffleRead skewed" or "... coalesced and skewed"
        assert any(
            "AQEShuffleRead" in ln and "skewed" in ln for ln in plan.splitlines()
        ), plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_overwrite_replaces_only_touched(spark, sf_dir, tmp_path):
    """Re-running one partition's load must replace exactly that
    partition: untouched partitions keep their rows, the touched one is
    REPLACED (not appended), and static mode's truncate-everything
    behavior is what we're NOT doing."""
    from hapiy_etl_spark.io import overwrite_partitions_dynamic, read_table

    out = str(tmp_path / "by_type")
    ev = read_table(spark, sf_dir, "events").select("event_id", "event_type")
    overwrite_partitions_dynamic(ev, out, ["event_type"])
    before = {
        r.event_type: r.n
        for r in spark.read.parquet(out).groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    # reload ONLY the click partition, with half its rows
    clicks = ev.where(F.col("event_type") == "click")
    half = clicks.where(F.col("event_id") % 2 == 0)
    n_half = half.count()
    overwrite_partitions_dynamic(half, out, ["event_type"])
    after = {
        r.event_type: r.n
        for r in spark.read.parquet(out).groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    assert after["click"] == n_half  # replaced, not appended
    for k in before:
        if k != "click":
            assert after[k] == before[k]  # untouched partitions intact


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Catalyst's runtime bloom-filter join pruning: a selective filter
    on the build side (URGENT orders) injects a bloom_filter_agg
    subquery whose might_contain() pre-filters the probe-side lineitem
    scan BEFORE the join shuffle — at 100 TB the probe side ships only
    rows that can possibly match, not the whole fact table. The
    defaults gate injection on a >= 10 GB probe-side scan (satisfied
    automatically at production scale, never at test scale), so the
    threshold is lowered here to expose the plan; results must equal
    the unfiltered join exactly (bloom false positives are re-checked
    by the join itself)."""
    from pyspark.sql import functions as F

    key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    old_thr = spark.conf.get(key, None)
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set(key, "0")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def agg(df_orders):
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            return (
                li.join(df_orders, li.l_orderkey == df_orders.o_orderkey)
                .groupBy("o_orderpriority")
                .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
            )

        urgent = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = agg(urgent)
        rows = {r.o_orderpriority: (r.n, r.qty) for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
        # partial_bloom_filter_agg proves the filter itself builds
        # distributed (map-side partials), not on the driver
        assert "partial_bloom_filter_agg" in plan

        # exactness: bloom pruning must not change the join result
        spark.conf.set(key, "10GB")  # injection off at test scale
        j_plain = agg(urgent)
        assert "might_contain" not in j_plain._jdf.queryExecution().executedPlan().toString()
        assert {r.o_orderpriority: (r.n, r.qty) for r in j_plain.collect()} == rows
    finally:
        for k, v in ((key, old_thr), ("spark.sql.autoBroadcastJoinThreshold", old_bcast)):
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_same_result(spark, sf_dir):
    """The engine control surface for join physical strategy: BROADCAST,
    MERGE (sort-merge), SHUFFLE_HASH, and SHUFFLE_REPLICATE_NL hints
    each force their operator into the executed plan, and all four
    produce identical results — the planner knob a 100 TB operator
    reaches for when statistics mislead AQE (e.g. forcing shuffle-hash
    on a join whose build side fits executor memory but exceeds the
    broadcast threshold)."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )

    def run(hint, marker):
        j = (
            li.join(o.hint(hint), li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        rows = {r.o_orderpriority: r.n for r in j.collect()}
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert marker in plan, f"{hint}: {marker} not in plan\n{plan[:1500]}"
        return rows

    expected = run("broadcast", "BroadcastHashJoin")
    assert run("merge", "SortMergeJoin") == expected
    assert run("shuffle_hash", "ShuffledHashJoin") == expected
    # replicate-NL is the cartesian fallback — equi-condition still
    # applied as a filter; tiny inputs keep it tractable
    small_li = li.limit(200)
    a = {
        (r.l_orderkey, r.o_orderpriority)
        for r in small_li.join(
            o.hint("shuffle_replicate_nl"), small_li.l_orderkey == o.o_orderkey
        ).collect()
    }
    b = {
        (r.l_orderkey, r.o_orderpriority)
        for r in small_li.join(o, small_li.l_orderkey == o.o_orderkey).collect()
    }
    assert a == b and len(b) > 0


def test_analyze_table_statistics_drive_cbo_estimates(spark, sf_dir, tmp_path):
    """The statistics surface: ANALYZE TABLE records exact row counts
    and per-column stats in the catalog, and with CBO enabled the
    optimizer's cardinality estimate for a 1-of-5 predicate lands on
    n/5 from the column NDV — the input join reordering and build-side
    choice need at 100 TB, where size-only guesses mis-pick the build
    side (stats collection is cheap relative to one wrong shuffle)."""
    spark.sql("DROP TABLE IF EXISTS cbo_orders_t")
    old_cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        df = spark.read.parquet(f"{sf_dir}/orders.parquet")
        n = df.count()
        df.write.mode("overwrite").option(
            "path", str(tmp_path / "cbo_orders")
        ).saveAsTable("cbo_orders_t")
        spark.sql("ANALYZE TABLE cbo_orders_t COMPUTE STATISTICS FOR ALL COLUMNS")
        desc = "\n".join(map(str, spark.sql("DESCRIBE EXTENDED cbo_orders_t").collect()))
        assert f"{n} rows" in desc  # exact count in the catalog

        spark.conf.set("spark.sql.cbo.enabled", "true")
        filtered = spark.table("cbo_orders_t").where("o_orderpriority = '1-URGENT'")
        est = filtered._jdf.queryExecution().optimizedPlan().stats().rowCount()
        assert est.isDefined()
        est_rows = int(str(est.get()))
        # 5 priorities, near-uniform: NDV-based selectivity ≈ n/5
        assert abs(est_rows - n / 5) <= 0.2 * (n / 5), (est_rows, n)
    finally:
        spark.conf.set("spark.sql.cbo.enabled", old_cbo)
        spark.sql("DROP TABLE IF EXISTS cbo_orders_t")


def test_bucketed_join_shuffle_free_and_rebuildable(spark, sf_dir):
    """join_bucketed_colocated's in-query plan assert fires on every
    run (SMJ present, no hashpartitioning exchange on either join
    key); the fixture writes one file per bucket and survives an
    index_fixtures_clear -> rebuild cycle with identical results."""
    from pathlib import Path

    from hapiy_etl_spark.queries.index_fixtures import (
        bucketed_tables,
        index_fixtures_clear,
    )
    from hapiy_etl_spark.registry import all_queries

    q = all_queries()["join_bucketed_colocated"]
    rows1 = [tuple(r) for r in q.fn(spark, sf_dir).collect()]
    assert rows1  # non-degenerate

    t_orders, _ = bucketed_tables(spark, sf_dir)
    loc = spark.sql(f"DESCRIBE EXTENDED {t_orders}").collect()
    path = next(
        r["data_type"] for r in loc if r["col_name"] == "Location"
    ).removeprefix("file:")
    files = [p for p in Path(path).glob("*.parquet")]
    assert len(files) == 8, files  # one file per bucket

    index_fixtures_clear()
    rows2 = [tuple(r) for r in q.fn(spark, sf_dir).collect()]
    assert rows1 == rows2
