"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE compact JSON line on stdout:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

The driver captures only the tail of stdout (~2000 chars), so the
stdout line carries a HEADLINE subset of per-query timings and must
stay well under that limit. The full per-query timing map is written
to ``BENCH_FULL.json`` next to this file and echoed to stderr.

Each query is timed end-to-end (plan build → execute → collect-to-count).

Two passes for position-stable numbers (VERDICT r4 task 4: recorded
artifacts drifted up to 3x run-to-run from cold-plan/position effects):

1. WARM pass (untimed): every query runs once — JVM/JIT, codegen,
   parquet file listing, and broadcast paths all warm. Disable with
   SPARK_GRAFT_BENCH_WARM=0 for quick local iterations.
2. TIMED pass: caches (Spark blocks + the shared near-dup artifact)
   are reset between passes, then every query is timed in registry
   order with NO clearCache between queries — so designed artifact
   reuse is visible: the first dedup-family member honestly pays the
   shared pairs/clusters derivation, later members ride it (the 100 TB
   materialize-once posture, queries/text.py:neardup_clusters).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# One representative per operator family, heaviest members included, so
# the driver-visible line tracks both flagship latency and the scale-
# sensitive dedup/similarity/graph paths. Everything else is in
# BENCH_FULL.json.
HEADLINE: tuple[str, ...] = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q9_profit_by_nation_year",
    "q18_large_volume_customers",
    "q21_sole_returning_supplier",
    "subq_in_large_orders",
    "window_sessionize",
    "asof_join_events",
    "agg_cube",
    "udf_grouped_map_zscore",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_cluster_assign",
    "dedup_exact_substring",
    "dedup_pipeline_end_to_end",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "embedding_cosine_neardup",
    "semdedup_assign",
    "graph_pagerank_trade",
    "text_bm25_search",
    "text_decontamination",
    "text_token_stats",
    "text_sequence_pack",
    "multimodal_decode_features",
    "events_funnel_multistep",
    "graph_triangle_count",
    "graph_reachability_bfs",
    "events_frequent_users",
    "timeseries_ewma",
    "interval_union_coverage",
    "events_rolling_distinct_users",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from hapiy_etl_spark.registry import all_queries
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("hapiy_etl_spark_bench")

    # Touch the biggest table so file listing + codegen are warm.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    queries = all_queries()

    if os.environ.get("SPARK_GRAFT_BENCH_WARM", "1") != "0":
        t0 = time.perf_counter()
        for name, q in queries.items():
            try:
                q.fn(spark, sf_dir).count()
            except Exception:
                pass  # the timed pass reports the failure
        print(
            f"# warm pass: {time.perf_counter() - t0:.1f}s", file=sys.stderr
        )

    # Reset ALL cached state between passes so every timed query pays
    # its own full cost (including designed one-time artifact builds).
    from hapiy_etl_spark.queries.text import neardup_cache_clear

    neardup_cache_clear()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in queries.items():
        t0 = time.perf_counter()
        try:
            df = q.fn(spark, sf_dir)
            n = df.count()
        except Exception as ex:  # one broken query must not kill the bench
            print(f"# {name}: FAILED {ex}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s rows={n}", file=sys.stderr)

    # Release designed caches created DURING the timed pass (the
    # between-pass clearCache only covers the warm pass).
    from hapiy_etl_spark.operators.graph import triangle_cache_release

    triangle_cache_release()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    headline = {n: timings[n] for n in HEADLINE if n in timings}
    payload = {
        "metric": "total_query_wall_clock",
        "value": round(total, 3),
        "unit": "sec",
        "queries": headline,
        "sf": sf_val,
        "n_queries": len(timings),
        "full": "BENCH_FULL.json",
    }
    full = dict(payload)
    full["queries"] = timings
    (Path(__file__).resolve().parent / "BENCH_FULL.json").write_text(
        json.dumps(full, indent=1) + "\n"
    )
    print(json.dumps(full), file=sys.stderr)
    line = json.dumps(payload, separators=(",", ":"))
    # Hard guard: the driver parses the last line out of a ~2000-char
    # stdout tail; a longer line silently breaks the per-round bench.
    if len(line) > 1600:
        drop = sorted(headline, key=headline.get)  # shed cheapest first
        while len(line) > 1600 and drop:
            headline.pop(drop.pop(0))
            payload["queries"] = headline
            line = json.dumps(payload, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
