"""Benchmark runner: every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is timed end-to-end (plan build → execute → collect-to-count).
A warmup query runs first so JVM/codegen startup isn't billed to q1.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from hapiy_etl_spark.registry import all_queries
    from hapiy_etl_spark.session import get_spark

    spark = get_spark("hapiy_etl_spark_bench")

    # Warmup: touch the biggest table so file listing + codegen are warm.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    total = 0.0
    for name, q in all_queries().items():
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
        # a few queries legitimately cache() intermediates (label
        # propagation, pipelines); drop those blocks between queries so
        # accumulated storage doesn't pressure later timings
        spark.catalog.clearCache()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
