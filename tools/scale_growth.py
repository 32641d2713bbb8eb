"""Corpus-replication scale-growth harness for the dedup family.

Replicating the sf0.1 documents corpus k-fold turns every document into
a k-clique of exact duplicates, so TRUE pair output grows quadratically
in k — the adversarial case for inverted-index self-joins and banded
LSH. A scale-safe engine holds wall-clock growth near-linear while the
output explodes. r2 measured x1/x2/x4; r3 extends to x8 (BASELINE.md
"Scale-growth check" section records the numbers).

Usage: python tools/scale_growth.py [k ...]   (default: 1 2 4 8)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.1"


def replicated(docs, k: int):
    from pyspark.sql import functions as F

    if k == 1:
        return docs
    return (
        docs.withColumn("__r", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn("doc_id", F.col("doc_id") * k + F.col("__r"))
        .drop("__r")
    )


def main() -> None:
    from hapiy_etl_spark.operators import dedup as D
    from hapiy_etl_spark.session import get_spark

    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    spark = get_spark("scale_growth")
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    ops = {
        "jaccard_capped": lambda d: D.jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5, df_cap=100
        ),
        "minhash_native": lambda d: D.minhash_native_pairs(
            d, "doc_id", "text", n=3, jaccard_threshold=0.5
        ),
        "simhash": lambda d: D.simhash_pairs(d, "doc_id", "text", max_hamming=3),
        "exact_substring": lambda d: D.shared_span_pairs(
            d, "doc_id", "text", k=10, min_span_tokens=12, df_cap=200
        ),
        "cluster_assign": lambda d: D.dedup_clusters(
            D.jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.5, df_cap=100),
            rounds=4,
            checkpoint_every=2,
        ),
    }

    results: dict[str, dict[str, dict[str, float]]] = {}
    for k in ks:
        docs = replicated(base, k).cache()
        n_docs = docs.count()
        for name, fn in ops.items():
            t0 = time.time()
            n_out = fn(docs).count()
            dt = round(time.time() - t0, 2)
            results.setdefault(name, {})[f"x{k}"] = {"sec": dt, "rows": n_out}
            print(f"x{k} ({n_docs} docs) {name}: {dt}s {n_out} rows", flush=True)
        docs.unpersist()
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
