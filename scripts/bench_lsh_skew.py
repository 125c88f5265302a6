"""A/B the minhash_lsh_pairs hot-bucket sub-split under real skew.

The sf-replica corpora are deliberately decorrelated (cross-replica
shingle overlap 0), so their band buckets stay small and the sub-split
never engages — the skew that motivated it (SCALE.md §8a: boilerplate/
replica-collision buckets) has to be CONSTRUCTED to be measured. This
builds a corpus of `n_unique` distinct docs (from the sf1.0 replica)
plus ONE boilerplate cluster of `n_dup` near-identical docs (unique
doc_ids, same text → same shingle set → one band bucket of n_dup
members in EVERY band), then times minhash_lsh_pairs twice:

- sub-split ON  (max_bucket_docs default 1024)
- sub-split OFF (max_bucket_docs 10**9 → nb=1 everywhere, which is
  exactly the old single-key two-sided bucket join)

Both must return the identical pair count (the sub-split is
result-identical by construction); the wall-clock ratio is the
measurement. Prints one JSON line.

Usage: python scripts/bench_lsh_skew.py [sf_dir] [n_dup]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from propius_spark.operators.dedup import minhash_lsh_pairs
    from propius_spark.session import clear_materialized, get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(
        Path(__file__).resolve().parent.parent / ".scratch" / "sf1.0"
    )
    n_dup = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("propius_lsh_skew", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base_max = docs.agg(F.max("doc_id")).first()[0]
    boiler = (
        spark.range(n_dup)
        .select(
            (F.col("id") + base_max + 1).alias("doc_id"),
            F.lit(
                "standard boilerplate header terms of service apply to "
                "this document and all derived works without exception"
            ).alias("text"),
        )
    )
    corpus = docs.union(boiler)
    scratch = str(
        Path(__file__).resolve().parent.parent
        / ".scratch"
        / "lsh_skew_corpus"
    )
    corpus.write.mode("overwrite").parquet(scratch)
    corpus = spark.read.parquet(scratch)

    def run(cap: int) -> tuple[float, int]:
        # count() executes the full pipeline including the verify join
        t0 = time.perf_counter()
        n = minhash_lsh_pairs(
            corpus, k=3, threshold=0.9, max_bucket_docs=cap
        ).count()
        wall = round(time.perf_counter() - t0, 3)
        clear_materialized(spark)
        spark.sparkContext._jvm.System.gc()
        return wall, n

    # warmup (JVM/codegen), then interleaved A/B passes
    run(10**9)
    results = {"on": [], "off": []}
    counts = set()
    for _ in range(2):
        w, n = run(1024)
        results["on"].append(w)
        counts.add(n)
        w, n = run(10**9)
        results["off"].append(w)
        counts.add(n)
    assert len(counts) == 1, f"sub-split changed the result: {counts}"
    out = {
        "metric": "lsh_skew_subsplit_ab",
        "sf_dir": sf_dir,
        "n_dup": n_dup,
        "pairs": counts.pop(),
        "wall_on": min(results["on"]),
        "wall_off": min(results["off"]),
        "runs": results,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
