"""Benchmark harness: times every declared query at one scale factor.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": sf}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Each query is executed to completion with a `noop`-format write so the
measured time covers the full distributed plan (scan → shuffles →
aggregates) without driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from propius_spark.session import clear_materialized, get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("propius_bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM (codegen compiler, parquet footer caches, shuffle
    # service) on an untimed scan+shuffle: the first action in a fresh
    # JVM otherwise pays ~5 s that belongs to no query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # release materialized intermediates so one pipeline's blocks
        # don't skew the next query's timing, and nudge the JVM to
        # collect them now — long multi-query sessions otherwise hit
        # multi-second GC pauses inside later queries (measured 3-4×
        # inflation on queries that run in ~3 s isolated)
        clear_materialized(spark)
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
