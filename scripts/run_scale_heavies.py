"""One-decade scale run: the five heavy queries at sf1.0.

Runs the declared queries() entries for the heavies against the
synthetic sf1.0 dir built by scripts/make_scale_data.py, with the same
noop-write timing protocol and host canaries as bench.py, and prints
one JSON line for SCALE.md. Each query runs twice (best-of-2, bench.py
methodology) after an untimed warmup action.

Usage:
    python scripts/make_scale_data.py            # once
    python scripts/run_scale_heavies.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEAVIES = [
    "corr_pairs_parts",
    "similar_exact_parts",
    "publish_retrieve",
    "dedup_clusters",
    "ann_dup_pairs_lsh",
]


def main() -> None:
    repo = Path(__file__).resolve().parent.parent
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(repo / ".scratch" / "sf1.0")
    names = sys.argv[2:] or HEAVIES

    import bench  # repo-root bench.py: canaries + session config
    import __spark_entry__ as entrymod
    from propius_spark.session import clear_materialized, get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("propius_scale_heavies", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # untimed JVM warmup (same surfaces bench.py warms)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()

    calib_before = bench._host_calibration()
    disk_before = bench._disk_calibration()
    qs = entrymod.queries()
    timings: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    failures: dict[str, str] = {}
    for name in names:
        fn = qs[name]
        try:
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                timings.setdefault(name, []).append(
                    round(time.perf_counter() - t0, 3)
                )
                clear_materialized(spark)
                spark.sparkContext._jvm.System.gc()
            # row count once, untimed: the scale evidence needs output
            # cardinality next to wall time
            rows[name] = fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 - record, keep measuring
            # one OOM/failure at an experimental SF must not discard
            # the completed queries' numbers (bench.py's posture)
            failures[name] = f"{type(e).__name__}: {e}"[:300]
        clear_materialized(spark)
    # a query that failed ANY of its runs is reported only under
    # `failures` (+ raw partials in `runs`): its surviving pass may be
    # a fluke of the failure mode (e.g. the OOM hit pass 2 because
    # pass 1 filled the heap), and summing it into `value` would mix
    # complete and incomplete measurements (ADVICE r6)
    best = {
        n: min(t) for n, t in timings.items() if n not in failures
    }
    from propius_spark import plans

    out = {
        "metric": "scale_heavies_wall_time",
        "sf_dir": sf_dir,
        # proves whether materialize's checkpoint compaction engaged
        # under this run's PROPIUS_SHUFFLE_PARTITIONS sizing
        "checkpoint_compaction": dict(plans.compaction_stats),
        "value": round(sum(best.values()), 3),
        "unit": "sec",
        "queries": best,
        "runs": timings,
        "result_rows": rows,
        "host_calib_sec": [calib_before, bench._host_calibration()],
        "host_disk_mbps": [disk_before, bench._disk_calibration()],
    }
    if failures:
        out["failures"] = failures
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
