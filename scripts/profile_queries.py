"""Per-query job/stage/task profile (guide §1: measure first).

For each named query, runs it under its own job group with the noop
sink and reports wall seconds plus the number of Spark jobs, stages
and tasks the query scheduled. The bench SFs showed 10× the data
costs only 1–2× the time on most queries (BENCH_anchor_r08.json
primary vs secondary), i.e. the suite is dominated by per-query FIXED
cost — scheduler round-trips, eager materialize jobs, broadcast
builds, AQE stage barriers. This script attributes that fixed cost:
a 3 s query that schedules 14 jobs of 32 tiny tasks is paying for
job count, not data.

Usage:
  python scripts/profile_queries.py q1 q2 ...   (default: all)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Prints one line per query and a JSON summary tail.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as entrymod
    from propius_spark.session import clear_materialized, get_spark

    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)
    unknown = set(names) - set(qs)
    if unknown:
        raise SystemExit(f"unknown queries {sorted(unknown)}")

    spark = get_spark("profile_queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # warm the JVM once (codegen/parquet/shuffle), untimed
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    try:
        for name in names:
            group = f"profile_{name}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            jids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            n_tasks = 0
            # AQE reuses stage ids across jobs — dedup on the id so a
            # shared stage counts once (ADVICE r8: the old loop
            # incremented per (job, stage) pair, inflating the very
            # counts this script exists to attribute)
            seen_stages: set[int] = set()
            for jid in jids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    if sid in seen_stages:
                        continue
                    si = tracker.getStageInfo(sid)
                    if si is None:
                        continue
                    seen_stages.add(sid)
                    n_stages += 1
                    n_tasks += si.numTasks
            out[name] = {
                "wall": round(wall, 3),
                "jobs": len(jids),
                "stages": n_stages,
                "tasks": n_tasks,
            }
            print(
                f"{name:28s} {wall:7.3f}s  jobs={len(jids):3d} "
                f"stages={n_stages:3d} tasks={n_tasks:5d}",
                flush=True,
            )
            clear_materialized(spark)
            sc._jvm.System.gc()
    finally:
        spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "profile": out}))


if __name__ == "__main__":
    main()
