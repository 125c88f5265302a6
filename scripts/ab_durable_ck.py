"""Interleaved durable-vs-local checkpoint A/B (SCALE.md §8c follow-up).

§8c's sf1.0 twin runs sat in ADJACENT windows, so the 6× gap they saw
(durable 36.4 s vs local 218.9 s on similar_exact_parts) could not be
claimed as a mode win. This script removes the window variable: ONE
session, passes alternating local → durable → local → durable …, so
any host drift hits both modes equally. materialize() picks its mode
from sc.getCheckpointDir() per call, so toggling the dir between
passes flips the whole pipeline's checkpoint mode with no other
change; blocks/files are released between passes exactly like
run_scale_heavies (clear_materialized + ContextCleaner).

Usage:
    PROPIUS_SHUFFLE_PARTITIONS=256 python scripts/ab_durable_ck.py \
        [sf_dir] [query] [n_pairs]
Defaults: .scratch/sf1.0 similar_exact_parts 3. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    repo = Path(__file__).resolve().parent.parent
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(repo / ".scratch" / "sf1.0")
    qname = sys.argv[2] if len(sys.argv) > 2 else "similar_exact_parts"
    n_pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import tempfile

    import bench  # canaries
    import __spark_entry__ as entrymod
    from propius_spark import plans
    from propius_spark.session import clear_materialized, get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("propius_ab_durable", cpus=cpus)
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    fn = entrymod.queries()[qname]

    # untimed warmup (JVM codegen/shuffle surfaces), local mode
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()

    def set_durable(d: str | None) -> None:
        if d is None:
            jsc = sc._jsc.sc()
            getattr(jsc, "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
        else:
            sc.setCheckpointDir(d)

    ckroot = tempfile.mkdtemp(prefix="propius_ab_ck_")
    calib_before = bench._host_calibration()
    disk_before = bench._disk_calibration()
    passes: list[dict] = []
    rows_seen: set[int] = set()
    for i in range(2 * n_pairs):
        mode = "local" if i % 2 == 0 else "durable"
        set_durable(None if mode == "local" else f"{ckroot}/p{i}")
        stats0 = dict(plans.compaction_stats)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - t0, 3)
        # row count via a cheap second action on the (materialized)
        # result — the heavy lifting is already checkpointed
        rows_seen.add(df.count())
        passes.append(
            {
                "mode": mode,
                "sec": dt,
                "compaction": {
                    k: plans.compaction_stats[k] - stats0[k]
                    for k in stats0
                },
            }
        )
        clear_materialized(spark)
        sc._jvm.System.gc()
    set_durable(None)

    by_mode: dict[str, list[float]] = {"local": [], "durable": []}
    for p in passes:
        by_mode[p["mode"]].append(p["sec"])
    out = {
        "metric": "ab_durable_vs_local_checkpoint",
        "sf_dir": sf_dir,
        "query": qname,
        "passes": passes,
        "best": {m: min(v) for m, v in by_mode.items()},
        "median": {m: sorted(v)[len(v) // 2] for m, v in by_mode.items()},
        "result_rows": sorted(rows_seen),
        "rows_identical_across_modes": len(rows_seen) == 1,
        "host_calib_sec": [calib_before, bench._host_calibration()],
        "host_disk_mbps": [disk_before, bench._disk_calibration()],
    }
    spark.stop()
    # the ContextCleaner handles checkpoint files while the app lives;
    # the root itself outlives the JVM, so remove it explicitly
    import shutil

    shutil.rmtree(ckroot, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
