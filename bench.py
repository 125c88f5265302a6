"""Benchmark harness: times every declared query at one scale factor,
plus a secondary pass at sf0.01 so CORRECTNESS failures (graded at
sf0.01) and BENCH numbers (graded at the main sf) can be cross-read.

Prints ONE compact JSON line (the LAST line of stdout):
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": sf, "detail": "BENCH_full.json"}

The driver keeps only the last ~2000 characters of stdout, and every
prior round's single fat line (per-query dict + secondary pass +
calibration arrays ≈ 4.5 KB) was truncated mid-key — BENCH_r01..r06
all have `"parsed": null`. So the printed line now carries ONLY the
contract fields (metric/value/unit/queries/sf) plus the secondary
pass's total + failed-query names, with per-query times at 1-decimal
precision (≤ ~1.9 KB at 74 queries, measured), and the FULL result —
3-decimal timings, the secondary-SF pass, raw per-run totals, host
CPU/disk calibration probes, failures — is written to
``BENCH_full.json`` next to this script. If the query set ever grows
the line past the tail budget, it degrades to a minimal contract line
pointing at the sidecar (never a bare assert: that dies silently
under -O and leaves no summary at all).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_SECONDARY_SF_DIR (default /root/testdata/sf0.01;
     set empty to skip the secondary pass).
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


def _fit_tail(compact: dict, budget: int = 1900) -> str:
    """Serialize the compact summary within the driver's stdout-tail
    budget. Never an assert (stripped under -O, and dying here would
    leave NO summary line even though the sidecar exists): over
    budget, degrade stepwise — drop the per-query dict first, then
    collapse failed-name lists to counts — so the contract fields
    (metric/value/unit/sf/detail) always reach the driver. Pure
    function, unit-tested without Spark (tests/test_bench_tail.py)."""
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) <= budget:
        return line
    minimal = dict(compact)
    minimal["queries"] = {}
    minimal["queries_note"] = "over tail budget; see detail file"
    line = json.dumps(minimal, separators=(",", ":"))
    if len(line) <= budget:
        return line
    for k in ("failed", "secondary_failed"):  # failed-list blowup
        if k in minimal:
            minimal[f"n_{k}"] = len(minimal.pop(k))
    return json.dumps(minimal, separators=(",", ":"))


def _host_calibration() -> float:
    """Fixed single-core pure-Python workload (~1-2 s on an idle host).

    The suite totals on this box swing 1.5-2× between host windows with
    NO code change (BASELINE.md variance bands; the round-4 close saw
    same-code totals of 101.5 s and 151 s with uniform per-query
    inflation). This canary, run before the first pass and after the
    last, gives BENCH_r{N}.json readers a code-independent host-speed
    anchor: divide suite totals by the calibration ratio before
    comparing across rounds/windows. Pure Python + integer ops so the
    number reflects CPU speed and steal only — no BLAS threads, no JVM,
    no disk.
    """
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFFFFFFFFFF
    assert acc >= 0
    return round(time.perf_counter() - t0, 3)


def _spark_local_dir() -> str:
    """The filesystem Spark actually spills/shuffles to: first entry of
    SPARK_LOCAL_DIRS if set (the only Spark-temp override in play on
    this harness; spark.local.dir would be visible in get_spark's confs
    and is not set), else the platform temp dir — so the disk canary
    probes the device whose contention inflates checkpoint-heavy
    queries (ADVICE r4: a hardcoded /tmp would misattribute host-window
    diagnoses whenever the Spark temp lives elsewhere)."""
    import tempfile

    env = os.environ.get("SPARK_LOCAL_DIRS")
    if env:
        first = env.split(",")[0].strip()
        if first and os.path.isdir(first):
            return first
    return tempfile.gettempdir()


def _disk_calibration(path: str | None = None) -> float:
    """Write+fsync 256 MB to the Spark-temp filesystem (resolved by
    _spark_local_dir), report MB/s.

    The round-4 close measured a window where the CPU canary moved <5%
    while checkpoint/write-heavy queries (dedup_clusters,
    publish_retrieve) inflated 3-8× — shared-backing-store I/O
    contention, invisible to a CPU-only probe. This pins the disk
    dimension next to the CPU one.
    """
    import tempfile

    path = path or _spark_local_dir()
    buf = b"\xa5" * (8 << 20)  # 8 MB
    t0 = time.perf_counter()
    with tempfile.NamedTemporaryFile(dir=path) as f:
        for _ in range(32):  # 256 MB total
            f.write(buf)
        f.flush()
        os.fsync(f.fileno())
    return round(256 / (time.perf_counter() - t0), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("propius_bench", cpus=cpus)
    # stop-in-finally: a mid-suite exception must not leave the JVM up,
    # and the summary line prints AFTER stop so no late JVM chatter can
    # push it out of the driver's 2000-char stdout tail
    try:
        line = _run(spark, sf_dir, cpus)
    finally:
        spark.stop()
    print(line, flush=True)


def _run(spark, sf_dir: str, cpus: int) -> str:
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM on untimed work covering the runtime surfaces the
    # suite uses — codegen compiler, parquet footer caches, shuffle
    # service, Arrow + Python worker pool (applyInPandas), and MLlib
    # class loading. The first action of each kind in a fresh JVM
    # otherwise pays 3-9 s of warmup that belongs to no query (r3
    # measured: posting_lists 13.5 s first-in-suite vs 0.86 s warm).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().write.mode("overwrite").format("noop").save()
    from pyspark.sql import functions as F  # noqa: N812

    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(256)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .count()
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    warm_pdf = spark.range(64).withColumn("g", F.pmod("id", F.lit(4)))
    warm_pdf.groupBy("g").applyInPandas(
        lambda pdf: pdf, "id long, g bigint"
    ).write.mode("overwrite").format("noop").save()
    try:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        feat = spark.range(64).select(
            array_to_vector(F.array(F.rand(1), F.rand(2))).alias("features")
        )
        KMeans(k=2, seed=1, maxIter=2).fit(feat.coalesce(1))
    except Exception:
        pass

    def run_suite(d: str, failures: dict[str, str]) -> dict[str, float]:
        # per-suite failures dict: the secondary SF's failures must not
        # be mis-attributed to (or hidden by) the primary's
        timings: dict[str, float] = {}
        for name, fn in entrymod.queries().items():
            t0 = time.perf_counter()
            try:
                fn(spark, d).write.mode("overwrite").format("noop").save()
            except Exception as e:  # noqa: BLE001 - record, keep measuring
                # one flaky query must not discard a whole completed
                # pass: record the failure, keep the rest of the suite
                failures[name] = f"{type(e).__name__}: {e}"[:300]
                clear_materialized(spark)
                continue
            timings[name] = round(time.perf_counter() - t0, 3)
            # release materialized intermediates so one pipeline's
            # blocks don't skew the next query's timing, and nudge the
            # JVM to collect them now — long multi-query sessions
            # otherwise hit multi-second GC pauses inside later queries
            # (measured 3-4× inflation on queries that run in ~3 s
            # isolated)
            clear_materialized(spark)
            spark.sparkContext._jvm.System.gc()
        return timings

    def sf_of(d: str):
        s = d.rstrip("/").rsplit("sf", 1)[-1]
        return float(s) if s.replace(".", "").isdigit() else s

    # best-of-2 at the primary SF: this host's co-tenancy noise swings
    # individual queries 1.5-2.5× between back-to-back identical runs
    # (BASELINE.md round-3 variance band — three same-code suite runs
    # totaled 123/156/138 s). Min-per-query is the standard de-noising
    # estimator for a cold external disturbance; both raw totals are
    # kept in `runs` for transparency.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    calib_before = _host_calibration()
    disk_before = _disk_calibration()
    failures: dict[str, str] = {}
    passes = [run_suite(sf_dir, failures) for _ in range(max(1, n_runs))]
    # min over the passes a query SUCCEEDED in (a query that failed
    # one pass still reports its good pass; failed-everywhere queries
    # appear only under `failures`)
    qnames = {q for p in passes for q in p}
    timings = {
        q: round(min(p[q] for p in passes if q in p), 3)
        for q in sorted(qnames)
    }
    result = {
        "metric": "total_query_wall_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(sf_dir),
        "runs": [round(sum(p.values()), 3) for p in passes],
        # parallelism contract, made legible (VERDICT r8 item 2): the
        # driver's low-core pass could not PROVE from the output which
        # parallelism was in effect (every 8-vs-32-core ratio ≈ 1 at
        # the fixed-cost-dominated bench SF tripped a suspect flag even
        # though $SPARK_GRAFT_CPUS is honored). `cpus` is the requested
        # count; `default_parallelism` is what the live context
        # actually resolved — they match in local[cpus] mode, and a
        # divergence would itself be the diagnostic.
        "cpus": cpus,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    if failures:
        result["failures"] = failures
    sec_dir = os.environ.get(
        "SPARK_GRAFT_SECONDARY_SF_DIR", "/root/testdata/sf0.01"
    )
    if sec_dir and os.path.isdir(sec_dir) and sec_dir != sf_dir:
        sec_failures: dict[str, str] = {}
        sec = run_suite(sec_dir, sec_failures)
        result["secondary"] = {
            "sf": sf_of(sec_dir),
            "value": round(sum(sec.values()), 3),
            "queries": sec,
        }
        if sec_failures:
            result["secondary"]["failures"] = sec_failures
    # [before-suite, after-suite] probes: code-independent host-speed
    # anchors for cross-window comparisons (docstrings above)
    result["host_calib_sec"] = [calib_before, _host_calibration()]
    result["host_disk_mbps"] = [disk_before, _disk_calibration()]
    # full-fidelity record → sidecar file; the stdout line must fit the
    # driver's 2000-char tail window (module docstring)
    full_path = Path(__file__).resolve().parent / "BENCH_full.json"
    full_path.write_text(json.dumps(result, indent=1) + "\n")
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "queries": {q: round(t, 1) for q, t in timings.items()},
        "sf": result["sf"],
        "detail": full_path.name,
        # both parallelism fields ride the compact line too — the
        # driver's 32- and 8-core passes must be distinguishable from
        # BENCH_r{N}.json alone (VERDICT r8 item 2); ~40 chars, inside
        # the measured tail headroom, and _fit_tail degrades the
        # per-query dict first if the set ever grows
        "cpus": result["cpus"],
        "default_parallelism": result["default_parallelism"],
    }
    if failures:
        # identity of failed queries must survive even in the compact
        # line; messages live in the sidecar
        compact["failed"] = sorted(failures)
    # surface the secondary (correctness-SF) pass in the compact line
    # too: previously its total AND its failures lived only in the
    # sidecar, so a query that broke solely at sf0.01 was invisible in
    # BENCH_r{N}.json (VERDICT r7 item 5)
    if "secondary" in result:
        compact["secondary_value"] = result["secondary"]["value"]
        if result["secondary"].get("failures"):
            compact["secondary_failed"] = sorted(
                result["secondary"]["failures"]
            )
    # 1900 = 2000-char driver tail minus newline + margin for any
    # stray line the JVM emits after us; degrade logic in _fit_tail
    return _fit_tail(compact)


if __name__ == "__main__":
    main()
