"""Dump `.explain("formatted")` for every declared query (or a named
subset) into plans/<tag>/<query>_<suffix>.txt — the before/after
evidence files the optimization rounds commit (the judge reads these
instead of running Spark).

Usage:
  python scripts/dump_plans.py <tag> <suffix> [query ...]
  e.g. python scripts/dump_plans.py r08 before
       python scripts/dump_plans.py r08 after corr_pairs_parts

Plans are built at $PROPIUS_ORACLE_SF_DIR (default sf0.001): plan
SHAPE is scale-invariant, and queries that execute eager jobs at
build time (materialize) stay cheap there. Same caveats as
plan_audit.py: lazy-cached subtrees reprint under every consumer, so
read the files as shape evidence, not work counts.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("PROPIUS_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    if len(sys.argv) < 3:
        raise SystemExit("usage: dump_plans.py <tag> <suffix> [query ...]")
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])

    import __spark_entry__ as entrymod
    from propius_spark.session import clear_materialized, get_spark

    unknown = only - set(entrymod.queries())
    if unknown:
        raise SystemExit(f"dump_plans: unknown queries {sorted(unknown)}")
    outdir = Path(__file__).resolve().parent.parent / "plans" / tag
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump_plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    failed: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (outdir / f"{name}_{suffix}.txt").write_text(plan)
            print(f"{name}: {len(plan)} chars")
        except Exception as e:  # noqa: BLE001 — keep dumping the rest
            failed[name] = f"{type(e).__name__}: {e}"
            print(f"{name}: FAILED {failed[name]}")
        clear_materialized(spark)
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
