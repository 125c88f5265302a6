"""Suite-wide physical-plan audit: scan / exchange / Python-eval
counts for every declared query (the round-3 practice recorded in
.claude/skills/verify/SKILL.md, as a runnable artifact).

For each `queries()` entry, builds the DataFrame at $PROPIUS_ORACLE_SF_DIR
(default sf0.001 — plan SHAPE is scale-invariant, so the smallest
fixture is enough) and counts in the formatted physical plan:

  scans     `Scan parquet` nodes — more scans of one table than the
            query has logical inputs means a shared subtree replays
            per consumer (fix: plans.materialize / persist_big)
  exch      `Exchange` nodes — each is a shuffle
  python    ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas /
            BatchEvalPython nodes — Python-worker stages; parity paths
            must stay at 0 (pinned by tests/test_plans.py)

Prints one line per query plus a trailing JSON summary. Queries whose
plan count changed since the committed snapshot deserve a look, not
necessarily a revert — the point is that plan regressions surface in
review instead of in BENCH_r{N}.json.

Note: queries that EXECUTE work at plan-build time (publish_retrieve
writes its store; materialize() runs eager jobs) are measured on the
plan of the RETURNED DataFrame — build-time side jobs aren't visible
here, so their counts understate total work. BENCH covers those.

Conversely, LAZY-cached subtrees (plans.persist_big) are REPRINTED
under every consuming InMemoryTableScan in formatted mode, so their
scan/exchange counts OVERSTATE runtime work — dedup_minhash_lsh shows
14 scans / 37 exchanges on paper but executes the shingle/signature
subtree once (2.9 s at sf0.1, in line with its siblings). Read counts
as relative plan-shape signals, compare like with like, and confirm a
suspected replay with the Spark UI / BENCH before "fixing" it.
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("PROPIUS_ORACLE_SF_DIR", "/root/testdata/sf0.001")

# note: applyInPandasWithState prints FlatMapGroupsInPandasWithState —
# the plain FlatMapGroupsInPandas alternative prefix-matches it, and
# the explicit spelling keeps the count correct if the regex is ever
# anchored or reordered
PY_NODES = re.compile(
    r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandasWithState"
    r"|FlatMapGroupsInPandas|BatchEvalPython"
)


def main() -> None:
    import __spark_entry__ as entrymod
    from propius_spark.session import clear_materialized, get_spark

    only = set(sys.argv[1:])
    unknown = only - set(entrymod.queries())
    if unknown:
        # a typo'd name must not produce an empty "no regressions"
        # audit that exits 0
        raise SystemExit(f"plan_audit: unknown queries {sorted(unknown)}")
    spark = get_spark("plan_audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict[str, dict[str, int]] = {}
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
            counts = {
                "scans": len(re.findall(r"Scan parquet", plan)),
                "exch": len(re.findall(r"\bExchange\b", plan)),
                "python": len(PY_NODES.findall(plan)),
            }
            out[name] = counts
            print(
                f"{name:32s} scans={counts['scans']:2d} "
                f"exch={counts['exch']:2d} python={counts['python']}"
            )
        except Exception as e:  # noqa: BLE001 — audit keeps going
            failed[name] = f"{type(e).__name__}: {e}"
            print(f"{name:32s} FAILED {failed[name]}")
        clear_materialized(spark)
    print(json.dumps({"sf_dir": SF_DIR, "plans": out, "failed": failed}))
    spark.stop()
    # nonzero when any query failed to even build its plan — an audit
    # with missing rows must not read as green to a pre-commit routine
    # that checks the exit status (same posture as the unknown-name
    # SystemExit above)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
