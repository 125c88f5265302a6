"""bench.py's stdout-tail contract, unit-tested without Spark: the
driver keeps only the last ~2000 chars of stdout, so the ONE summary
line must (a) fit 1900 chars, (b) keep the contract fields through
every degrade step, and (c) never vanish entirely — the failure mode
the old bare `assert` had under -O (ADVICE r7)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _fit_tail  # noqa: E402

CONTRACT = {"metric", "value", "unit", "sf", "detail"}


def _base(n_queries: int) -> dict:
    return {
        "metric": "total_query_wall_time",
        "value": 123.456,
        "unit": "sec",
        "queries": {f"query_{i:03d}": round(i * 0.7, 1) for i in range(n_queries)},
        "sf": 0.1,
        "detail": "BENCH_full.json",
        "cpus": 32,
        "default_parallelism": 32,
        "secondary_value": 45.678,
    }


def test_current_suite_size_fits_untouched():
    """74 queries (the real suite) serialize inside budget with the
    per-query dict intact."""
    compact = _base(74)
    line = _fit_tail(compact)
    assert len(line) <= 1900
    d = json.loads(line)
    assert CONTRACT <= set(d)
    assert len(d["queries"]) == 74
    assert d["secondary_value"] == 45.678
    # the parallelism contract fields (VERDICT r8 item 2) must survive
    # at the real suite size
    assert d["cpus"] == 32
    assert d["default_parallelism"] == 32


def test_oversize_suite_degrades_to_minimal_line():
    """A future 300-query suite overflows → queries dropped, contract
    fields and the sidecar pointer survive."""
    line = _fit_tail(_base(300))
    assert len(line) <= 1900
    d = json.loads(line)
    assert CONTRACT <= set(d)
    assert d["queries"] == {}
    assert "queries_note" in d
    assert d["detail"] == "BENCH_full.json"


def test_failed_list_blowup_collapses_to_counts():
    """Hundreds of failed-query names (a broken-session worst case)
    still produce a parseable line: name lists become counts."""
    compact = _base(300)
    compact["failed"] = [f"query_{i:03d}" for i in range(150)]
    compact["secondary_failed"] = [f"query_{i:03d}" for i in range(150)]
    line = _fit_tail(compact)
    assert len(line) <= 1900
    d = json.loads(line)
    assert CONTRACT <= set(d)
    assert d["n_failed"] == 150
    assert d["n_secondary_failed"] == 150
    assert "failed" not in d and "secondary_failed" not in d


def test_budget_is_driver_tail_minus_margin():
    """The default budget must stay under the driver's 2000-char tail
    window; a tighter explicit budget is honored."""
    line = _fit_tail(_base(74), budget=400)
    assert len(line) <= 400
    assert json.loads(line)["queries"] == {}
