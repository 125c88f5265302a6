"""Occurrence ingestion (sources/occurrences.py): every supported
format round-trips to the same canonical (reference_id, item_id) frame,
format inference follows the extension, and the empty-path guard
raises (reference propius/utils.py:30-31)."""

from __future__ import annotations

import pytest

from propius_spark.sources import load_occurrences

ROWS = [(1, 10), (1, 11), (2, 10), (3, 12)]


def _write(spark, fmt, path):
    w = spark.createDataFrame(ROWS, "reference_id long, item_id long").coalesce(
        1
    ).write.mode("overwrite")
    if fmt == "csv":
        w.option("header", "true").csv(path)
    else:
        getattr(w, fmt)(path)


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
def test_load_occurrences_roundtrip(spark, tmp_path, fmt):
    path = str(tmp_path / f"occ_{fmt}")
    _write(spark, fmt, path)
    got = sorted(
        (r.reference_id, r.item_id)
        for r in load_occurrences(spark, path, fmt=fmt).collect()
    )
    assert got == sorted(ROWS)


def test_load_occurrences_infers_format(spark, tmp_path):
    path = str(tmp_path / "occ.json")
    _write(spark, "json", path)
    got = sorted(
        (r.reference_id, r.item_id)
        for r in load_occurrences(spark, path).collect()
    )
    assert got == sorted(ROWS)


def test_load_occurrences_empty_path_raises(spark):
    with pytest.raises(ValueError):
        load_occurrences(spark, "")
