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


def test_load_reference_matrix_npy_and_csv(spark, tmp_path):
    """Reference-engine model interchange (propius/similarity.py
    save_correlation_matrix formats): a dense I x I matrix round-trips
    into the long-form pairs schema — off-diagonal finite entries,
    0-based ids, NaN (zero-variance) entries dropped."""
    import numpy as np
    import pandas as pd

    from propius_spark.sources import load_reference_matrix

    m = np.array(
        [
            [1.0, 0.5, np.nan, -0.25],
            [0.5, 1.0, np.nan, 0.75],
            [np.nan, np.nan, np.nan, np.nan],
            [-0.25, 0.75, np.nan, 1.0],
        ]
    )
    want = sorted(
        (i, j, m[i, j])
        for i in range(4)
        for j in range(4)
        if i != j and np.isfinite(m[i, j])
    )

    npy = str(tmp_path / "model.npy")
    np.save(npy, m)
    got = sorted(
        (r.item_a, r.item_b, r.corr)
        for r in load_reference_matrix(spark, npy).collect()
    )
    assert got == want

    csv = str(tmp_path / "model.csv")
    pd.DataFrame(m).to_csv(csv, index=False)
    got_csv = sorted(
        (r.item_a, r.item_b, r.corr)
        for r in load_reference_matrix(spark, csv, fmt="csv").collect()
    )
    assert got_csv == want

    import pytest

    with pytest.raises(ValueError):
        load_reference_matrix(spark, npy, fmt="pickle")
