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


def test_save_reference_matrix_roundtrip(spark, tmp_path):
    """Write side of the reference interchange (propius/similarity.py
    :170-187 save_correlation_matrix): the long-form pairs model
    densifies to the exact np.save / pandas-CSV artifact the reference
    produces — np.load reads it back bit-for-bit, and
    load_reference_matrix inverts it to the original pairs."""
    import numpy as np
    import pandas as pd
    import pytest

    from propius_spark.sources import (
        load_reference_matrix,
        save_reference_matrix,
    )

    pairs = spark.createDataFrame(
        [(0, 1, 0.5), (1, 0, 0.5), (0, 3, -0.25), (3, 0, -0.25),
         (1, 3, 0.75), (3, 1, 0.75)],
        "item_a long, item_b long, corr double",
    )

    npy = str(tmp_path / "model.npy")
    save_reference_matrix(pairs, npy, fmt="numpy")
    m = np.load(npy)
    # Reference-shape checks: square float64, unit diagonal, NaN where
    # the model has no pair (item 2 = the zero-variance row).
    assert m.shape == (4, 4) and m.dtype == np.float64
    assert np.allclose(np.diag(m), 1.0)
    assert np.isnan(m[2, 0]) and np.isnan(m[0, 2])
    assert m[0, 1] == 0.5 and m[1, 3] == 0.75 and m[3, 0] == -0.25
    # Inverse of load_reference_matrix: same pairs come back (NaN rows
    # drop, diagonal implicit).
    got = sorted(
        (r.item_a, r.item_b, r.corr)
        for r in load_reference_matrix(spark, npy).collect()
    )
    want = sorted((r.item_a, r.item_b, r.corr) for r in pairs.collect())
    # diagonal entries are emitted by load (finite 1.0s) — drop them
    got = [t for t in got if t[0] != t[1]]
    assert got == want

    csv = str(tmp_path / "model.csv")
    save_reference_matrix(pairs, csv, fmt="csv")
    m_csv = pd.read_csv(csv).to_numpy()
    assert m_csv.shape == (4, 4)
    assert np.array_equal(np.isnan(m_csv), np.isnan(m))
    assert np.allclose(np.nan_to_num(m_csv), np.nan_to_num(m))

    with pytest.raises(ValueError):
        save_reference_matrix(pairs, npy, fmt="pickle")
    with pytest.raises(ValueError):
        save_reference_matrix(pairs, npy, max_items=2)


def test_load_occurrences_extensionless_raises(spark, tmp_path):
    """An extension-less path must error, not silently parse as CSV —
    the standard Spark parquet DIRECTORY layout has no extension and
    permissive CSV turned it into all-NULL rows."""
    path = str(tmp_path / "occ_dir")
    _write(spark, "parquet", path + ".parquet")
    with pytest.raises(ValueError, match="cannot infer format"):
        load_occurrences(spark, path)


def test_load_occurrences_parquet_casts_to_schema(spark, tmp_path):
    """Self-describing formats are CAST to the canonical schema: a
    parquet file with string-typed ids comes back long-typed."""
    path = str(tmp_path / "occ_str.parquet")
    spark.createDataFrame(
        [("1", "10"), ("2", "20")], "reference_id string, item_id string"
    ).write.parquet(path)
    df = load_occurrences(spark, path)
    assert dict(df.dtypes) == {"reference_id": "bigint", "item_id": "bigint"}
    assert sorted((r.reference_id, r.item_id) for r in df.collect()) == [
        (1, 10), (2, 20),
    ]


def test_save_reference_matrix_extensionless_npy_roundtrip(spark, tmp_path):
    """np.save appends '.npy' to extension-less paths; save normalizes
    the path itself so save→load stays an inverse for the path the
    caller holds (plus the .npy twin)."""
    from propius_spark.sources.model_io import (
        load_reference_matrix,
        save_reference_matrix,
    )

    pairs = spark.createDataFrame(
        [(0, 1, 0.5), (1, 0, 0.5)], "item_a long, item_b long, corr double"
    )
    base = str(tmp_path / "model")
    save_reference_matrix(pairs, base, fmt="numpy")
    got = sorted(
        (r.item_a, r.item_b, r.corr)
        for r in load_reference_matrix(spark, base + ".npy").collect()
    )
    assert got == [(0, 1, 0.5), (1, 0, 0.5)]


def test_save_load_reference_matrix_extensionless_path(spark, tmp_path):
    """save('foo') writes foo.npy (np.save appends the extension);
    load('foo') must apply the same normalization so save/load stay
    inverses for the path the caller holds (r3 advice item)."""
    from propius_spark.sources import (
        load_reference_matrix,
        save_reference_matrix,
    )

    pairs = spark.createDataFrame(
        [(0, 1, 0.5), (1, 0, 0.5)], "item_a long, item_b long, corr double"
    )
    bare = str(tmp_path / "model")  # no .npy
    save_reference_matrix(pairs, bare, fmt="numpy")
    got = {
        (r.item_a, r.item_b): r.corr
        for r in load_reference_matrix(spark, bare).collect()
    }
    assert got == {(0, 1): 0.5, (1, 0): 0.5}
