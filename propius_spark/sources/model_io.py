"""Model (correlation-pairs table) persistence.

Replaces the reference's dense-matrix save/load
(propius/similarity.py:170-207: CSV via pandas, `.npy` via numpy, and a
documented-but-unimplemented "pickle" that raises). The engine's model
is the long-form pairs DataFrame; parquet is the canonical format (CSV
kept for interchange parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_pairs(pairs: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt == "parquet":
        pairs.write.mode("overwrite").parquet(path)
    elif fmt == "csv":
        pairs.write.mode("overwrite").option("header", "true").csv(path)
    else:
        raise ValueError(f"Unsupported format: {fmt}")


def load_pairs(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(path)
    elif fmt == "csv":
        return (
            spark.read.option("header", "true")
            .schema("item_a long, item_b long, corr double")
            .csv(path)
        )
    else:
        raise ValueError(f"Unsupported format: {fmt}")


def save_reference_matrix(
    pairs: DataFrame,
    path: str,
    fmt: str = "numpy",
    n_items: int | None = None,
    fill: float = float("nan"),
    max_items: int = 32768,
) -> None:
    """Write the long-form pairs model as the REFERENCE engine's dense
    matrix format (propius/similarity.py:170-187 save_correlation_matrix):
    ``.npy`` via ``np.save`` (``fmt="numpy"``) or pandas CSV with 0-based
    positional columns (``fmt="csv"``). The inverse of
    :func:`load_reference_matrix` — an install of the reference can
    ``np.load`` / ``pd.read_csv`` the output directly.

    Densification is driver-side BY CONTRACT: the output format is a
    dense I x I matrix the reference holds in one process's memory, so
    any model that fits the format fits the driver. ``max_items`` guards
    the O(I^2) materialization (default 32768 items = 8 GiB float64);
    beyond that the dense interchange format itself is the wrong tool —
    use :func:`save_pairs` (parquet/CSV long form) instead.

    The diagonal is written as 1.0; pairs absent from the model (items
    that never co-occur, or zero-variance items the pipeline excluded)
    are written as ``fill`` (default NaN, matching the reference's
    np.corrcoef output for zero-variance rows).
    """
    import numpy as np
    from pyspark.sql import functions as F

    if fmt not in ("numpy", "csv"):
        raise ValueError(f"Unsupported format: {fmt}")
    if fmt == "numpy" and not path.endswith(".npy"):
        # np.save appends '.npy' to extension-less paths — normalize
        # HERE so save/load stay inverses for the path the caller holds
        path = path + ".npy"
    # size check via a distributed aggregate BEFORE collect(): the
    # guard exists to prevent a driver OOM, so it must run before the
    # driver materializes anything pair-cardinality. The frame is
    # persisted across the guard + collect pair — without it the whole
    # upstream pipeline (possibly a full model build) executes twice.
    n = n_items
    if n is None:
        pairs = pairs.persist()
    try:
        if n is None:
            agg = pairs.agg(
                F.max(F.greatest("item_a", "item_b")).alias("mx")
            ).first()
            n = 1 + (agg.mx if agg.mx is not None else -1)
        if n > max_items:
            raise ValueError(
                f"dense interchange refused for {n} items "
                f"(> max_items={max_items}); the O(I^2) matrix would not "
                "be driver-sized — use save_pairs (long-form parquet) "
                "instead"
            )
        rows = pairs.select("item_a", "item_b", "corr").collect()
    finally:
        if n_items is None:
            pairs.unpersist()
    m = np.full((n, n), fill, dtype="float64")
    np.fill_diagonal(m, 1.0)
    for r in rows:
        if not (0 <= r.item_a < n and 0 <= r.item_b < n):
            raise ValueError(
                f"pair ({r.item_a}, {r.item_b}) outside the dense id "
                f"space [0, {n}) — ids must be 0-based matrix positions "
                "(the reference's positional-index convention); pass "
                "n_items only if it covers every id"
            )
        m[r.item_a, r.item_b] = r.corr
    if fmt == "numpy":
        np.save(path, m)
    else:
        import pandas as pd

        pd.DataFrame(m).to_csv(path, index=False)


def load_reference_matrix(
    spark: SparkSession, path: str, fmt: str = "numpy"
) -> DataFrame:
    """Interchange shim for models stored by the REFERENCE engine
    (propius/similarity.py:170-207): a dense I×I correlation matrix as
    `.npy` (``format="numpy"``) or pandas CSV (``format="csv"``,
    columns are 0-based matrix positions), loaded into the engine's
    long-form pairs schema (item_a, item_b, corr), 0-based ids,
    off-diagonal finite entries only (the reference's NaN rows are
    zero-variance items, which the native pipeline also excludes;
    the all-1.0 diagonal is implicit).

    Driver-side numpy at the API edge is deliberate: this is a MODEL
    FILE the reference produced, inherently driver-sized (the
    reference held the dense matrix in one process's memory to write
    it). Migrating stores land here once, then live as parquet via
    save_pairs.
    """
    import numpy as np

    if fmt == "numpy":
        import os

        if not path.endswith(".npy") and not os.path.exists(path):
            # np.save appended '.npy' to extension-less paths at save
            # time; mirror that here so save('foo')/load('foo') stay
            # inverses for the path the caller holds — but only when
            # the bare path doesn't exist, so pre-existing
            # extension-less artifacts (np.save to an open file object
            # appends nothing) still load as before
            path = path + ".npy"
        m = np.load(path)
    elif fmt == "csv":
        import pandas as pd

        m = pd.read_csv(path).to_numpy()
    else:
        raise ValueError(f"Unsupported format: {fmt}")
    m = np.asarray(m, dtype="float64")
    if m.ndim != 2 or m.shape[0] != m.shape[1]:
        raise ValueError(f"expected a square matrix, got shape {m.shape}")
    a, b = np.nonzero(~np.eye(m.shape[0], dtype=bool) & np.isfinite(m))
    rows = [(int(i), int(j), float(m[i, j])) for i, j in zip(a, b)]
    return spark.createDataFrame(rows, "item_a long, item_b long, corr double")
