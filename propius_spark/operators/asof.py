"""As-of join: attach the latest right-side observation at-or-before
each left event (backward as-of, the kdb/pandas `merge_asof` /
DuckDB `ASOF JOIN` operator). Spark has no native as-of join; this is
the idiomatic composition — union the tagged streams and carry right
values forward with last(ignorenulls) over one entity-ordered window:

    L:(k, t, ...) ⟕asof R:(k, t, v...)  ≡
    union → Window.partitionBy(k).orderBy(t, side) →
    last(v, ignorenulls=True) → keep left rows

Cost model (100 TB): ONE shuffle of |L|+|R| rows on the entity key —
the same minimum any per-entity ordering needs (cf. sessionize) — and
a per-key sort; no range-explosion, no per-left-row probe. Hot
entities are the usual skew hazard (AQE + per-(key, day) pre-split).
Contrast the naive theta-join `l.k = r.k AND r.t <= l.t` + max-window,
which explodes to Σ_k |L_k|·|R_k| rows before pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..schemas import require_columns
from .sessions import _ts_micros


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Backward as-of: each left row gains `value_cols` from the right
    row with the greatest right.ts ≤ left.ts for the same `on` key
    (null when no such row — a left join). Timestamps are normalized
    to epoch micros and returned as `{ts_col}_us`.

    Equal timestamps on opposite sides match (right at t is visible to
    left at t). Multiple right rows tied on (key, ts) pick one
    arbitrarily — give right a deterministic tiebreak column upstream
    if that matters.

    NULL keys/timestamps: Spark's window partitioning GROUPS null keys
    together, so null-key left rows can receive null-key right values
    — unlike SQL ASOF JOIN equality, which never matches NULL. A
    null-ts left row precedes everything under NULLS FIRST and gets no
    match here, but SQL engines may sort it last and match everything.
    Callers needing SQL semantics must pre-filter null left keys/times
    (see q_asof_click_purchase).

    Row integrity: all `value_cols` come from the SAME matched right
    row (they travel as one struct carried by a single
    last(ignorenulls)), so a right row whose value column is NULL
    contributes that NULL — matching pandas merge_asof / DuckDB ASOF —
    rather than falling through to an older non-null value.
    """
    require_columns(left, [on, ts_col], "asof_join(left)")
    require_columns(right, [on, ts_col], "asof_join(right)")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, ts_col)]
    lonly = [c for c in left.columns if c not in (on, ts_col)]
    clash = set(lonly) & set(value_cols)
    if clash:
        raise ValueError(f"column name clash between sides: {sorted(clash)}")
    # the output also carries `on` and `{ts_col}_us` — a value_col (or
    # a left column) named either would emit duplicate column names
    # and fail far downstream with AMBIGUOUS_REFERENCE instead of here
    reserved = {on, ts_col, f"{ts_col}_us"}
    bad = sorted(reserved & set(value_cols)) + sorted(
        {f"{ts_col}_us"} & set(lonly)
    )
    if bad:
        raise ValueError(
            f"asof_join: column(s) {bad} collide with the join key / "
            f"normalized timestamp output ({on!r}, {ts_col + '_us'!r})"
        )

    ltypes = dict(left.dtypes)
    # the whole right payload rides in ONE struct: non-null for every
    # right row (even when all its fields are null), null filler on
    # left rows — last(ignorenulls) then attaches exactly one matched
    # right row, never a column-wise mix of several
    vstruct = T.StructType([right.schema[c] for c in value_cols])
    l2 = left.select(
        F.col(on),
        _ts_micros(left, ts_col).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in lonly],
        F.lit(None).cast(vstruct).alias("__v"),
    )
    # a NULL right timestamp can never satisfy r.ts <= l.ts (pandas
    # merge_asof and DuckDB ASOF both treat the comparison as false) —
    # but Spark's NULLS FIRST ascending sort would place such a row at
    # -infinity and carry its values into EVERY left row. Drop them.
    r2 = right.filter(F.col(ts_col).isNotNull()).select(
        F.col(on),
        _ts_micros(right, ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lonly],
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
    )
    # at equal ts, right (__side 1) sorts BEFORE left so its value is
    # already carried when the left row is evaluated
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l2.unionByName(r2).select(
        "*", F.last("__v", ignorenulls=True).over(w).alias("__fv")
    )
    return (
        filled.filter(F.col("__side") == 0)
        .select(
            F.col(on),
            F.col("__ts").alias(f"{ts_col}_us"),
            *[F.col(c) for c in lonly],
            *[F.col("__fv")[c].alias(c) for c in value_cols],
        )
    )
