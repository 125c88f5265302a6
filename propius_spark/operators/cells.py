"""Cell table: the distributed sparse crosstab matrix.

Replaces the reference's COO-triplet → CSR build
(propius/similarity.py:47-89). The long-form DataFrame
(item_id, ctx_id, cnt) IS the sparse matrix: duplicate
(item, context) events sum natively under groupBy (the reference gets
the same via coo→csr duplicate summation), there is no pre-sizing
parameter, and no 1-based→0-based shift — the engine keeps original
item ids end-to-end and only maps to store positions at the publication
edge where reference parity requires it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns


def build_cells(occurrences: DataFrame, ctx_col: str = "reference_id") -> DataFrame:
    """(item_id, ctx_id, cnt) with cnt = number of co-occurrence events.

    One shuffle on (item, ctx); map-side partial aggregation halves the
    shuffled bytes. `ctx_col` defaults to the raw reference_id (no
    encoding needed — see operators/context.py).
    """
    require_columns(occurrences, ["item_id", ctx_col], "build_cells")
    # cnt is DOUBLE from birth — the literal twin of the oracle's
    # COUNT(*)::DOUBLE at the cell CTE. Summing longs downstream and
    # casting after the aggregate (the old shape) broke the module's
    # no-64-bit-wrap guarantee: at design-target scale q = Σcnt² can
    # exceed 2⁶³, where ANSI mode (Spark 4 default) kills the job and
    # legacy mode silently wraps every correlation. Double partial sums
    # are the same IEEE arithmetic the oracle uses.
    #
    # NULL ids are NOT data: the reference's matrix build assigns ids
    # into int32 COO arrays (propius/similarity.py:63-89), where a NaN
    # id cannot exist (the assignment raises) — null item/context ids
    # are outside its domain entirely. Spark's groupBy instead KEEPS a
    # null group — which can never equi-join (gram drops it) yet WOULD
    # leak into the separable global sums (V, Σt, Σt²) that
    # neighbor_stats uses, silently shifting every item's
    # mean/σ/extremes on null-bearing data (fuzz-parity find). Drop
    # both up front, once, where the matrix is born.
    return (
        occurrences.filter(
            F.col("item_id").isNotNull() & F.col(ctx_col).isNotNull()
        )
        .groupBy(F.col("item_id"), F.col(ctx_col).alias("ctx_id"))
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )


def vstack(
    cells_a: DataFrame,
    cells_b: DataFrame,
    offset: int,
    validate: bool = False,
) -> DataFrame:
    """Union a second item-set before correlating (reference
    propius/similarity.py:28-29 `sparse.vstack`). Set B's item ids are
    shifted by `offset` so the two id spaces cannot collide — PROVIDED
    ``offset`` exceeds set A's max item id. That is the CALLER's
    contract (derive it from the data: ``max(item_id) + 1`` — a fixed
    constant silently corrupts the stack the day the id space outgrows
    it, and since both colliding items' cells merge, downstream
    correlations are wrong with no error). ``validate=True`` asserts
    it eagerly (one max-aggregate job over set A).
    """
    if validate:
        mx = cells_a.agg(F.max("item_id").alias("m")).first().m
        if mx is not None and mx >= offset:
            raise ValueError(
                f"vstack: offset {offset} <= max item_id {mx} of set A — "
                "the id spaces would collide; use max(item_id) + 1"
            )
    # widen BEFORE adding: an int32 item_id column near 2³¹ plus an
    # int32-ranged offset overflows in 32-bit under ANSI (job dies) or
    # wraps negative and collides under legacy — the post-add cast
    # never sees the correct value
    shifted = cells_b.withColumn(
        "item_id", F.col("item_id").cast("long") + F.lit(offset)
    )
    return cells_a.select("item_id", "ctx_id", "cnt").unionByName(
        shifted.select("item_id", "ctx_id", "cnt")
    )
