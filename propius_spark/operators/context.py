"""Context encoding (the reference's `refid_serial`).

The reference assigns each *run* of equal adjacent reference_ids a new
1-based serial while streaming CSV chunks (propius/similarity.py:67-85),
which is only correct because its input arrives pre-sorted by
reference_id. The engine does not need any encoding at all for
correlation: serials merely *name* matrix columns, and Pearson is
invariant under any bijective renaming of contexts, so the default
pipeline uses the raw `reference_id` as the context key — no global
sort, no single-partition window, no shuffle.

Two encoders are still provided for parity/compactness:

- `encode_contexts` — dense 0-based ids via `dense_rank` over
  reference_id. NOTE: a no-partition window funnels all rows through a
  single task; this is fine for building a small dimension (distinct
  contexts) but must never sit on the hot path at scale. We therefore
  rank the *distinct* reference ids (small) and broadcast-join back.
- `encode_contexts_replay` — exact replay of the reference's run-length
  semantics (a reference_id reappearing non-contiguously gets a NEW
  serial), for byte-parity experiments only. Requires an explicit
  ordering column since DataFrames have no inherent row order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def encode_contexts(occurrences: DataFrame) -> DataFrame:
    """Add `ctx_id` (dense 0-based long) for each distinct reference_id.

    The rank runs over the distinct contexts only (bounded by context
    cardinality, not row count) and is joined back; Catalyst broadcasts
    when the dimension is small.

    NULL reference_ids are dropped (a null context key carries no
    co-occurrence information): left in, the null would take dense
    rank 0 — shifting every real id up by one — while the equi-join
    silently discarded its rows anyway, so ctx_id 0 never appeared and
    the documented dense-0-based contract broke.
    """
    from ..plans import bounded_rank

    occurrences = occurrences.filter(F.col("reference_id").isNotNull())
    distinct_refs = occurrences.select("reference_id").distinct()
    # bounded_rank guard: unlike the dict-mode shingle dictionaries
    # (bounded by vocabulary), context cardinality scales with the
    # event log — billions at the target scale would funnel through
    # this one-task sort. The default pipeline doesn't need this op at
    # all (build_cells correlates on RAW reference_ids, rank-invariant
    # by the relabeling property test); it exists for reference-parity
    # dense ids, so past the bound it raises and points at the raw-id
    # path instead of silently stalling.
    ranked = distinct_refs.select(
        "reference_id",
        bounded_rank(
            (F.dense_rank().over(Window.orderBy("reference_id")) - 1).cast(
                "long"
            ),
            10_000_000,
            "encode_contexts (use raw reference_ids — the default — "
            "at this scale)",
        ).alias("ctx_id"),
    )
    return occurrences.join(ranked, "reference_id")


def encode_contexts_replay(occurrences: DataFrame, order_col: str) -> DataFrame:
    """Reference-replay run-length serials (0-based `ctx_id`).

    Mirrors propius/similarity.py:74-78: increment the serial whenever
    the reference_id differs from the previous row, in `order_col`
    order. Single global window — replay/debug tool only.

    NULL reference_ids are dropped first (same policy as
    encode_contexts): left in, `lag != col` evaluates NULL against a
    null row, so the null row silently merged into the PREVIOUS run
    while the row after it always started a new serial — incoherent
    serials neither the reference nor the dense encoder would produce.
    """
    occurrences = occurrences.filter(F.col("reference_id").isNotNull())
    w = Window.orderBy(order_col)
    changed = (
        F.when(F.lag("reference_id").over(w).isNull(), F.lit(1))
        .when(F.lag("reference_id").over(w) != F.col("reference_id"), F.lit(1))
        .otherwise(F.lit(0))
    )
    run = F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return occurrences.withColumn("ctx_id", (run - 1).cast("long"))
