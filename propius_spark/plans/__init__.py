"""Plan-shaping utilities shared by the batch operators."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, key_col: str) -> DataFrame:
    """Hash-repartition by ``key_col`` to an EXPLICIT partition count
    (the cluster default parallelism) so compute-bound per-row map
    stages use every core even when the input is one small file.
    Explicit count matters: AQE coalesces shuffle partitions by byte
    size and would fold a few MB of raw text back into one task
    regardless of expression cost.

    Deliberately NOT ``max(default, df.rdd.getNumPartitions())``:
    touching ``df.rdd`` under AQE finalizes the adaptive plan, which
    EXECUTES every upstream shuffle stage just to count partitions —
    a derived input (join/aggregate upstream) would run its whole
    pipeline twice. A frame already wider than the default keeps its
    parallelism through the exchange anyway at realistic scales, and
    callers with a known-wider input can repartition themselves."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, F.col(key_col))


def materialize(df: DataFrame) -> DataFrame:
    """Materialize a subtree consumed by several downstream branches:
    MEMORY_AND_DISK storage + lineage truncation (localCheckpoint).

    Two reasons, both measured at sf0.01:
    - Spark's exchange reuse only deduplicates *identical* physical
      subplans inside one action; our pipelines consume shared tables
      (cells/stats/gram, shingle sets, signatures) under different
      projections and filters, so without persistence each branch
      re-runs the scan+shuffle.
    - Plain persist() keeps the full logical plan, and AQE re-optimizes
      the deep nested tree per query stage — the final 4-way join of
      2k-row tables took 66 s of pure driver planning with AQE on vs
      0.6 s with truncated lineage. Checkpointing the small tables keeps
      AQE (wanted for skew-join on the big shuffles) while bounding the
      plan it has to replan.

    Eager, deliberately: a *lazy* localCheckpoint is re-computed by
    every AQE query-stage job that reaches it before the first
    materialization registers — composing the exact-similarity pipeline
    lazily took 218 s at sf0.1 while the same stages materialized
    eagerly total < 10 s. Eager means building one of these DataFrames
    runs jobs immediately; fine for batch pipelines, and the returned
    frame is a plain fast table scan afterwards.

    Only call this on item-, pair-, or sketch-cardinality tables —
    orders of magnitude smaller than the event log / corpus they derive
    from — so they store safely even at large scale.

    Durability: when a checkpoint directory is configured (either
    ``spark.checkpoint.dir`` at session build or
    ``sc.setCheckpointDir(...)`` at runtime — point it at durable
    storage on a real cluster), this uses reliable ``checkpoint()``,
    which survives executor loss. Otherwise it uses
    ``localCheckpoint()`` (executor-local blocks, MEMORY_AND_DISK) —
    right for single-JVM/local runs where executor loss means the app
    is gone anyway. Same semantics either way: eager materialization +
    lineage truncation. Call
    ``propius_spark.session.clear_materialized(spark)`` after consuming
    the pipeline so the blocks don't linger into later queries.
    Checkpoint FILES are reclaimed by the ContextCleaner once their
    RDDs are GC'd — that needs
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (set by
    propius_spark.session.get_spark; set it yourself on a vanilla
    session, or repeated pipelines accumulate checkpoint data).
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        # persist around the reliable checkpoint: eager checkpoint()
        # runs one job to compute the plan and a SECOND job to write
        # the checkpoint files — unpersisted, the second job recomputes
        # every partition from scratch (Spark's own RDD.checkpoint docs
        # warn exactly this), doubling the cost this function exists to
        # remove. The cache is dropped once the files are written.
        df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint(eager=True)


def persist_big(df: DataFrame) -> DataFrame:
    """Disk-backed lazy cache for CORPUS-SCALE intermediates — the
    shingle/token tables `materialize` must never touch (its contract
    is item/pair/sketch-cardinality only: eager MEMORY_AND_DISK
    checkpointing would pin ~corpus×k bytes of executor storage
    memory). DISK_ONLY keeps the storage-memory pool free for the
    joins' execution memory; each partition computes once on first
    use and is read back from local disk by later consumers — the
    same I/O class as the shuffle files those consumers write anyway.
    Lazy deliberately: no extra action, and the two-node lineage
    (scan → map) doesn't trigger the AQE deep-replan pathology that
    motivated materialize's eagerness. Released by
    ``session.clear_materialized`` (catalog cache clear)."""
    from pyspark import StorageLevel

    return df.persist(StorageLevel.DISK_ONLY)

def bounded_rank(rank: "F.Column", max_n: int, what: str) -> "F.Column":
    """In-plan size guard for the repo's three deliberate global-rank
    windows (dict-mode shingle/token dictionaries, vocabulary rank):
    each ranks a *bounded-by-contract* table (a distinct dictionary or
    a post-filter vocabulary, ≪ corpus) on one task, which is the
    right plan while the bound holds and a silent single-task sort
    past it. The guard turns "silently slow/OOM" into a loud error at
    exactly the row where the contract breaks, and costs one codegen'd
    conditional per dictionary row — no extra job, no second pass, so
    the production xxhash paths and the gate data never notice it.
    Callers that truly need a larger dictionary should switch to the
    stateless hash id mode (the scale path) rather than raise the cap.
    """
    return F.when(rank <= F.lit(max_n), rank).otherwise(
        F.raise_error(
            F.lit(
                f"{what}: single-task rank window exceeded its "
                f"documented bound of {max_n} rows (id_mode='dict' and "
                "unlimited vocabulary() rank on one task; use the hash "
                "id mode / a LIMIT at this scale)"
            )
        )
    )
