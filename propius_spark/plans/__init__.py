"""Plan-shaping utilities shared by the batch operators."""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# target checkpoint-block size for materialize's compaction pass
# (PROPIUS_CHECKPOINT_BLOCK_MB overrides; 0 disables compaction)
_CHECKPOINT_BLOCK_MB_DEFAULT = 128

# per-process observability for the compaction pass (scale-run A/Bs
# read this to prove the path engaged; tests pin the gate-SF no-op)
compaction_stats = {"engaged": 0, "skipped": 0}


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


def materialize(df: DataFrame, compact: bool | None = None) -> DataFrame:
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

    Checkpoint granularity is DECOUPLED from shuffle granularity
    (SCALE.md §8a finding 4: partition sizing is per-pipeline — 256
    shuffle partitions gave the pure-shuffle corr family 2.6× at sf10
    but slowed the checkpoint-heavy pipelines ~2×, because they
    re-read the checkpoint several times and 8× the partitions is 8×
    the block-store rounds on a store whose throughput collapses under
    concurrency). The COMPUTE always runs at full shuffle parallelism
    — the first checkpoint is exactly the old behavior. Then, when the
    result landed in many more blocks than its byte size warrants
    (> 2× the ~128 MB-block target, measured from the stored blocks,
    not guessed), ONE narrow compaction pass re-checkpoints it at the
    target and releases the fine-grained blocks. Fine shuffles for the
    sorts, coarse blocks for the re-reads; at the gate SFs every table
    lands under the threshold in the first place (kilobytes in ≤ 32
    partitions → a no-op), so gate plans and timings are unchanged.
    ``PROPIUS_CHECKPOINT_BLOCK_MB`` tunes the target; 0 disables
    compaction. Single-writer per session, like the rest of the
    materialization machinery (session.release_materialized_since):
    the before/after persistent-RDD diff that releases the fine blocks
    attributes every new id to this call.

    ``compact`` is the call site's consumer-shape knowledge, which no
    runtime heuristic can recover (sf10 A/B, SCALE.md §8b): compaction
    pays when consumers RE-READ the blocks repeatedly through narrow
    plans (similar_items' gram: 622 s → 259 s at 256 shuffle
    partitions), and is pure added I/O when every consumer immediately
    shuffles the table — one sequential scan each, block count
    irrelevant, but the compaction pass still re-reads and re-writes
    the whole table on a store that collapses under concurrency (the
    cells table: corr_pairs 289 s → 387 s with compaction on).
    ``None`` (default) = the auto size heuristic; ``False`` = never
    compact (the cells posture); ``True`` = same engage rule as auto,
    an explicit annotation for re-read-heavy tables.
    """
    spark = df.sparkSession
    sc = spark.sparkContext
    before = {int(k) for k in sc._jsc.getPersistentRDDs().keys()}
    first = _checkpoint_once(df, sc)
    block_mb = int(
        os.environ.get(
            "PROPIUS_CHECKPOINT_BLOCK_MB", str(_CHECKPOINT_BLOCK_MB_DEFAULT)
        )
    )
    if block_mb <= 0 or compact is False:
        return first
    # safe here: `first` is LogicalRDD-backed (no shuffles to finalize,
    # nothing recomputes — the AQE hazard in fan_out's docstring is
    # about un-executed upstream exchanges)
    nparts = first.rdd.getNumPartitions()
    new_ids = {
        int(k) for k in sc._jsc.getPersistentRDDs().keys()
    } - before
    stored = _stored_bytes(sc, new_ids)
    if stored is None:
        return first  # reliable-checkpoint mode or no block info: as-is
    # floor at defaultParallelism: compaction exists to cut block-store
    # ROUNDS (blocks ≫ cores), never to cut a small table below
    # one-block-per-core — downstream map stages over the checkpoint
    # keep their parallelism, and at the gate SFs (32 shuffle
    # partitions, 32 cores) the 2× engage margin is then never met, so
    # gate plans are bit-identical to the pre-compaction behavior
    n_target = max(
        sc.defaultParallelism, math.ceil(stored / (block_mb << 20))
    )
    if nparts <= 2 * n_target:
        compaction_stats["skipped"] += 1
        return first
    compaction_stats["engaged"] += 1
    compact = _checkpoint_once(first.coalesce(n_target), sc)
    # release the fine-grained blocks — `first` is internal to this
    # call and never escapes, so dropping its (lineage-truncated,
    # unrecomputable) blocks is safe
    jmap = sc._jsc.getPersistentRDDs()
    for k in list(jmap.keys()):
        if int(k) in new_ids:
            jmap[k].unpersist()
    return compact


def _checkpoint_once(df: DataFrame, sc) -> DataFrame:
    """One eager checkpoint: reliable ``checkpoint()`` when a
    checkpoint dir is configured (persist-wrapped — eager checkpoint
    runs one job to compute and a SECOND to write the files, and
    unpersisted the second job recomputes every partition from
    scratch, per Spark's own RDD.checkpoint docs), else
    ``localCheckpoint()``."""
    if sc.getCheckpointDir() is not None:
        df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint(eager=True)


def _stored_bytes(sc, rdd_ids: set[int]) -> int | None:
    """Actual stored size (memory + disk) of the given persistent RDD
    ids, from the block manager's RDDInfo — measured, not estimated.
    None when the ids hold no blocks (e.g. reliable-checkpoint mode
    released its persist wrapper, leaving nothing to compact by)."""
    total = 0
    seen = False
    for info in sc._jsc.sc().getRDDStorageInfo():
        if int(info.id()) in rdd_ids:
            total += int(info.memSize()) + int(info.diskSize())
            seen = True
    return total if seen else None


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
