"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we'd set on a real cluster: AQE on
(runtime re-plan + skew-join splitting for the Gram self-join, see
operators/correlation.py), shuffle partitions sized to cores instead of
the 200 default, Arrow on for the few pandas-UDF paths, UTC session TZ
so timestamps hash identically against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def clear_materialized(spark: SparkSession) -> int:
    """Unpersist every persistent RDD (the engine's materialized
    intermediate tables, see operators/correlation.py:_persist).
    Leftover blocks from a finished pipeline degrade later queries in
    the same session (measured 8.8 s → 127 s on an unrelated query at
    sf0.1); call this between logically-separate pipeline runs.
    Returns the number of RDDs released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for rdd in rdds:
        rdd.unpersist()
    # DataFrame-level caches (plans.persist_big) live in the
    # CacheManager, not getPersistentRDDs — clear those too
    spark.catalog.clearCache()
    return len(rdds)


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Snapshot the ids of currently-persisted RDDs — pair with
    `release_materialized_since` to scope a release to one pipeline's
    own intermediates."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keys()}


def release_materialized_since(spark: SparkSession, before: set[int]) -> int:
    """Unpersist only the RDDs materialized AFTER `before` was
    snapshotted (see `persistent_rdd_ids`). The scoped alternative to
    `clear_materialized` for code that runs INSIDE a live session it
    does not own — e.g. a streaming foreachBatch releasing its own
    trigger's intermediates: clearing everything there would evict
    the caller's materialized frames (localCheckpoint blocks have
    truncated lineage — they cannot be recomputed, so eviction is
    data loss, not just a slowdown) and the whole CacheManager.
    Returns the number of RDDs released.

    SINGLE-WRITER ASSUMPTION: the diff against `before` attributes
    every RDD persisted after the snapshot to the caller. If another
    pipeline persists blocks in the same session concurrently (e.g.
    two streaming queries sharing one SparkSession), those blocks fall
    in the diff and get evicted too — the very localCheckpoint data
    loss this function exists to prevent. Persistence is tracked on
    the shared SparkContext (newSession() does not isolate it), so
    concurrent persisting writers must either serialize their
    release windows or track and unpersist their own DataFrame
    handles explicitly instead of using this diff."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for k in list(jmap.keys()):
        if int(k) not in before:
            jmap[k].unpersist()
            released += 1
    return released


def get_spark(app_name: str = "propius_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # partitions default to cores (right for the gate/bench SFs), but
    # scale runs MUST size them to ~100-200 MB of shuffle data instead:
    # the sf10 A/B (SCALE.md §8a) measured corr_pairs 258.8 s at 32
    # partitions (300 MB spilling sorts) vs 100.8 s at 256 (~37 MB,
    # in-memory) — same plan, 2.6× from sizing alone. On a cluster this
    # is the standard shuffle.partitions sizing; locally the env var
    # spares a code edit.
    parts = int(os.environ.get("PROPIUS_SHUFFLE_PARTITIONS", "0")) or cpus
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS); Spark has no
        # nanos timestamp type — read as long (we never consume ts)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # when a checkpoint dir is configured (plans.materialize's
        # durable mode), let the ContextCleaner delete checkpoint files
        # once their RDDs are GC'd — otherwise repeated pipelines
        # accumulate unbounded checkpoint data on durable storage
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        .config("spark.driver.memory", os.environ.get("PROPIUS_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # PROPIUS_CHECKPOINT_DIR flips plans.materialize into durable
    # (reliable checkpoint()) mode without a code edit — point it at
    # fault-tolerant storage (hdfs://, s3a://) on a real cluster so
    # materialized tables survive executor loss; unset, materialize
    # uses executor-local blocks (localCheckpoint), right for
    # single-JVM runs. Configuration, not code, because the choice is
    # a deployment property: the same pipeline is correct either way.
    ckdir = os.environ.get("PROPIUS_CHECKPOINT_DIR")
    if ckdir and spark.sparkContext.getCheckpointDir() is None:
        spark.sparkContext.setCheckpointDir(ckdir)
    return spark
