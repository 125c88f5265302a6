"""Plan-shape regression tests — lock in the physical-plan properties
that make the engine scale (SURVEY.md §4): column pruning and filter
pushdown at the parquet scan, broadcast joins for dimension tables,
single-scan materialization of shared subtrees, and a Python-free
(whole-stage-codegen) parity path. A correctness-preserving change that
silently reintroduces an 8× fact-table re-scan or a Python eval node in
the hot path fails here, not in a 100 TB run.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from propius_spark.operators import build_cells, corr_pairs, publish_model  # noqa: E402
from propius_spark.serving import retrieve_similar_items  # noqa: E402
from propius_spark.sources import occurrences_from_lineitem  # noqa: E402


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


PY_EVAL_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "AggregateInPandas",
)


def test_cells_scan_prunes_columns(spark, sf_dir):
    """The co-occurrence scan must read exactly the 2 key columns of
    the 16-column lineitem table (column pruning reached the parquet
    reader) — anything wider multiplies 100 TB of scan I/O."""
    plan = _plan(build_cells(occurrences_from_lineitem(spark, sf_dir)))
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint>" in plan


def test_corr_pairs_single_source_scan(spark, sf_dir):
    """corr_pairs materializes the cell table before fanning out to its
    four consumers (context count, item stats, both Gram sides): the
    final plan must contain NO parquet re-scans of the event log.
    Before materialization the same action scanned the source 8×."""
    pairs = corr_pairs(build_cells(occurrences_from_lineitem(spark, sf_dir)))
    assert "Scan parquet" not in _plan(pairs)


def test_serving_pushdown_and_broadcast(spark, sf_dir):
    """Serving retrieval: the dim-table filter reaches the parquet scan
    (PushedFilters) and the fact⋈dim name join is a broadcast hash join
    — never a shuffle of the big side against a small dimension."""
    dim = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("key"),
        F.lit(None).cast("string").alias("human_label"),
    )
    sims = corr_pairs(build_cells(occurrences_from_lineitem(spark, sf_dir))).select(
        F.col("item_a").alias("item_a_id"),
        F.col("item_b").alias("item_b_id"),
        F.col("corr").alias("scaled_score"),
    )
    plan = _plan(retrieve_similar_items(sims, dim, item_id=1, limit=5))
    # the pushed predicate must mention the id column INSIDE the
    # PushedFilters list — "p_partkey somewhere in the plan" was
    # vacuously true via the scan's ReadSchema line
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln]
    assert any("p_partkey" in ln for ln in pushed), pushed
    assert "BroadcastHashJoin" in plan
    # distributed top-k, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_published_lookup_partition_prunes(spark, sf_dir, tmp_path):
    """Bucketed publication (publish_model(n_buckets=n)) is the Spark
    analogue of the reference's B-tree index on (item_a_id, item_b_id):
    a serving point lookup with the bucket predicate must prune the
    scan to one hive partition (PartitionFilters on `bucket`), and the
    pruned result must equal the unbucketed path exactly."""
    occ = occurrences_from_lineitem(spark, sf_dir)
    dim_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("title")
    )
    paths = publish_model(occ, dim_src, str(tmp_path / "model"), n_buckets=8)
    sims = spark.read.parquet(paths["similar_items"])
    dim = spark.read.parquet(paths["correlated_items"])
    item = int(sims.select("item_a_id").first()[0])

    pruned = retrieve_similar_items(sims, dim, item, limit=5, n_buckets=8)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1].splitlines()[0]

    flat = retrieve_similar_items(sims.drop("bucket"), dim, item, limit=5)
    assert [tuple(r) for r in pruned.collect()] == [tuple(r) for r in flat.collect()]


def test_parity_paths_are_python_free(spark, sf_dir):
    """Every reference-parity query plans without a Python eval node —
    the whole path stays JVM-side in Tungsten codegen (SURVEY.md §2.10:
    zero UDFs needed for parity). Arrow/pandas nodes are expected ONLY
    in the explicitly-vectorized extension ops (ANN BLAS kernel,
    multimodal decode)."""
    parity = [
        "corr_pairs_parts",
        "corr_pairs_cross_set",
        "similar_candidates_events",
        "similar_one_part",
        "similar_exact_parts",
        "similar_topk_per_item",
        "retrieve_topk_part",
        "retrieve_topk_batch",
        "publish_retrieve",
        "item_info",
        "search_items",
        "db_stats",
        "dedup_exact",
        "dedup_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_clusters",
        "text_doc_stats",
        "ann_cosine_topk",
        "sessionize_events",
        "model_roundtrip",
    ]
    qs = entrymod.queries()
    offending = {}
    for name in parity:
        plan = _plan(qs[name](spark, sf_dir))
        hits = [n for n in PY_EVAL_NODES if n in plan]
        if hits:
            offending[name] = hits
    assert not offending, f"Python eval nodes in parity plans: {offending}"


def test_parity_path_has_codegen(spark, sf_dir):
    """The Pearson pipeline executes inside whole-stage codegen spans
    (Tungsten), not interpreted expressions. AQE only finalizes (and
    annotates) the physical plan during execution, so run the query
    first and inspect the executed plan."""
    pairs = corr_pairs(build_cells(occurrences_from_lineitem(spark, sf_dir)))
    pairs.collect()  # finalize this DataFrame's own AQE plan
    executed = pairs._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    # codegen stages print as "*(id) Operator" in the simple plan string
    assert "*(" in executed


def test_materialize_durable_checkpoint_mode(spark, tmp_path):
    """materialize() picks reliable checkpoint() when a checkpoint dir
    is configured (the cluster/executor-loss story) and
    localCheckpoint() otherwise — identical results either way."""
    import os

    from propius_spark.plans import materialize

    df = spark.range(100).withColumn("v", F.col("id") * 2)
    want = sorted((r.id, r.v) for r in df.collect())

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    local = materialize(df)
    assert sorted((r.id, r.v) for r in local.collect()) == want
    assert not local.isStreaming

    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        durable = materialize(df)
        assert sorted((r.id, r.v) for r in durable.collect()) == want
        # reliable checkpoints write real files under the dir
        found = [
            os.path.join(d, f)
            for d, _, fs in os.walk(ckdir)
            for f in fs
        ]
        assert found, "no reliable checkpoint files written"
    finally:
        # reset to executor-local mode so later tests are unaffected
        jsc = sc._jsc.sc()
        getattr(jsc, "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert sc.getCheckpointDir() is None


def test_materialize_compacts_overpartitioned_checkpoints(spark, monkeypatch):
    """SCALE.md §8a finding 4: a table checkpointed in many more blocks
    than its bytes warrant gets ONE narrow compaction pass — same rows,
    coarse blocks, fine-grained blocks released. A right-sized input
    (≤ 2× the defaultParallelism floor) must stay untouched, and
    PROPIUS_CHECKPOINT_BLOCK_MB=0 must disable compaction entirely."""
    from propius_spark.plans import materialize

    sc = spark.sparkContext
    cores = sc.defaultParallelism
    wide = 4 * cores + 1  # > the 2× engage margin over the floor
    df = spark.range(1000).withColumn("v", F.col("id") * 3).repartition(wide)
    want = sorted((r.id, r.v) for r in df.collect())

    def persistent_count():
        return len(sc._jsc.getPersistentRDDs())

    base = persistent_count()
    out = materialize(df)
    assert sorted((r.id, r.v) for r in out.collect()) == want
    # compacted to the defaultParallelism floor (a 1000-row table is
    # far under one 128 MB block; the floor keeps per-core blocks)
    assert out.rdd.getNumPartitions() == cores
    # exactly one new persistent RDD survives: the compact checkpoint;
    # the wide intermediate's blocks were released
    assert persistent_count() == base + 1

    # right-sized input: no compaction pass, partitioning preserved
    ok = materialize(spark.range(1000).repartition(cores))
    assert ok.rdd.getNumPartitions() == cores

    # call-site consumer-shape override: immediately-shuffled tables
    # (the cells posture) must never pay the compaction pass
    no_compact = materialize(df, compact=False)
    assert no_compact.rdd.getNumPartitions() == wide
    assert sorted((r.id, r.v) for r in no_compact.collect()) == want

    # kill switch
    monkeypatch.setenv("PROPIUS_CHECKPOINT_BLOCK_MB", "0")
    off = materialize(df)
    assert off.rdd.getNumPartitions() == wide
    assert sorted((r.id, r.v) for r in off.collect()) == want
    spark.catalog.clearCache()
    from propius_spark.session import clear_materialized

    clear_materialized(spark)


def test_checkpoint_dir_env_knob(spark, tmp_path, monkeypatch):
    """PROPIUS_CHECKPOINT_DIR flips the session into durable-checkpoint
    mode (plans.materialize then uses reliable checkpoint() sized from
    the files) without a code edit — and never overrides a dir the
    caller already configured."""
    from propius_spark.session import get_spark

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    monkeypatch.setenv("PROPIUS_CHECKPOINT_DIR", str(tmp_path / "durable"))
    try:
        s2 = get_spark("knob_check")
        got = s2.sparkContext.getCheckpointDir()
        assert got is not None and "durable" in got

        # an explicitly-set dir wins over the env knob
        monkeypatch.setenv(
            "PROPIUS_CHECKPOINT_DIR", str(tmp_path / "other")
        )
        assert "durable" in get_spark("knob_check").sparkContext.getCheckpointDir()
    finally:
        jsc = sc._jsc.sc()
        getattr(jsc, "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert sc.getCheckpointDir() is None


def test_materialize_compaction_durable_mode_matches_local(spark, tmp_path):
    """Round-7 gap (VERDICT r7 'What's wrong' #2): in reliable-
    checkpoint mode the persist wrapper releases before sizing, so
    `_stored_bytes` saw no blocks and compaction silently disengaged
    on exactly the clusters durable checkpointing exists for. Sizing
    now comes from the checkpoint FILES (Hadoop FS): the engage/skip
    decision on a given frame must MATCH localCheckpoint mode — wide
    frame compacts to the defaultParallelism floor, right-sized frame
    is left alone — and the observability counters must move the same
    way (plus no_block_info staying flat once sizing works)."""
    from propius_spark import plans
    from propius_spark.plans import materialize

    sc = spark.sparkContext
    cores = sc.defaultParallelism
    wide = 4 * cores + 1
    df = spark.range(1000).withColumn("v", F.col("id") * 3).repartition(wide)
    want = sorted((r.id, r.v) for r in df.collect())

    # local mode decisions (the reference behavior)
    assert sc.getCheckpointDir() is None
    local_wide = materialize(df).rdd.getNumPartitions()
    local_ok = materialize(
        spark.range(1000).repartition(cores)
    ).rdd.getNumPartitions()
    assert (local_wide, local_ok) == (cores, cores)

    # drop the local-mode checkpoints' blocks so the durable-mode
    # no-blocks assertion below sees only what durable mode left
    from propius_spark.session import clear_materialized

    clear_materialized(spark)

    sc.setCheckpointDir(str(tmp_path / "ck"))
    try:
        base = dict(plans.compaction_stats)
        out = materialize(df)
        assert out.rdd.getNumPartitions() == local_wide  # engaged
        assert sorted((r.id, r.v) for r in out.collect()) == want
        assert plans.compaction_stats["engaged"] == base["engaged"] + 1

        ok = materialize(spark.range(1000).repartition(cores))
        assert ok.rdd.getNumPartitions() == local_ok  # skipped, not mute
        assert plans.compaction_stats["skipped"] == base["skipped"] + 1
        assert (
            plans.compaction_stats["no_block_info"] == base["no_block_info"]
        )

        # durable mode leaves no persist-wrapper blocks behind either way
        assert not sc._jsc.getPersistentRDDs()
    finally:
        jsc = sc._jsc.sc()
        getattr(jsc, "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert sc.getCheckpointDir() is None
    spark.catalog.clearCache()
    clear_materialized(spark)


def test_new_text_ops_plan_shape(spark, sf_dir):
    """Round-2 text/mixing ops keep their scale posture: decontaminate
    broadcasts the benchmark side (no corpus-side shuffle join);
    cap_per_group and props_rollup are Python-free single-exchange
    plans with column-pruned scans; none plans a cartesian product."""
    from propius_spark.operators import (
        cap_per_group,
        decontaminate,
        props_rollup,
    )
    from propius_spark.sources import read_events

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source", "n_chars"
    )

    dec = _plan(decontaminate(docs, docs.filter(F.col("doc_id") < 20), k=3))
    assert "BroadcastHashJoin" in dec or "BroadcastExchange" in dec
    assert "CartesianProduct" not in dec
    assert not [n for n in PY_EVAL_NODES if n in dec]

    import re

    def _n_shuffles(plan):
        # formatted mode prints shuffle nodes as "Exchange (n)" /
        # "(n) Exchange". \bExchange\b already cannot match inside
        # "BroadcastExchange" (no word boundary at "tE"), so
        # subtracting its count here DOUBLE-counted the correction and
        # understated real shuffles whenever a broadcast was present
        return len(re.findall(r"\bExchange\b", plan))

    cap = _plan(
        cap_per_group(
            docs.select("doc_id", "source", "n_chars"),
            "source", 5, "n_chars", tiebreak_col="doc_id",
        )
    )
    assert _n_shuffles(cap) == 2  # node appears in tree + detail section
    assert "text" not in cap.split("ReadSchema", 1)[1].splitlines()[0]
    assert not [n for n in PY_EVAL_NODES if n in cap]

    pr = _plan(props_rollup(read_events(spark, sf_dir), field="k"))
    assert _n_shuffles(pr) == 2
    assert not [n for n in PY_EVAL_NODES if n in pr]


def test_rank_gap_window_exchange_reuse(spark, sf_dir):
    """_rank_gap_extremes (round 6 shape): BOTH first-free-rank sides
    ride ONE taken-set exchange — two Window nodes (asc and desc
    row_numbers) separated only by an in-partition Sort, the
    first-free-rank HashAggregate DIRECTLY above the top one, and no
    Exchange anywhere between the taken-set shuffle and the aggregate.
    The ranked item dimension is materialized once (no third Window;
    the rb/self/tmap consumers read the persisted table instead of
    re-sorting items). A regression to the round-3 explode-two-sides
    form (side-tagged row doubling) or a lost exchange reuse (second
    shuffle between the windows or before the aggregate) fails here."""
    import re

    from propius_spark.operators.correlation import (
        _persist,
        _rank_gap_extremes,
        gram,
        valid_item_stats,
    )

    cells = _persist(build_cells(occurrences_from_lineitem(spark, sf_dir)))
    stats = _persist(valid_item_stats(cells))
    g = _persist(gram(cells, stats, None))
    plan = _plan(_rank_gap_extremes(stats, g))

    assert len(re.findall(r"^\(\d+\) Window$", plan, re.M)) == 2
    tree = plan.split("\n\n")[0].splitlines()
    widx = [i for i, ln in enumerate(tree) if re.search(r"Window \(\d+\)", ln)]
    assert len(widx) == 2
    above = "".join(tree[max(0, widx[0] - 2): widx[0]])
    assert "HashAggregate" in above and "Exchange" not in above
    between = "".join(tree[widx[0] + 1 : widx[1]])
    assert "Sort" in between and "Exchange" not in between
    # the taken-set explosion must not return: no Generate (explode)
    # node anywhere in the rank-gap plan
    assert "Generate" not in plan


def test_bucketed_dup_pairs_plan_shape(spark, sf_dir):
    """Candidate-fed embedding near-dup (round-3 sub-split form): ONE
    Arrow kernel (FlatMapGroupsInPandas), the sub-block expansion is a
    map-side Generate below the group shuffle (replication costs no
    extra shuffle), and the plan carries a bounded shuffle set — the
    vid join pair, candidate dedup + bucket sizes, the kernel's group
    shuffle, and the result dedup. A change that reintroduces
    per-bucket single-task matmuls or a second kernel fails here."""
    import re

    from propius_spark.operators import assign_centroids, embedding_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    _, asg = assign_centroids(emb, n_centroids=4)
    plan = _plan(embedding_dup_pairs(emb, threshold=0.4, candidates=asg))

    assert len(re.findall(r"^\(\d+\) FlatMapGroupsInPandas$", plan, re.M)) == 1
    assert len(re.findall(r"^\(\d+\) Generate$", plan, re.M)) == 1
    tree = plan.split("\n\n")[0]
    fm = tree.index("FlatMapGroupsInPandas")
    gen = tree.index("Generate")
    assert gen > fm  # Generate sits BELOW the kernel in the tree
    n_shuffles = len(re.findall(r"^\(\d+\) Exchange$", plan, re.M))
    assert n_shuffles <= 5, plan


def test_lsh_buckets_map_side(spark, sf_dir):
    """hyperplane_lsh_buckets is pure map work: plane literals in the
    plan, no Exchange, no Python eval nodes, and the embeddings scan
    reads only (vec_id, embedding). The candidate generator must stay
    free at 100 TB — the only shuffle in the composed near-dup path
    belongs to the bucket join downstream."""
    from propius_spark.operators import hyperplane_lsh_buckets

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = _plan(hyperplane_lsh_buckets(emb, n_planes=8, n_bands=2, dim=64))
    assert "Exchange" not in plan
    for node in PY_EVAL_NODES:
        assert node not in plan
    assert "ReadSchema: struct<vec_id:bigint,embedding:array<float>>" in plan


def test_pipeline_prepare_two_scans_no_text_shuffle(spark, sf_dir):
    """The composed prepare pipeline's plan contract: exactly two
    corpus scans (stats fused into one, chunking in the other — the
    kept-id list is materialized, so the filter subtree can't
    replicate per consumer), and the only exchanges belong to the
    32-byte content-key dedup (no `text` column in any Exchange
    block)."""
    import re

    plan = _plan(entrymod.q_pipeline_prepare(spark, sf_dir))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2
    for block in plan.split("\n\n"):
        if block.lstrip().startswith("(") and "Exchange" in block.split("\n")[0]:
            assert not re.search(r"\btext#", block), block[:300]


def test_batch_retrieval_partition_prunes(spark, sf_dir, tmp_path):
    """retrieve_similar_batch with a bucketed store: the IN-list's
    bucket SET prunes partitions exactly like the single-item path —
    3 requested items spanning 2 of 8 buckets must scan only those 2
    bucket directories."""
    from propius_spark.serving import retrieve_similar_batch

    occ = occurrences_from_lineitem(spark, sf_dir)
    dim_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("title")
    )
    paths = publish_model(occ, dim_src, str(tmp_path / "m"), n_buckets=8)
    sims = spark.read.parquet(paths["similar_items"])
    dim = spark.read.parquet(paths["correlated_items"])
    # items 1, 9, 2 → buckets {1, 2}
    plan = _plan(
        retrieve_similar_batch(sims, dim, [1, 9, 2], k=3, n_buckets=8)
    )
    import re

    m = re.search(r"PartitionFilters: \[bucket#\d+ IN \(([\d,]+)\)\]", plan)
    assert m, plan[:600]
    assert set(m.group(1).split(",")) == {"1", "2"}
    # and the item IN-list reaches the scan too
    assert re.search(r"PushedFilters: \[In\(item_a_id", plan)
