"""Structured Streaming cell maintenance (streaming/cooccurrence.py).

Strategy: land occurrence parquet files in a temp directory in two
waves, run the stream with availableNow triggers, and assert the
memory-sink state equals the batch build_cells answer over the same
rows — the streaming aggregate must be indistinguishable from a batch
recompute (associativity of count).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from propius_spark.operators import build_cells
from propius_spark.streaming import (
    start_cells_query,
    stream_occurrences,
    streaming_cells,
    windowed_event_counts,
)

OCC_ROWS_1 = [(1, 101), (1, 102), (2, 101), (2, 101), (3, 103)]
OCC_ROWS_2 = [(1, 102), (4, 101), (4, 104)]


def _write_occ(spark, rows, path):
    spark.createDataFrame(rows, "reference_id long, item_id long").coalesce(
        1
    ).write.mode("append").parquet(path)


def _sorted_cells(df):
    return sorted(
        (r.item_id, r.ctx_id, r.cnt)
        for r in df.select("item_id", "ctx_id", "cnt").collect()
    )


def test_streaming_cells_matches_batch_incrementally(spark, tmp_path):
    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    _write_occ(spark, OCC_ROWS_1, land)

    cells = streaming_cells(stream_occurrences(spark, land))
    q = start_cells_query(cells, ckpt, query_name="t_cells")
    q.awaitTermination()

    batch1 = build_cells(
        spark.createDataFrame(OCC_ROWS_1, "reference_id long, item_id long")
    )
    assert _sorted_cells(spark.table("t_cells")) == _sorted_cells(batch1)

    # second wave: restart from the checkpoint, counts accumulate
    _write_occ(spark, OCC_ROWS_2, land)
    q2 = start_cells_query(
        streaming_cells(stream_occurrences(spark, land)),
        ckpt,
        query_name="t_cells",
    )
    q2.awaitTermination()

    both = OCC_ROWS_1 + OCC_ROWS_2
    batch2 = build_cells(
        spark.createDataFrame(both, "reference_id long, item_id long")
    )
    assert _sorted_cells(spark.table("t_cells")) == _sorted_cells(batch2)


def test_windowed_event_counts_batch_equivalence(spark, sf_dir):
    """The watermarked streaming plan, run on the bounded events table
    (batch mode accepts the same plan minus the watermark), equals a
    plain window groupBy."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    got = windowed_event_counts(ev, "1 hour", "10 minutes")
    # normalize THROUGH the operator's own path (_ts_micros) — a
    # hand-rolled copy here silently diverged the expected side the
    # day the operator's encoding handling changed
    from propius_spark.operators.sessions import _ts_micros

    ev_ts = ev.withColumn("ts", F.timestamp_micros(_ts_micros(ev, "ts")))
    want = (
        ev_ts.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stream_occurrences_rejects_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError):
        stream_occurrences(spark, str(tmp_path), fmt="avro")


def test_model_refresh_stream_equals_batch_publication(spark, tmp_path):
    """End-to-end stream → published store: after availableNow catch-up
    over two file waves, the foreachBatch-published similar_items
    parquet must equal the batch similar_items_exact over all rows —
    the streaming path is a pure re-trigger of the batch semantics."""
    from propius_spark.operators import similar_items_exact
    from propius_spark.session import clear_materialized
    from propius_spark.streaming import start_model_refresh

    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "model")
    _write_occ(spark, OCC_ROWS_1, land)
    _write_occ(spark, OCC_ROWS_2, land)

    q = start_model_refresh(
        streaming_cells(stream_occurrences(spark, land)),
        out,
        ckpt,
        k_sigma=1.0,
        query_name="t_refresh",
    )
    q.awaitTermination()

    got = sorted(
        (r.item_a_id, r.item_b_id, round(r.scaled_score, 9))
        for r in spark.read.parquet(f"{out}/similar_items").collect()
    )
    batch = build_cells(
        spark.createDataFrame(
            OCC_ROWS_1 + OCC_ROWS_2, "reference_id long, item_id long"
        )
    )
    want = sorted(
        (r.item_a, r.item_b, round(r.scaled_score, 9))
        for r in similar_items_exact(batch, k_sigma=1.0).collect()
    )
    clear_materialized(spark)
    assert got == want and len(got) > 0


def test_streaming_cells_durable_parquet_sink(spark, tmp_path):
    """sink_path mode: the cell state lands as parquet (distributed
    write, nothing on the driver) and equals the batch answer; a second
    wave overwrites with accumulated counts."""
    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "cells")
    _write_occ(spark, OCC_ROWS_1, land)

    q = start_cells_query(
        streaming_cells(stream_occurrences(spark, land)),
        ckpt,
        query_name="t_cells_pq",
        sink_path=out,
    )
    q.awaitTermination()
    batch1 = build_cells(
        spark.createDataFrame(OCC_ROWS_1, "reference_id long, item_id long")
    )
    assert _sorted_cells(spark.read.parquet(out)) == _sorted_cells(batch1)

    _write_occ(spark, OCC_ROWS_2, land)
    q2 = start_cells_query(
        streaming_cells(stream_occurrences(spark, land)),
        ckpt,
        query_name="t_cells_pq",
        sink_path=out,
    )
    q2.awaitTermination()
    both = build_cells(
        spark.createDataFrame(
            OCC_ROWS_1 + OCC_ROWS_2, "reference_id long, item_id long"
        )
    )
    assert _sorted_cells(spark.read.parquet(out)) == _sorted_cells(both)


def test_sessions_durable_parquet_sink(spark, tmp_path):
    """The session log parquet sink captures exactly the closed
    sessions the memory sink would emit."""
    from datetime import datetime, timedelta

    from propius_spark.streaming import sessionize_stream, start_sessions_query

    t0 = datetime(2024, 3, 1)
    rows = [
        (1, t0), (1, t0 + timedelta(minutes=5)),
        (1, t0 + timedelta(minutes=120)),
        (2, t0 + timedelta(minutes=200)),
    ]
    land = str(tmp_path / "ev")
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(land)

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(land)
    out = str(tmp_path / "sessions_log")
    q = start_sessions_query(
        sessionize_stream(stream, gap_minutes=30, watermark="10 minutes"),
        str(tmp_path / "ck"),
        query_name="t_slog",
        sink_path=out,
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    us = lambda m: int(t0.timestamp() * 1_000_000) + m * 60_000_000
    # watermark reaches 190' -> [0,5]x2 and [120] close; [200] stays open
    assert got == [(1, us(0), us(5), 2), (1, us(120), us(120), 1)]


def test_dedup_stream_first_seen_wins(spark, tmp_path):
    """Ingest-time dedup: within the watermark horizon only the first
    arrival of each text survives, across micro-batches; distinct
    texts all pass."""
    from datetime import datetime, timedelta

    from propius_spark.streaming import dedup_stream

    t0 = datetime(2024, 5, 1)
    land = str(tmp_path / "docs")

    def _write(rows):
        spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        ).coalesce(1).write.mode("append").parquet(land)

    _write([
        (1, t0, "alpha"), (2, t0 + timedelta(minutes=1), "beta"),
        (3, t0 + timedelta(minutes=2), "alpha"),      # dup in-batch
    ])
    _write([
        (4, t0 + timedelta(minutes=3), "beta"),       # dup cross-batch
        (5, t0 + timedelta(minutes=4), "gamma"),
    ])

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        dedup_stream(stream, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.doc_id, r.text) for r in spark.table("t_dedup_stream").collect()
    )
    assert got == [(1, "alpha"), (2, "beta"), (5, "gamma")]


def test_dedup_stream_null_text_equals_empty(spark, tmp_path):
    """Family identity: the stream keys on the same content address as
    the batch dedups (sha2 over coalesce(text, '')), so a NULL-text
    doc and an empty-text doc ARE duplicates — first seen wins."""
    from datetime import datetime, timedelta

    from propius_spark.streaming import dedup_stream

    t0 = datetime(2024, 5, 1)
    land = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, t0, None), (2, t0 + timedelta(minutes=1), ""),
         (3, t0 + timedelta(minutes=2), "x")],
        "doc_id long, ts timestamp, text string",
    ).coalesce(1).write.parquet(land)
    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string")
        .parquet(land)
    )
    q = (
        dedup_stream(stream, watermark="30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_nulltext")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.doc_id for r in spark.table("t_dedup_nulltext").collect())
    assert got == [1, 3]  # doc 2 ('' text) deduped against doc 1 (NULL)


def test_sessionize_stream_string_user_ids(spark, tmp_path):
    """The output schema derives the user_id type from the input — a
    hardcoded long crashed the first micro-batch on string ids."""
    from datetime import datetime, timedelta

    from propius_spark.streaming import sessionize_stream

    t0 = datetime(2024, 5, 1)
    land = str(tmp_path / "ev")
    rows = [
        ("alice", t0), ("alice", t0 + timedelta(minutes=5)),
        ("bob", t0 + timedelta(minutes=1)),
        # far-future row pushes the watermark so earlier sessions close
        ("zed", t0 + timedelta(days=2)),
    ]
    spark.createDataFrame(rows, "user_id string, ts timestamp") \
        .coalesce(1).write.parquet(land)
    stream = (
        spark.readStream.schema("user_id string, ts timestamp").parquet(land)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sess_str")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: r.n_events for r in spark.table("t_sess_str").collect()
    }
    assert got == {"alice": 2, "bob": 1}


def test_model_refresh_releases_only_its_own_blocks(spark, tmp_path):
    """The refresh must not evict OTHER pipelines' materialized frames
    in a shared session (clear_materialized there was session-wide;
    localCheckpoint blocks cannot be recomputed)."""
    from propius_spark.plans import materialize
    from propius_spark.session import persistent_rdd_ids
    from propius_spark.streaming import start_model_refresh, streaming_cells

    # a bystander pipeline's materialized frame
    mine = materialize(
        spark.createDataFrame([(1, 2)], "a long, b long")
    )
    before = persistent_rdd_ids(spark)
    assert before  # the bystander is persisted

    land = str(tmp_path / "occ")
    spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)],
        "reference_id long, item_id long",
    ).coalesce(1).write.parquet(land)
    stream = (
        spark.readStream.schema("reference_id long, item_id long")
        .parquet(land)
    )
    q = start_model_refresh(
        streaming_cells(stream),
        out_dir=str(tmp_path / "model"),
        checkpoint_dir=str(tmp_path / "ck"),
        k_sigma=-10.0,
    )
    q.awaitTermination()
    after = persistent_rdd_ids(spark)
    # the refresh's OWN blocks are gone (a no-op release would leave
    # them: after ⊋ before) and the bystander's survive untouched
    assert after == before
    assert mine.count() == 1  # still usable (blocks not evicted)
    mine.unpersist()


def test_streaming_batch_dedup_boundary_identity(spark, tmp_path):
    """Cross-boundary identity the docs promise (r3 verdict item 8):
    'dedup at ingest, re-dedup in batch' agrees because every path
    stands on ONE content address (sha2-256 over coalesce(text, '')).
    A seeded corpus with nulls/empties/duplicates goes through
    (a) dedup_stream over the arrival stream, and
    (b) the batch composition exact_dedup(batch1) + dedup_against(
        batch2, content_keys(batch1)) + exact_dedup(within fresh),
    and the survivor id sets must be identical — arrival order equals
    id order, so streaming first-seen == batch min-id keeper."""
    import random
    from datetime import datetime, timedelta

    from pyspark.sql import functions as FF

    from propius_spark.operators.dedup import (
        content_keys,
        dedup_against,
        exact_dedup,
    )
    from propius_spark.streaming import dedup_stream

    rng = random.Random(0xBEEF)
    pool = ["alpha", "beta", "gamma", "delta", "", None, "alpha ", " beta"]
    t0 = datetime(2024, 5, 1)
    corpus = [
        (i, t0 + timedelta(minutes=i), rng.choice(pool)) for i in range(60)
    ]
    batch1, batch2 = corpus[:30], corpus[30:]
    schema = "doc_id long, ts timestamp, text string"

    # --- streaming path: two arrival files, one micro-batch each
    land = str(tmp_path / "docs")
    for b in (batch1, batch2):
        spark.createDataFrame(b, schema).coalesce(1).sortWithinPartitions(
            "doc_id"
        ).write.mode("append").parquet(land)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        dedup_stream(stream, watermark="10 hours")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_dedup_boundary")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    stream_ids = sorted(
        r.doc_id for r in spark.table("t_dedup_boundary").collect()
    )

    # --- batch path on the SAME corpus
    b1 = spark.createDataFrame(batch1, schema)
    b2 = spark.createDataFrame(batch2, schema)
    keep1 = sorted(r.keeper_id for r in exact_dedup(b1).collect())
    store = content_keys(b1)
    fresh2_ids = dedup_against(b2, store).select("doc_id")
    fresh2 = b2.join(fresh2_ids, "doc_id")
    keep2 = sorted(r.keeper_id for r in exact_dedup(fresh2).collect())

    assert stream_ids == sorted(keep1 + keep2)
    # sanity: the corpus actually exercised dups, nulls, cross-batch hits
    assert len(stream_ids) < len(corpus)
    assert len(keep2) < len(batch2)


def test_sessionize_stream_null_timestamps_do_not_poison_query(spark, tmp_path):
    """Round-4 review fix: a NULL event time reaches the kernel as
    pandas NaN where int(t) raised, failing the micro-batch and (via
    checkpoint replay) the query forever. Null-time events are now
    excluded up front — same contract as batch sessionize."""
    from datetime import datetime, timedelta

    from propius_spark.streaming import sessionize_stream

    t0 = datetime(2024, 5, 1)
    land = str(tmp_path / "ev")
    spark.createDataFrame(
        [
            (1, t0, "a"),
            (1, None, "poison"),
            (1, t0 + timedelta(minutes=5), "b"),
            (1, t0 + timedelta(hours=10), "far-future closes the session"),
        ],
        "user_id long, ts timestamp, note string",
    ).coalesce(1).write.parquet(land)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, note string")
        .parquet(land)
    )
    q = (
        sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("t_null_ts_sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # would raise if the kernel crashed
    rows = spark.table("t_null_ts_sessions").collect()
    # the two real early events form one closed session of 2
    assert any(r.n_events == 2 for r in rows)


def test_model_refresh_releases_blocks_even_when_write_fails(spark, tmp_path):
    """Round-4 review fix: if the trigger's sink write throws, the
    localCheckpoint blocks the pipeline materialized must STILL be
    released (try/finally) — leftover truncated-lineage blocks degrade
    the whole shared session across the checkpoint restart."""
    from propius_spark.session import persistent_rdd_ids
    from propius_spark.streaming import start_model_refresh

    land = str(tmp_path / "landing")
    _write_occ(spark, OCC_ROWS_1, land)

    before = persistent_rdd_ids(spark)
    try:
        q = start_model_refresh(
            streaming_cells(stream_occurrences(spark, land)),
            "nosuchfs://invalid/path",  # sink write must fail
            str(tmp_path / "ck"),
            k_sigma=1.0,
            query_name="t_refresh_fail",
        )
        q.awaitTermination()
        raised = False
    except Exception:
        raised = True
    assert raised  # the sink failure surfaces, not swallowed
    leaked = persistent_rdd_ids(spark) - before
    assert not leaked, f"leaked persisted RDDs after failed write: {leaked}"
