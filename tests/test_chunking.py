"""Chunking and packing (operators/chunking.py) on hand-computed
fixtures plus a python-reference property test."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from propius_spark.operators import chunk_documents, pack_documents


def test_chunk_documents_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(docs, chunk_tokens=3, overlap=1).collect()
    )
    # stride 2: doc 1 → [a b c][c d e]; the tail start at 4 covers only
    # "e", already inside [c d e]'s overlap — dropped, not duplicated;
    # doc 2 → [x]; doc 3 → none
    assert got == [
        (1, 0, "a b c", 3),
        (1, 1, "c d e", 3),
        (2, 0, "x", 1),
    ]


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_pack_documents_hand_computed(spark):
    # one shard → pure sequential packing by doc_id
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(0, 3), (1, 3), (2, 2), (3, 5), (4, 1)]],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.shard, r.bin_id)
        for r in pack_documents(docs, target_tokens=5, n_shards=1).collect()
    )
    # prefix-before: 0,3,6,8,13 → div 5 → bins 0,0,1,1,2
    assert got == [(0, 0, 0), (1, 0, 0), (2, 0, 1), (3, 0, 1), (4, 0, 2)]


chunk_docs = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 20)),
    min_size=1, max_size=12, unique_by=lambda r: r[0],
)


@given(docs=chunk_docs, c=st.integers(2, 6), ov=st.integers(0, 1))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_chunking_matches_python_reference(spark, docs, c, ov):
    sdocs = spark.createDataFrame(
        [(i, " ".join([f"t{j}" for j in range(n)])) for i, n in docs],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in chunk_documents(sdocs, chunk_tokens=c, overlap=ov).collect()
    )
    stride = c - ov
    want = []
    for i, n in docs:
        ws = [f"t{j}" for j in range(n)]
        starts = [s for s in range(0, n, stride) if s == 0 or s < n - ov]
        for ci, s in enumerate(starts):
            want.append((i, ci, " ".join(ws[s:s + c])))
    assert got == sorted(want)

    # reconstruction: with zero overlap the chunks concatenate back to
    # the original token stream
    if ov == 0:
        by_doc = {}
        for i, ci, txt in got:
            by_doc.setdefault(i, []).append((ci, txt))
        for i, n in docs:
            if n:
                joined = " ".join(
                    t for _, t in sorted(by_doc[i])
                )
                assert joined == " ".join(f"t{j}" for j in range(n))


def test_pack_documents_bins_bounded(spark):
    """Every bin's token total stays below target + its last doc (the
    greedy overflow bound) and bins within a shard are contiguous."""
    import numpy as np

    rng = np.random.default_rng(3)
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * int(rng.integers(1, 40)))) for i in range(60)],
        "doc_id long, text string",
    )
    rows = pack_documents(docs, target_tokens=64, n_shards=4).collect()
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r.shard, r.bin_id), []).append(r.n_tokens)
    for (s, b), toks in by_bin.items():
        assert sum(toks) - toks[-1] < 64 + max(toks)
    # shard is doc_id mod 4
    assert all(r.shard == r.doc_id % 4 for r in rows)


def test_chunk_tail_inside_overlap_not_emitted(spark):
    """A trailing start fully inside the previous chunk's overlap
    region duplicates content verbatim — it must not be emitted."""
    from propius_spark.operators import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r.chunk_id, r.chunk_text)
        for r in chunk_documents(docs, chunk_tokens=8, overlap=4).collect()
    )
    # starts 0, 4 — start 8 covers tokens 8-9, both inside chunk 1
    assert [c for c, _ in rows] == [0, 1]
    assert rows[1][1].split() == [f"w{i}" for i in range(4, 10)]
    # a tail that DOES add new tokens is kept: 13 tokens -> starts 0,4,8
    text13 = " ".join(f"w{i}" for i in range(13))
    docs13 = spark.createDataFrame([(1, text13)], "doc_id long, text string")
    ids = sorted(
        r.chunk_id
        for r in chunk_documents(docs13, chunk_tokens=8, overlap=4).collect()
    )
    assert ids == [0, 1, 2]


def test_pack_documents_validates(spark):
    import pytest

    from propius_spark.operators import pack_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        pack_documents(docs, target_tokens=0)
    with pytest.raises(ValueError):
        pack_documents(docs, n_shards=0)
    sdocs = spark.createDataFrame([("x", "a b")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integer column"):
        pack_documents(sdocs)
