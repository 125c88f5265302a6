"""Multimodal binary-column plumbing (functions/multimodal.py).

The codecs are stubbed (no PIL/ffmpeg in the container); what IS under
test is the real Spark surface: MEDIA schema, Arrow mapInPandas batch
iteration, determinism across partitionings, and ANN interop of the
extracted features.
"""

from __future__ import annotations

import hashlib

import pytest

from propius_spark.functions import (
    MEDIA,
    decode_media,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)
from propius_spark.operators import cosine_topk


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return media_from_documents(docs.limit(50)).cache()


def test_media_schema(media):
    assert media.schema == MEDIA or [f.name for f in media.schema] == [
        f.name for f in MEDIA
    ]
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.format == "fake"


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(NotImplementedError):
        decode_media(media).collect()
    with pytest.raises(NotImplementedError):
        extract_features(media).collect()
    with pytest.raises(NotImplementedError):
        resize_images(media, 32, 32)
    with pytest.raises(NotImplementedError):
        sample_frames(media, 10)


def test_fake_decode_deterministic_and_partition_invariant(media):
    out1 = {r.media_id: r.pixels for r in decode_media(media, fake=True).collect()}
    out2 = {
        r.media_id: r.pixels
        for r in decode_media(media.repartition(7), fake=True).collect()
    }
    assert out1 == out2
    # pinned math: sha256 prefix of the payload bytes
    row = media.first()
    assert out1[row.media_id] == list(
        hashlib.sha256(bytes(row.payload)).digest()[:16]
    )


def test_features_feed_ann(media):
    emb = extract_features(media, dim=8, fake=True).withColumnRenamed(
        "media_id", "vec_id"
    )
    qid = emb.first().vec_id
    top = cosine_topk(emb, query_id=qid, k=5)
    rows = top.collect()
    assert 0 < len(rows) <= 5
    # unit-norm vectors -> cosine in [-1, 1]
    assert all(-1.000001 <= r.cosine <= 1.000001 for r in rows)
