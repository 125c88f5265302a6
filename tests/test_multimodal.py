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


def test_resize_rewrites_meta_and_payload(media):
    out = resize_images(media, width=6, height=7, fake=True)
    # schema contract: MEDIA in -> MEDIA out
    assert [f.name for f in out.schema] == [f.name for f in MEDIA]
    rows = {r.media_id: r for r in out.collect()}
    src = {r.media_id: r for r in media.collect()}
    assert rows.keys() == src.keys()
    for mid, r in rows.items():
        assert (r.meta.width, r.meta.height) == (6, 7)
        assert r.meta.format == src[mid].meta.format  # non-dim meta preserved
        assert len(r.payload) == 6 * 7
        digest = hashlib.sha256(bytes(src[mid].payload)).digest()
        assert bytes(r.payload) == (digest * 2)[: 6 * 7]  # pinned fake math
    # partition-invariant
    again = {
        r.media_id: bytes(r.payload)
        for r in resize_images(media.repartition(7), 6, 7, fake=True).collect()
    }
    assert again == {m: bytes(r.payload) for m, r in rows.items()}


def test_resize_validates_dims(media):
    with pytest.raises(ValueError):
        resize_images(media, 0, 4, fake=True)
    with pytest.raises(ValueError):
        sample_frames(media, 0, fake=True)


def test_sample_frames_explodes_videos_only(spark, media):
    from pyspark.sql import functions as F

    vids = media.limit(10).select(
        "media_id",
        F.lit("video").alias("modality"),
        "payload",
        F.struct(
            F.col("meta.format").alias("format"),
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            (F.lit(1) + F.pmod("media_id", F.lit(9))).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    mixed = vids.unionByName(media.limit(5))  # image rows must be dropped
    out = sample_frames(mixed, every_n=3, fake=True)
    rows = out.collect()
    src = {r.media_id: r for r in vids.collect()}
    # one row per sampled index: 0, 3, 6, ... < n_frames
    expected = {
        (mid, fi)
        for mid, r in src.items()
        for fi in range(0, r.meta.n_frames, 3)
    }
    assert {(r.media_id, r.frame_idx) for r in rows} == expected
    for r in rows:
        assert r.modality == "image"
        assert r.meta.n_frames == 1
        assert r.meta.width == src[r.media_id].meta.width
        want = hashlib.sha256(
            bytes(src[r.media_id].payload) + b":" + str(r.frame_idx).encode()
        ).digest()
        assert bytes(r.payload) == want


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


def test_fake_pixels_honors_dim_above_digest_size(spark):
    """Round-4 review fix: extract_features(dim=64) must return
    64-element vectors — the bare sha256 slice silently capped at 32."""
    from propius_spark.functions.multimodal import (
        extract_features,
        media_from_documents,
    )

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    emb = extract_features(
        media_from_documents(docs), dim=64, fake=True
    ).collect()
    assert len(emb) == 1 and len(emb[0].embedding) == 64
    # tiling: second 32 elements repeat the digest (pre-normalization
    # ratios preserved)
    v = emb[0].embedding
    assert v[:32] == v[32:]


def test_resize_images_passes_non_image_rows_through(spark):
    """Round-4 review fix: audio/video rows in a mixed media table must
    pass through resize_images byte-identical (payload AND meta) — the
    kernel previously re-encoded every row and stamped image dimensions
    into audio meta."""
    from pyspark.sql import functions as FF

    from propius_spark.functions.multimodal import resize_images

    rows = [
        (1, "image", b"img-bytes", ("png", 10, 10, None, None)),
        (2, "audio", b"pcm-bytes", ("wav", None, None, 44100, None)),
        (3, "video", b"vid-bytes", ("mp4", 64, 64, None, 100)),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, payload binary, "
        "meta struct<format:string,width:int,height:int,"
        "sample_rate:int,n_frames:int>",
    )
    out = {r.media_id: r for r in resize_images(media, 4, 4, fake=True).collect()}
    assert len(out[1].payload) == 16 and out[1].meta.width == 4
    assert bytes(out[2].payload) == b"pcm-bytes"
    assert out[2].meta.sample_rate == 44100 and out[2].meta.width is None
    assert bytes(out[3].payload) == b"vid-bytes"
    assert out[3].meta.width == 64 and out[3].meta.n_frames == 100
