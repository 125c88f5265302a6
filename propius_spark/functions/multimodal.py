"""Multimodal (image/audio/video) columns as opaque binaries + metadata.

No reference counterpart (the reference is tabular-only); this is the
training-data-pipeline extension: media travel through the engine as
`binary` payload columns with a typed metadata struct, and every
per-item transformation (decode, feature-extract, resize, frame-sample)
is an Arrow-batched `mapInPandas` stage — the payload bytes never pass
through row-at-a-time Python pickling.

Scale notes (100 TB target):
- Payloads stay columnar (parquet binary) end-to-end; `mapInPandas`
  streams an *iterator* of Arrow batches per partition so a partition
  larger than memory still processes in bounded space (never
  `collect()`-s, never builds one giant pandas frame).
- Select media_id/meta-only projections prune the payload column at
  the parquet scan (column pruning — the dominant saving when payloads
  are KB-MB each).
- The actual codec work (PIL/ffmpeg/librosa) is NOT in this container:
  the decode kernels are STUBBED — `decode_media` raises
  NotImplementedError unless `fake=True`, which substitutes a
  deterministic byte-hash "decode" so the Spark-side plumbing (schema,
  batch iteration, partitioning) is fully real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import require_columns

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

try:  # real codecs, absent in this container — plumbing falls back to stubs
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from the documents fixture: the
    utf-8 text bytes stand in for an encoded payload. Exercises the
    exact schema/partitioning a real media lake would have."""
    require_columns(docs, ["doc_id", "text"], "media_from_documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake").alias("format"),
            F.pmod(F.xxhash64("text"), F.lit(64)).cast("int").alias("width"),
            F.pmod(F.xxhash64("text", F.lit(1)), F.lit(64)).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _fake_pixels(payload: bytes, n: int = 16) -> list[int]:
    """Deterministic stand-in for a decoded pixel block: first n bytes
    of sha256(payload) — stable across partitions/runs."""
    return list(hashlib.sha256(payload or b"").digest()[:n])


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payload → (media_id, modality, pixels array<int>).

    STUB: the real codec path needs PIL/ffmpeg (not installed);
    `fake=True` runs the deterministic byte-hash decode through the
    same mapInPandas plumbing.
    """
    require_columns(media, ["media_id", "modality", "payload"], "decode_media")
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "real media decode needs PIL/ffmpeg (not in this container); "
            "pass fake=True for the deterministic test decode"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "pixels": pdf["payload"].map(_fake_pixels),
                }
            )

    return media.select("media_id", "modality", "payload").mapInPandas(
        _decode, out_schema
    )


def extract_features(media: DataFrame, dim: int = 8, fake: bool = False) -> DataFrame:
    """Payload → unit-norm feature vector `array<float>` of length
    `dim`, shaped for the ANN operators (operators/ann.py). STUB math
    (hash-derived), real Arrow-batched plumbing."""
    require_columns(media, ["media_id", "payload"], "extract_features")
    if not fake and not _HAS_PIL:
        raise NotImplementedError(
            "real feature extraction needs a model runtime (not in this "
            "container); pass fake=True for the deterministic test features"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def one(payload: bytes) -> list[float]:
                raw = _fake_pixels(payload, dim)
                norm = sum(v * v for v in raw) ** 0.5 or 1.0
                return [v / norm for v in raw]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "embedding": pdf["payload"].map(one),
                }
            )

    return media.select("media_id", "payload").mapInPandas(_feat, out_schema)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — real resize needs PIL. Declared so the API surface (and
    its schema contract: same MEDIA schema out, meta.width/height
    rewritten) is pinned for when codecs are available."""
    raise NotImplementedError(
        "resize_images needs PIL (not in this container); "
        "schema contract: MEDIA in -> MEDIA out with meta.width/height "
        f"rewritten to ({width}, {height})"
    )


def sample_frames(media: DataFrame, every_n: int) -> DataFrame:
    """STUB — real frame sampling needs ffmpeg. Contract: video rows
    explode to one MEDIA row per sampled frame (modality='image',
    meta.n_frames=1)."""
    raise NotImplementedError(
        "sample_frames needs ffmpeg (not in this container); "
        f"contract: one image row per every_n={every_n}-th frame"
    )
