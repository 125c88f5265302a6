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
  every kernel (`decode_media`, `extract_features`, `resize_images`,
  `sample_frames`) raises NotImplementedError unless `fake=True`,
  which substitutes a deterministic byte-hash kernel so the Spark-side
  plumbing (schema, batch iteration, partitioning, per-video frame
  fan-out) is fully real and testable — including by the driver's
  SQL oracle, since the fake kernels are sha256 arithmetic an oracle
  can replay byte-for-byte.
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

def _require_fake(fn: str, needs: str, fake: bool) -> None:
    """No REAL kernel exists yet for any media op — `fake=True` is the
    only executable path. The gate raises unconditionally on
    fake=False (rather than probing for PIL/ffmpeg): a probe that
    falls through to the fake kernel would silently label digest bytes
    as real decode output the moment the codec library happens to be
    importable."""
    if not fake:
        raise NotImplementedError(
            f"{fn}: real kernel not implemented ({needs} not in this "
            "container); pass fake=True for the deterministic test kernel"
        )


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
    """Deterministic stand-in for a decoded pixel block: sha256 of the
    payload TILED to exactly n bytes (same scheme as _fake_resized) —
    stable across partitions/runs, and honors the length contract for
    n > 32 too (a bare digest slice silently capped feature vectors at
    32 elements)."""
    digest = hashlib.sha256(payload or b"").digest()
    reps = -(-n // len(digest))
    return list((digest * reps)[:n])


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payload → (media_id, modality, pixels array<int>).

    STUB: the real codec path needs PIL/ffmpeg (not installed);
    `fake=True` runs the deterministic byte-hash decode through the
    same mapInPandas plumbing.
    """
    require_columns(media, ["media_id", "modality", "payload"], "decode_media")
    _require_fake("decode_media", "PIL/ffmpeg", fake)

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
    _require_fake("extract_features", "a model runtime", fake)

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


def _fake_resized(payload: bytes, n: int) -> bytes:
    """Deterministic stand-in for a re-encoded (width×height) image:
    sha256(payload) tiled to exactly n bytes — stable across
    partitions/runs and byte-reconstructable by a SQL oracle
    (digest ‖ digest ‖ … truncated)."""
    digest = hashlib.sha256(payload or b"").digest()
    reps = -(-n // len(digest))
    return (digest * reps)[:n]


def resize_images(
    media: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Re-encode every IMAGE payload at (width, height): MEDIA in →
    MEDIA out with meta.width/height rewritten and the payload
    replaced by the resized encoding; non-image rows (audio/video in a
    mixed media table) pass through byte-identical.

    STUB KERNEL: the real resample needs PIL (not in this container);
    `fake=True` substitutes the deterministic tiled-digest encoding
    (one byte per pixel) through the same plumbing. Scale shape: meta
    fields travel as flat columns through the Arrow batches (no
    struct↔dict conversion per row) and the struct is rebuilt JVM-side;
    the kernel touches only the payload column.
    """
    require_columns(media, ["media_id", "modality", "payload", "meta"], "resize_images")
    if width < 1 or height < 1:
        raise ValueError(f"resize_images: width/height must be >= 1, got ({width}, {height})")
    _require_fake("resize_images", "PIL", fake)

    n = width * height
    flat = media.select(
        "media_id",
        "modality",
        "payload",
        F.col("meta.format").alias("_fmt"),
        F.col("meta.width").alias("_w"),
        F.col("meta.height").alias("_h"),
        F.col("meta.sample_rate").alias("_sr"),
        F.col("meta.n_frames").alias("_nf"),
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("_fmt", T.StringType()),
            T.StructField("_w", T.IntegerType()),
            T.StructField("_h", T.IntegerType()),
            T.StructField("_sr", T.IntegerType()),
            T.StructField("_nf", T.IntegerType()),
        ]
    )

    # modality-aware: only image rows are resized; audio/video rows in
    # a mixed MEDIA table pass through untouched (payload AND meta) —
    # blindly re-encoding every row would silently replace an audio
    # payload with a width×height blob and stamp image dimensions into
    # its meta while modality still said 'audio' (a real PIL kernel
    # would crash there; the fake one must not corrupt instead)
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            is_img = pdf["modality"] == "image"
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(
                lambda p: _fake_resized(p, n)
            )
            yield pdf

    is_image = F.col("modality") == "image"
    return flat.mapInPandas(_resize, out_schema).select(
        "media_id",
        "modality",
        "payload",
        F.struct(
            F.col("_fmt").alias("format"),
            F.when(is_image, F.lit(width).cast("int"))
            .otherwise(F.col("_w"))
            .alias("width"),
            F.when(is_image, F.lit(height).cast("int"))
            .otherwise(F.col("_h"))
            .alias("height"),
            F.col("_sr").alias("sample_rate"),
            F.col("_nf").alias("n_frames"),
        ).alias("meta"),
    )


def sample_frames(media: DataFrame, every_n: int, fake: bool = False) -> DataFrame:
    """Explode video rows into one image MEDIA row per every_n-th frame
    (frame indices 0, every_n, 2·every_n, … < meta.n_frames), plus a
    `frame_idx` column. Non-video rows are dropped; sampled frames come
    out modality='image', meta.n_frames=1.

    STUB KERNEL: real frame extraction needs ffmpeg; `fake=True`
    substitutes a deterministic per-frame digest payload
    (sha256(payload ‖ ':' ‖ frame_idx)). Scale shape: the sampled
    frame indices are computed JVM-side as ONE array column per video
    and the row explosion happens inside the kernel — each video
    payload (the dominant bytes: MBs per row) crosses the Arrow
    boundary exactly once, not once per sampled frame; only the
    KB-sized decoded frames multiply. Videos with n_frames < 1 (empty
    or corrupt) simply produce no frames instead of erroring the job.
    """
    require_columns(media, ["media_id", "modality", "payload", "meta"], "sample_frames")
    if every_n < 1:
        raise ValueError(f"sample_frames: every_n must be >= 1, got {every_n}")
    _require_fake("sample_frames", "ffmpeg", fake)

    videos = media.filter(
        (F.col("modality") == "video") & (F.col("meta.n_frames") >= 1)
    ).select(
        "media_id",
        "payload",
        F.col("meta.format").alias("_fmt"),
        F.col("meta.width").alias("_w"),
        F.col("meta.height").alias("_h"),
        F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        .cast("array<int>")
        .alias("_idxs"),
    )
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("_fmt", T.StringType()),
            T.StructField("_w", T.IntegerType()),
            T.StructField("_h", T.IntegerType()),
        ]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "frame_idx": [], "payload": [],
                "_fmt": [], "_w": [], "_h": [],
            }
            for mid, p, fmt, w, h, idxs in zip(
                pdf["media_id"], pdf["payload"], pdf["_fmt"],
                pdf["_w"], pdf["_h"], pdf["_idxs"],
            ):
                raw = p or b""
                for i in idxs:
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(int(i))
                    rows["payload"].append(
                        hashlib.sha256(raw + b":" + str(int(i)).encode()).digest()
                    )
                    rows["_fmt"].append(fmt)
                    rows["_w"].append(w)
                    rows["_h"].append(h)
            yield pd.DataFrame(rows)

    return videos.mapInPandas(_extract, out_schema).select(
        "media_id",
        "frame_idx",
        F.lit("image").alias("modality"),
        "payload",
        F.struct(
            F.col("_fmt").alias("format"),
            F.col("_w").alias("width"),
            F.col("_h").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
