"""Scalar/column function library (beyond-reference capability).

The reference exposes no scalar-function surface (SURVEY.md §2.8);
this package adds the text-analysis primitives a large-scale
training-data pipeline needs, all as built-in Catalyst column
expressions — zero Python UDFs on the hot path.
"""

from .multimodal import (
    MEDIA,
    MEDIA_META,
    decode_media,
    extract_features,
    media_from_documents,
    resize_images,
    sample_frames,
)
from .text import (
    LANG_STOPWORDS,
    cp_classes,
    fingerprint,
    lang_scores,
    lang_id,
    quality_score,
    subword_count_from_classes,
    subword_token_count,
    subword_tokens,
    text_codes,
    token_count,
    token_count_cp,
    token_count_from_classes,
    tokens,
)

__all__ = [
    "MEDIA",
    "MEDIA_META",
    "media_from_documents",
    "decode_media",
    "extract_features",
    "resize_images",
    "sample_frames",
    "LANG_STOPWORDS",
    "tokens",
    "token_count",
    "token_count_cp",
    "token_count_from_classes",
    "subword_count_from_classes",
    "cp_classes",
    "text_codes",
    "lang_scores",
    "lang_id",
    "quality_score",
    "fingerprint",
    "subword_tokens",
    "subword_token_count",
]
