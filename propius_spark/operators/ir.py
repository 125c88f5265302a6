"""Information-retrieval operators: TF-IDF weighting and the inverted
index — the retrieval-side companions to the dedup/ANN family (sparse
lexical retrieval next to dense embedding retrieval).

Shuffle inventory: term frequencies are one (doc, token) shuffle with
map-side combine; document frequencies reduce the SAME aggregate by
token (token-key shuffle over doc-token cardinality, not the token
stream); the corpus size N is a 1-row broadcast. Nothing touches the
raw corpus twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..schemas import require_columns


def _doc_token_counts(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tf_idf(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classic TF-IDF: (doc_id, token, tf, df, tfidf) with
    tfidf = tf · ln(N / df), N = corpus document count (all docs,
    including empty ones), df = documents containing the token.
    Tokens below ``min_df`` are dropped (rare-token noise floor).
    tfidf is rounded to 6 dp so cross-engine ln() ulp drift cannot
    leak into comparisons.
    """
    require_columns(docs, [id_col, text_col], "tf_idf")
    tfs = _doc_token_counts(docs, id_col, text_col)
    dfs = tfs.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfs = dfs.filter(F.col("df") >= min_df)
    n_docs = docs.select(F.count(F.lit(1)).alias("__n"))
    return (
        tfs.join(dfs, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )


def posting_lists(
    docs: DataFrame,
    min_df: int = 1,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Inverted index: (token, df, postings) with postings = the
    sorted doc-id array containing the token. ``min_df``/``max_df``
    bound the posting-list sizes (max_df drops stopword-grade tokens —
    the hot keys whose lists would otherwise hold most of the corpus;
    at scale, store high-df lists as bitmap/roaring segments instead).
    One doc-token shuffle + one token-key collect.
    """
    require_columns(docs, [id_col, text_col], "posting_lists")
    per = _doc_token_counts(docs, id_col, text_col).select("doc_id", "token")
    out = per.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("postings"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    if max_df is not None:
        out = out.filter(F.col("df") <= max_df)
    return out
