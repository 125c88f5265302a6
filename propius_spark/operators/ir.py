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

    Caching note: the internal term-frequency table is disk-cached
    (persist_big) for the session so its two consumers share one
    tokenization pass; call
    ``propius_spark.session.clear_materialized(spark)`` between
    unrelated pipelines to release it (same lifecycle as the dedup
    shingle tables).
    """
    require_columns(docs, [id_col, text_col], "tf_idf")
    from ..plans import persist_big

    # persist_big: tfs feeds BOTH the df aggregate and the scoring
    # join — uncached, the tokenize+count subtree replays per consumer
    # (plan-audited: 2 corpus tokenization passes), breaking this
    # module's one-scan contract. Narrow (doc, token, tf) rows on
    # DISK_ONLY.
    tfs = persist_big(_doc_token_counts(docs, id_col, text_col))
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


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lexical top-k search: rank documents against a free-text query
    with BM25 (Robertson idf with the +1 floor, so common terms never
    score negative): (doc_id, score), score desc, doc_id asc ties.

    score(d) = Σ_{t ∈ q} ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
                · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))

    Plan (round 3 — ONE corpus scan, ZERO corpus shuffles): a single
    pass computes per-doc (dl, tf of each query token) with map-side
    array expressions — the query's token set is tiny, so per-token
    occurrence counts are m cheap array scans per row, not an
    explode + (doc, token) shuffle. That doc-cardinality table (no
    text) is materialized once and feeds N/avgdl, per-token df, and
    the scoring join; the final top-k is a TakeOrderedAndProject.
    Scores are rounded to 6 dp (cross-engine ln ulp drift). The
    earlier form re-tokenized the corpus three times (tf, dl, stats
    branches) despite this module's one-scan contract.
    """
    import re as _re

    from ..functions.text import WS_CHARS
    from ..plans import persist_big

    require_columns(docs, [id_col, text_col], "bm25_search")
    # query tokenization MUST mirror the engine-side tokens(): split on
    # the shared explicit whitespace class, not Python str.split()
    # (which also splits on U+3000/NBSP/…, so a query pasted verbatim
    # from a document containing such a character would produce tokens
    # that can never match that document's own tokens), and ASCII-only
    # case folding (tokens() uses ascii_lower — Python str.lower()
    # would diverge on the same İ/ẞ/ς-class code points full lower()
    # does). Python `re` parses the WS_CHARS escapes identically to
    # Java/RE2.
    from ..functions.text import ASCII_FOLD_TABLE

    _ws = _re.compile("[" + WS_CHARS + "]+")
    folded = query.translate(ASCII_FOLD_TABLE)
    qtokens = sorted({t for t in _ws.split(folded) if t})
    spark = docs.sparkSession
    if not qtokens:
        # schema must match the scoring path for ANY id type — a
        # hardcoded `doc_id long` made the empty-query branch
        # union-incompatible with the normal one on string ids
        id_type = docs.schema[id_col].dataType.simpleString()
        return spark.createDataFrame([], f"doc_id {id_type}, score double")
    # family null posture (null text ≡ ''): an unguarded tokens(NULL)
    # is NULL, whose size() is −1 under legacy sizeOfNull — a null-text
    # doc then poisons avgdl with dl = −1 while the SQL oracle's AVG
    # skips NULLs. Coalescing makes it an ordinary 0-token doc in both
    # engines: counted in N and avgdl, matching no query token.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__t"),
    )
    def _eq(tok):
        # single-arg lambda REQUIRED: a second parameter (even a bound
        # default) makes F.filter pass the array index into it
        return lambda x: x == F.lit(tok)

    # persist_big, not materialize: per_doc is DOC-cardinality (one row
    # per corpus document), and materialize's contract is item/pair/
    # sketch-cardinality only — its eager MEMORY_AND_DISK checkpoint
    # would pin a corpus-sized block set into executor storage memory.
    # Lazy DISK_ONLY serves the same two consumers (stats aggregate,
    # scoring join) with one computation.
    per_doc = persist_big(
        base.select(
            "doc_id",
            F.size("__t").cast("double").alias("dl"),
            *[
                F.size(F.filter("__t", _eq(t)))
                .cast("double")
                .alias(f"__tf{i}")
                for i, t in enumerate(qtokens)
            ],
        )
    )
    stats = per_doc.select(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("token"), F.col(f"__tf{i}").alias("tf")
            )
            for i, t in enumerate(qtokens)
        ]
    )
    tfs = (
        per_doc.select("doc_id", "dl", F.explode(tf_structs).alias("x"))
        .select("doc_id", "dl", F.col("x.token").alias("token"), F.col("x.tf").alias("tf"))
        .filter(F.col("tf") > 0)
    )
    dfs = tfs.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        tfs.join(F.broadcast(dfs), "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                idf
                * F.col("tf")
                * (k1 + 1)
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
