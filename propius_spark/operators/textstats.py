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

from ..functions.text import (
    WS_CHARS,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from ..schemas import require_columns


def doc_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fan: bool = True,
) -> DataFrame:
    """(doc_id, n_tokens, lang, quality, fingerprint) — one row per doc.

    ``fan=True`` (default): repartition by doc first — a small corpus
    is one parquet file = one input partition, and the fingerprint
    fold is the most expensive per-row expression in the engine
    (per-character lambda evals). ``fan=False`` for consumers that
    FILTER on the stats immediately (filter_corpus): Catalyst inlines
    the stat expressions into the pushed-down predicate below any
    repartition anyway (plan-audited — the exchange ended up carrying
    ids while the compute ran at scan parallelism), so the honest
    plan is stats fused into the scan with no exchange at all."""
    t = F.col(text_col)
    src = docs
    if fan:
        from ..plans import fan_out

        src = fan_out(docs, id_col)
    return src.select(
        F.col(id_col).alias("doc_id"),
        token_count(t).alias("n_tokens"),
        lang_id(t).alias("lang"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


def filter_corpus(
    docs: DataFrame,
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    min_tokens: int = 0,
    max_tokens: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality gate for a training corpus: docs passing the language /
    quality-score / token-count filters, as (doc_id, n_tokens, lang,
    quality). Still one map-side scan+project — the stats never
    materialize, Catalyst fuses compute and filter into the scan stage.

    Thresholds compare against the 6-dp-rounded quality score so the
    selected set is identical across engines (raw doubles differ in the
    last ulp between summation orders)."""
    # fan=False: the filter fuses into the scan; a fan-out exchange
    # here was plan-audited as defeated (see doc_stats docstring)
    s = doc_stats(docs, id_col, text_col, fan=False).select(
        "doc_id", "n_tokens", "lang", F.round("quality", 6).alias("quality")
    )
    out = s.filter(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    if langs is not None:
        out = out.filter(F.col("lang").isin(list(langs)))
    if max_tokens is not None:
        out = out.filter(F.col("n_tokens") <= max_tokens)
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    threshold: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: per training doc, the fraction of its
    distinct k-token shingles that also occur in `benchmark` (the
    standard n-gram containment check published training pipelines run
    before a model ever sees the data). Returns (doc_id, n_shingles,
    n_contaminated, contamination); with ``threshold`` set, only docs
    with contamination >= threshold (the quarantine list).

    Docs with fewer than k tokens have no shingles and are excluded —
    same convention as jaccard_pairs (nothing to test containment on).

    Scale: the benchmark side is the SMALL side by contract (eval sets
    are thousands of docs, the corpus is the 100 TB side) — its
    distinct-shingle set broadcasts, so the corpus pass is one
    shuffle-free scan + map-side join over the shingle stream. At
    extreme benchmark sizes swap the broadcast for a bloom filter
    (same plan shape, approximate membership, zero false negatives on
    the quarantine side by re-verifying hits).
    """
    from .dedup import shingles

    # NOTE (optimization r8): rewriting the per-doc distinct as two
    # count_distinct aggregates over the multiset stream was tried and
    # REJECTED — multi-distinct plans via Expand (2× the corpus-side
    # rows into the exchange) and still pays three corpus-side
    # exchanges, while this shape's `distinct` dedups map-side in its
    # partial HashAggregate before shuffling. This is already the
    # minimal-shuffle form for the distinct-shingle semantics.
    dsh = shingles(docs, k, id_col, text_col)
    bsh = (
        shingles(benchmark, k, id_col, text_col)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        dsh.join(F.broadcast(bsh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_shingles"), 6
            ).alias("contamination"),
        )
    )
    if threshold is not None:
        per_doc = per_doc.filter(F.col("contamination") >= threshold)
    return per_doc


def repetition_stats(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Intra-document repetition: per doc over the MULTISET of k-token
    shingles — (doc_id, n_shingles, n_distinct, dup_ratio, max_repeat).
    dup_ratio = 1 − distinct/total is the Gopher-style repeated-n-gram
    quality signal (templated/spam text scores high); max_repeat is the
    hottest single shingle's count. Docs with < k tokens are excluded.

    One shuffle on (doc, shingle) with map-side combine, then a
    doc-cardinality reaggregation — shingling itself stays map-side.
    """
    from .dedup import shingles

    per_sh = (
        shingles(docs, k, id_col, text_col, unique=False)
        .groupBy("doc_id", "shingle")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_sh.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_shingles"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("max_repeat"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_distinct",
            F.round(1.0 - F.col("n_distinct") / F.col("n_shingles"), 6).alias(
                "dup_ratio"
            ),
            "max_repeat",
        )
    )


def corpus_summary(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level analytics per group (language, source, ...):
    (group, n_docs, total_tokens, vocab_size, avg_chars) — the
    "what's in this corpus" report a data pipeline publishes with
    every snapshot.

    Two aggregates joined on the tiny group key: doc-level stats are a
    map-side scan + one group-key shuffle; vocab_size is
    count-distinct over the exploded token stream (Spark's two-phase
    distinct aggregate — partial per-partition dedup before the
    shuffle, so the wire carries the per-partition vocabulary, not the
    token stream).
    """
    from ..functions.text import token_count, tokens

    # id_col is NOT required: the summary never touches document ids
    # (requiring it rejected valid (group, text) frames)
    require_columns(docs, [group_col, text_col], "corpus_summary")
    g = F.col(group_col)
    per_doc = docs.select(
        g,
        token_count(F.col(text_col)).alias("__nt"),
        F.length(F.col(text_col)).alias("__nc"),
    )
    doc_stats_agg = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nt").alias("total_tokens"),
        F.round(F.avg("__nc"), 6).alias("avg_chars"),
    )
    vocab = (
        docs.select(g, F.explode(tokens(F.col(text_col))).alias("__tok"))
        .groupBy(group_col)
        .agg(F.count_distinct("__tok").alias("vocab_size"))
    )
    # null-SAFE join key: groupBy keeps a NULL group row in BOTH
    # aggregates, but a plain equi-join can't match NULL = NULL — the
    # NULL group's vocab_size silently coalesced to 0. eqNullSafe
    # pairs them (oracle twin: IS NOT DISTINCT FROM).
    return doc_stats_agg.join(
        vocab,
        doc_stats_agg[group_col].eqNullSafe(vocab[group_col]),
        "left",
    ).select(
        doc_stats_agg[group_col],
        "n_docs",
        "total_tokens",
        F.coalesce("vocab_size", F.lit(0)).alias("vocab_size"),
        "avg_chars",
    )


# character classes shared by both engines (Java regex and RE2): no
# lookarounds, no \b — plain classes and quantifiers only, so Spark's
# regexp_replace and the oracle's produce identical text
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # whitespace spelled as the shared explicit class (functions/text
    # WS_CHARS): Java's \s includes \x0B, RE2's does not
    ("url", r"https?://[^" + WS_CHARS + r"]+", "<URL>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(
    docs: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Scrub emails, URLs, and phone-shaped digit runs from the text
    column (applied in PII_PATTERNS order — email before URL before
    phone, so an address inside a URL query string is already gone
    when the phone pattern runs). Pure map-side regexp_replace chain;
    patterns are deliberately lookaround-free so any RE2-class oracle
    replays them byte-for-byte. Pattern-match recall is the usual
    regex-PII trade — this is the scrub stage, not a PII *detector*.
    """
    require_columns(docs, [text_col], "redact_pii")
    col = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        col = F.regexp_replace(col, pat, repl)
    return docs.withColumn(out_col or text_col, col)


def split_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test split: adds a `split` label chosen
    purely by key arithmetic (same bucket family as sampling.py), so
    every re-run, every engine, and every downstream job agrees on the
    assignment — the property RNG-based randomSplit cannot give.
    Weights need not sum to 1; rows falling past the cumulative range
    (sum < 1) are dropped (holdout)."""
    from .sampling import SAMPLE_RES, _require_numeric_key, sample_bucket

    require_columns(docs, [key_col], "split_corpus")
    _require_numeric_key(docs, key_col, "split_corpus")
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    if sum(weights.values()) > 1.0 + 1e-9:
        # buckets only cover [0, 1): a sum over 1 silently TRUNCATES
        # the overflowing splits' ranges (the last split would get a
        # fraction of its requested share with no error)
        raise ValueError(
            f"split weights sum to {sum(weights.values())} > 1; "
            "splits are bucket ranges of [0, 1)"
        )
    b = sample_bucket(F.col(key_col))
    expr = None
    acc = 0.0
    for name, w in weights.items():
        lo, acc = acc, acc + w
        # round, not int-truncate: {0.7, 0.2, 0.1} accumulates to
        # 0.999…9 in IEEE, and truncation would turn the top bucket
        # into a silent ~1ppm holdout
        cond = (b >= round(lo * SAMPLE_RES)) & (b < round(acc * SAMPLE_RES))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return docs.withColumn("split", expr).filter(F.col("split").isNotNull())


def split_leakage_free(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    keys: DataFrame | None = None,
) -> DataFrame:
    """Leakage-free train/val/test split: byte-identical documents
    always land in the SAME split (a duplicate straddling train and
    test silently leaks eval data), because the split key is the
    content group's KEEPER id — min doc id per SHA-256 content
    address — fed through ``split_corpus``'s deterministic key
    arithmetic. Returns (doc_id, keeper_id, split).

    Scale shape: the keeper groupBy and the join back both key on the
    32-byte content address, so every exchange carries (key, id)
    rows, never text; the split assignment itself is pure map-side
    arithmetic. The key table feeds BOTH sides of that self-join, so
    it is persisted here (persist_big — doc-row cardinality, same
    posture as q_dedup_incremental; released by
    ``session.clear_materialized``) and the corpus hash pass runs
    once. ``keys``: optional precomputed ``content_keys(docs)``
    output — pass it when the pipeline already hashed the corpus
    (e.g. alongside ``dedup_against``) to skip even that one pass."""
    from ..plans import persist_big
    from .dedup import content_keys

    require_columns(docs, [id_col] if keys is not None else [id_col, text_col],
                    "split_leakage_free")
    if keys is None:
        keys = persist_big(
            content_keys(docs, id_col=id_col, text_col=text_col)
        )
    keeper = keys.groupBy("content_key").agg(
        F.min("doc_id").alias("keeper_id")
    )
    withk = keys.join(keeper, "content_key").select("doc_id", "keeper_id")
    return split_corpus(withk, weights, key_col="keeper_id").select(
        "doc_id", "keeper_id", "split"
    )


def vocabulary(
    docs: DataFrame,
    min_count: int = 1,
    limit: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary with frequencies: (token, count, rank), rank
    by count desc then token asc — the tokenizer-training precursor.
    One map-side tokenize+explode with partial aggregation, a single
    token-key shuffle, and (with ``limit``) a distributed top-k rather
    than a global sort. The rank window's single-partition scope only
    ever sees the post-filter vocabulary (≪ corpus) — cap it with
    ``limit``/``min_count`` at scale; the plan itself raises via
    `plans.bounded_rank` if the post-filter vocabulary still exceeds
    the documented single-task bound."""
    from pyspark.sql.window import Window

    from ..functions.text import tokens
    from ..plans import bounded_rank
    from .dedup import DICT_RANK_MAX

    require_columns(docs, [text_col], "vocabulary")
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    raw = F.row_number().over(w).cast("long")
    # `is not None`, not truthiness: limit=0 must cap to zero rows,
    # not silently return the full unbounded vocabulary
    if limit is not None and limit <= DICT_RANK_MAX:
        # explicit top-`limit` BEFORE the rank window, so the
        # single-partition window's input is ≤ limit rows BY
        # CONSTRUCTION — not by trusting Catalyst's rank-pushdown
        # pattern match (which a wrapper expression could silently
        # defeat, leaving an unguarded full-vocabulary sort on one
        # task). orderBy+limit compiles to TakeOrderedAndProject:
        # per-partition partial top-k, O(limit)-heap merge; the rank
        # then numbers the already-limited, already-ordered rows.
        top = counts.orderBy(F.desc("count"), F.asc("token")).limit(limit)
        return top.withColumn("rank", raw)
    ranked = counts.withColumn(
        "rank", bounded_rank(raw, DICT_RANK_MAX, "vocabulary")
    )
    return ranked.filter(F.col("rank") <= limit) if limit is not None else ranked


def token_distribution(
    docs: DataFrame,
    group_col: str = "lang",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    text_col: str = "text",
) -> DataFrame:
    """Token-count distribution report per group: exact percentiles
    (Spark's `percentile` — linear interpolation, bit-identical to
    quantile_cont in an ANSI oracle) plus mean/min/max/n. The
    per-snapshot length-distribution table a training pipeline tracks
    for drift.

    Exact percentiles sort within each group in the aggregate buffer —
    right while group cardinalities are bounded (length distributions
    per language/source); for unbounded groups switch to
    `approx_percentile` (one pass, bounded memory, no oracle parity).
    """
    require_columns(docs, [group_col, text_col], "token_distribution")
    nt = token_count(F.col(text_col))
    aggs = [
        # round, not int(): float artifacts (0.29*100 = 28.999...)
        # must not truncate into a misnamed column
        F.percentile("__nt", F.lit(q)).alias(f"p{round(q * 100)}")
        for q in quantiles
    ]
    return (
        docs.select(F.col(group_col), nt.alias("__nt"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__nt"), 6).alias("mean_tokens"),
            F.min("__nt").cast("long").alias("min_tokens"),
            F.max("__nt").cast("long").alias("max_tokens"),
            *aggs,
        )
    )
