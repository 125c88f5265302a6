"""Unit tests for the text-analysis functions (functions/text.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from propius_spark.functions import (
    fingerprint,
    lang_id,
    quality_score,
    token_count,
    tokens,
)
from propius_spark.operators import doc_stats

FP_BASE, FP_PRIME = 131, 2_147_483_647


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col(F.col("text")).alias("v")
    ).first()["v"]


def test_tokens_empty_and_whitespace(spark):
    assert _one(spark, "", tokens) == []
    assert _one(spark, "   ", tokens) == []
    assert _one(spark, "  A  b\tC ", tokens) == ["a", "b", "c"]


def test_token_count(spark):
    assert _one(spark, "one two  three", token_count) == 3
    assert _one(spark, "", token_count) == 0


def test_lang_id(spark):
    assert _one(spark, "the cat sat on the mat with a hat", lang_id) == "en"
    assert _one(spark, "der Hund ist von der Katze und", lang_id) == "de"
    assert _one(spark, "xyzzy plugh qwerty", lang_id) == "und"
    assert _one(spark, "", lang_id) == "und"


def test_quality_score_range_and_empty(spark):
    assert _one(spark, "", quality_score) == 0.0
    v = _one(spark, "the quick brown fox jumps over the lazy dog", quality_score)
    assert 0.0 < v <= 1.0


def test_fingerprint_hand_computed(spark):
    # "ab" -> ((0*131+97)*131+98) mod P = 97*131+98 = 12805
    assert _one(spark, "ab", fingerprint) == 97 * 131 + 98
    # normalization: case + whitespace collapse
    assert _one(spark, " A   b ", fingerprint) == _one(spark, "a b", fingerprint)
    assert _one(spark, "ab", fingerprint) != _one(spark, "ba", fingerprint)


def test_doc_stats_schema(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in doc_stats(df).collect()}
    assert set(got[1].asDict()) == {
        "doc_id", "n_tokens", "lang", "quality", "fingerprint"
    }
    assert got[1]["n_tokens"] == 6 and got[1]["lang"] == "en"
    assert got[2]["n_tokens"] == 0 and got[2]["quality"] == 0.0


def test_filter_corpus_thresholds(spark):
    from propius_spark.operators import doc_stats, filter_corpus

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "x"),
            (3, "der die das und ist von mit den im ein haus garten"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r for r in doc_stats(docs).collect()}
    got = {r.doc_id: r for r in filter_corpus(
        docs, min_quality=0.1, langs=("en",), min_tokens=3
    ).collect()}
    # only doc 1 is en with >=3 tokens and adequate quality
    assert set(got) == {1}
    assert got[1].n_tokens == stats[1].n_tokens
    assert got[1].quality == round(stats[1].quality, 6)


def test_decontaminate_hand_computed(spark):
    """doc 1 shares 'a b c' with the benchmark (1 of 2 shingles =
    0.5); doc 2 shares nothing; doc 3 (< k tokens) is excluded."""
    from propius_spark.operators import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z"), (3, "a b")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "q a b c r")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_contaminated, r.contamination)
        for r in decontaminate(docs, bench, k=3).collect()
    }
    assert got == {1: (2, 1, 0.5), 2: (1, 0, 0.0)}

    flagged = [
        r.doc_id
        for r in decontaminate(docs, bench, k=3, threshold=0.4).collect()
    ]
    assert flagged == [1]


def test_repetition_stats_hand_computed(spark):
    """'a b a b a b a' has 5 shingles, 2 distinct ('a b a' ×3,
    'b a b' ×2) → dup_ratio 0.6, max_repeat 3; an all-unique doc
    scores 0; a < k-token doc is excluded."""
    from propius_spark.operators import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a b a b a b a"), (2, "p q r s"), (3, "x y")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_distinct, r.dup_ratio, r.max_repeat)
        for r in repetition_stats(docs, k=3).collect()
    }
    assert got == {1: (5, 2, 0.6, 3), 2: (2, 2, 0.0, 1)}


def test_props_rollup_hand_computed(spark):
    """JSON extraction is lax (missing / malformed → null, skipped by
    avg); value sums per group."""
    from propius_spark.operators import props_rollup

    ev = spark.createDataFrame(
        [
            ("click", 1.5, '{"k": 10}'),
            ("click", 2.5, '{"k": 20}'),
            ("view", 1.0, '{"other": 1}'),
            ("view", 2.0, 'not json'),
        ],
        "event_type string, value double, props string",
    )
    got = {
        r.event_type: (r.n_events, r.sum_value, r.avg_field)
        for r in props_rollup(ev, field="k").collect()
    }
    assert got == {"click": (2, 4.0, 15.0), "view": (2, 3.0, None)}


def test_corpus_summary_hand_computed(spark):
    from propius_spark.operators import corpus_summary

    docs = spark.createDataFrame(
        [
            (1, "en", "a b c"),
            (2, "en", "a a d"),
            (3, "de", "x"),
            (4, "de", ""),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r.lang: (r.n_docs, r.total_tokens, r.vocab_size, r.avg_chars)
        for r in corpus_summary(docs).collect()
    }
    # en: 6 tokens over {a,b,c,d}; de: 1 token, empty doc counts in
    # n_docs/avg_chars but contributes no tokens
    assert got == {"en": (2, 6, 4, 5.0), "de": (2, 1, 1, 0.5)}


def test_redact_pii_hand_computed(spark):
    from propius_spark.operators import redact_pii

    docs = spark.createDataFrame(
        [
            (1, "write a.b+x@mail.org now"),
            (2, "see https://ex.com/p?u=a@b.co end"),
            (3, "call +1 (555) 123-4567 today"),
            (4, "clean text stays"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.text for r in redact_pii(docs).collect()}
    assert got[1] == "write <EMAIL> now"
    # the URL swallows the embedded address? email pattern runs FIRST,
    # so the address inside the query string is redacted, then the
    # remaining URL (now containing <EMAIL>) is redacted as a URL
    assert got[2] == "see <URL> end"
    assert got[3] == "call <PHONE> today"
    assert got[4] == "clean text stays"


def test_split_corpus_deterministic_and_partitioned(spark):
    from propius_spark.operators import split_corpus

    docs = spark.createDataFrame(
        [(i, "t") for i in range(500)], "doc_id long, text string"
    )
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in split_corpus(docs, w).collect()}
    b = {
        r.doc_id: r.split
        for r in split_corpus(docs.repartition(7), w).collect()
    }
    assert a == b and len(a) == 500          # total, partition-invariant
    from collections import Counter
    c = Counter(a.values())
    assert 0.7 < c["train"] / 500 < 0.9      # roughly proportional
    assert set(c) == {"train", "val", "test"}

    # holdout: weights summing < 1 drop the tail bucket
    h = split_corpus(docs, {"train": 0.5}).count()
    assert h < 500

    # IEEE-sum weights ({.7,.2,.1} accumulates to 0.999…9) must still
    # partition EVERYTHING — int-truncating the cumulative bound
    # silently dropped top-bucket (999999) keys; 602193 lands there
    top = spark.createDataFrame(
        [(602193, "t"), (1, "t")], "doc_id long, text string"
    )
    w3 = {"train": 0.7, "val": 0.2, "test": 0.1}
    assert split_corpus(top, w3).count() == 2


def test_vocabulary_rank_order(spark):
    from propius_spark.operators import vocabulary

    docs = spark.createDataFrame(
        [(1, "b a a"), (2, "a b c")], "doc_id long, text string"
    )
    got = [
        (r.token, r["count"], r.rank)
        for r in vocabulary(docs).orderBy("rank").collect()
    ]
    assert got == [("a", 3, 1), ("b", 2, 2), ("c", 1, 3)]
    assert vocabulary(docs, min_count=2).count() == 2
    assert vocabulary(docs, limit=1).collect()[0].token == "a"


def test_token_distribution_hand_computed(spark):
    from propius_spark.operators import token_distribution

    docs = spark.createDataFrame(
        [("en", "a b c"), ("en", "a"), ("en", "a b c d e"), ("de", "")],
        "lang string, text string",
    )
    got = {
        r.lang: (r.n_docs, r.mean_tokens, r.min_tokens, r.max_tokens, r.p50)
        for r in token_distribution(docs).collect()
    }
    assert got["en"] == (3, 3.0, 1, 5, 3.0)
    assert got["de"] == (1, 0.0, 0, 0, 0.0)


def test_tokens_whitespace_boundaries(spark):
    """tokens() must be robust to NON-SPACE boundary whitespace: trim
    strips ASCII spaces only, so tabs/newlines used to produce empty
    boundary tokens, and whitespace-only text scored a NaN quality
    that PASSED quality filters (NaN sorts above all doubles)."""
    from propius_spark.functions.text import quality_score, token_count, tokens

    df = spark.createDataFrame(
        [
            (1, "hello world\n"),
            (2, "\thello  world"),
            (3, "\n"),
            (4, "  \t \n "),
            (5, ""),
            (6, "ok"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.toks, r.n, r.q)
        for r in df.select(
            "doc_id",
            tokens(F.col("text")).alias("toks"),
            token_count(F.col("text")).alias("n"),
            quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert out[1][0] == ["hello", "world"] and out[1][1] == 2
    assert out[2][0] == ["hello", "world"]
    for d in (3, 4, 5):
        assert out[d][0] == [] and out[d][1] == 0, d
        assert out[d][2] == 0.0, d  # NOT NaN, and never passes a filter
    assert out[6][0] == ["ok"]


def test_subword_token_count_reference(spark):
    """BPE-ish counter ≡ the Python reference fold: re.findall of the
    same classes over lower(text), Σ ceil(len/4) per piece. Covers
    punctuation, digit runs, accents, long words, empty/null."""
    import math
    import re

    from propius_spark.functions import subword_token_count
    from propius_spark.functions.text import SUBWORD_RE

    pat = re.compile(SUBWORD_RE)

    def ref(text):
        if text is None:
            return 0
        return sum(
            math.ceil(len(p) / 4) for p in pat.findall(text.lower())
        )

    samples = [
        "Hello, world!",
        "antidisestablishmentarianism",
        "v2.0.1-beta (build 20260814)",
        "café déjà-vu ü",
        "12345 678",
        "",
        "\n\t ",
        None,
        "a b c d e f",
        "don't stop — it's 99.9% fine…",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", subword_token_count(F.col("text")).alias("n")
        ).collect()
    }
    for i, s in enumerate(samples):
        assert got[i] == ref(s), (i, s, got[i], ref(s))
    # sanity: long word costs ceil(28/4)=7, short words cost 1 each
    assert got[1] == 7 and got[8] == 6


def test_split_leakage_free_groups_stay_together(spark):
    """Duplicate texts always land in the same split, whatever their
    doc ids — the leakage guarantee split-by-doc cannot give. Runs the
    SHIPPED operator (the sf0.01 driver fixture has all-distinct
    texts, so this duplicate-heavy corpus is where the invariant is
    actually exercised). Null text joins the empty-text group rather
    than vanishing (content_keys' null≡'' posture)."""
    from propius_spark.operators import split_leakage_free
    from pyspark.sql import functions as FF

    rows = [(i, f"text {i % 7}") for i in range(100)]
    rows += [(100, None), (101, ""), (102, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = split_leakage_free(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == 103  # no doc dropped (null text included)
    per_group = (
        out.groupBy("keeper_id")
        .agg(FF.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_group and all(r.n_splits == 1 for r in per_group)
    # null and empty text share one content group (keeper = min id)
    nulls = {r.doc_id: r.keeper_id for r in out.collect()}
    assert nulls[100] == nulls[101] == nulls[102] == 100


def test_split_corpus_rejects_oversum_weights(spark):
    import pytest

    from propius_spark.operators import split_corpus

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="sum"):
        split_corpus(docs, {"train": 0.8, "val": 0.8})


def test_vocabulary_limit_zero_and_corpus_summary_without_ids(spark):
    from propius_spark.operators import corpus_summary, vocabulary

    docs = spark.createDataFrame(
        [("en", "a b c"), ("en", "a b")], "lang string, text string"
    )
    assert vocabulary(docs, limit=0).count() == 0  # falsy-zero bug
    # corpus_summary never touches doc ids; a (group, text) frame works
    rows = corpus_summary(docs, group_col="lang").collect()
    assert len(rows) == 1 and rows[0].n_docs == 2


# --- cross-engine hostile-Unicode parity (round-4 red-row regression) ---
#
# Round 3's one red driver row (token_estimates) came from two
# cross-engine divergences invisible on the local replica's data:
# Java-regex \s includes \x0B while DuckDB/RE2's does not, and JVM
# toLowerCase vs utf8proc lower() disagree on İ/ẞ/ς-class code points.
# This test feeds a hostile corpus through the ENGINE expressions
# (Spark) and the PRODUCTION oracle twin (DuckDB, verbatim from
# __spark_entry__.oracle_sql) and asserts identical counters, so the
# replica catches this class locally even when the driver's sampled
# data happens to avoid it.

HOSTILE_TEXTS = [
    None,
    "",
    "\x0b",  # vertical tab: the Java-vs-RE2 \s divergence char
    "a\x0bb",
    " a \x0b b\t\nc ",
    "a\U0001F600b \U0001F600\U0001F600",  # astral: surrogate-pair split risk
    "À×ɏ÷Ȁ",  # ×/÷ sit INSIDE the À-ɏ code-point range (letters here)
    "Ɏɐɐɏɠ",  # letters straddling the 591 boundary
    "ẞẞ straße",  # letter OUTSIDE the class range (→ other)
    "word" * 25,  # 100-char letter run: ceil-chunk arithmetic
    "1234567890123",  # 13-digit run
    "a1!b2?c3.",  # tight class alternation
    "...///:::",  # punctuation runs: one piece per char
    " ",  # NBSP: non-whitespace in BOTH engines' classes
    "foo bar",
    "İstanbul Iı İİ",  # dotted capital I
    "STRAẞE straße",  # capital sharp s vs ß
    "ΟΔΟΣ οδος ςΣ",  # final sigma / context-sensitive Σ
    "café café",  # combining acute vs precomposed é
    "é́́",  # stacked combining marks
    "mixed \x0b  İẞς 1a2b3c .,;!?",
    " line seps",  # LS/PS: not in either \s
    "tabs\tand\x0bvtabs\x0band\fff",
]


def test_token_count_cp_equals_token_count(spark):
    """token_count_cp (the code-point fold shipped in token_estimates)
    is value-identical to token_count (the regex-split counter every
    other gate-green consumer uses) on the hostile corpus, including
    the NULL→NULL posture — so swapping constructions inside
    token_estimates cannot move it relative to text_doc_stats."""
    import random

    from propius_spark.functions.text import token_count_cp

    rng = random.Random(0xBEEF)
    alphabet = list(" \t\n\x0b\f\r") + list("abzXYZ09.,!İıẞßςΣ́éÀɏ一") + ["\U0001F600"]
    texts = HOSTILE_TEXTS + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 50)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("a"),
        token_count_cp(F.col("text")).alias("b"),
    ).collect()
    bad = [(r.doc_id, texts[r.doc_id], r.a, r.b) for r in rows if r.a != r.b]
    assert not bad, bad


def test_subword_count_equals_regex_pieces(spark):
    """subword_token_count (code-point fold) ≡ Σ ceil(len/4) over the
    regex pieces (subword_tokens) — the fold replaced the regex in the
    PLAN, not in semantics."""
    import random

    from propius_spark.functions import subword_token_count, subword_tokens

    rng = random.Random(0xFACE)
    alphabet = list(" \t\n\x0b\f\r") + list("abzXYZ09.,!İıẞßςΣ́éÀɏ×÷一") + ["\U0001F600"]
    texts = [t for t in HOSTILE_TEXTS if t is not None] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 50)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = df.select(
        "doc_id",
        subword_token_count(F.col("text")).alias("a"),
        F.aggregate(
            subword_tokens(F.col("text")),
            F.lit(0).cast("long"),
            lambda acc, p: acc + F.ceil(F.length(p) / F.lit(4.0)).cast("long"),
        ).alias("b"),
    ).collect()
    bad = [(r.doc_id, texts[r.doc_id], r.a, r.b) for r in rows if r.a != r.b]
    assert not bad, bad


def test_diag_text_triangle(spark):
    """Close the diag triangle: the Spark folds over DIAG_TEXT itself
    equal the Python spec (_diag_expected_counts). With the fuzz/
    replica parity (oracle folds ≡ engine) and the probe (oracle folds
    ≡ spec on the driver's DuckDB), all three implementations are
    pinned pairwise on the same hostile literal."""
    import __spark_entry__ as entrymod
    from propius_spark.functions.text import token_count_cp, subword_token_count

    df = spark.createDataFrame([(entrymod.DIAG_TEXT,)], "text string")
    r = df.select(
        token_count_cp(F.col("text")).alias("nt"),
        subword_token_count(F.col("text")).alias("ns"),
    ).first()
    assert (r.nt, r.ns) == entrymod._diag_expected_counts(entrymod.DIAG_TEXT)


def test_token_fold_kernels_match_python_spec_property(spark):
    """Hypothesis property: the engine's code-point fold kernels agree
    with the Python reference (__spark_entry__._diag_expected_counts —
    the same spec the diag_tokenizer probe pins on the driver's DuckDB)
    on arbitrary unicode text, including astral chars, combining marks,
    every WS code, class-boundary letters, and NULL/empty rows."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import __spark_entry__ as entrymod
    from propius_spark.functions.text import token_count_cp, subword_token_count

    alphabet = st.sampled_from(
        list(" \t\n\x0b\f\r") + list("aZ«9.×÷Àɏɐɏẞß一é́") + ["\U0001f600"]
    )
    texts = st.lists(
        st.one_of(st.none(), st.text(alphabet, max_size=30)),
        min_size=1,
        max_size=25,
    )

    def spec(t):
        if t is None or t == "":
            return (0, 0)
        return entrymod._diag_expected_counts(t)

    @given(texts)
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def run(ts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ts)], "doc_id long, text string"
        )
        rows = df.select(
            "doc_id",
            F.greatest(
                token_count_cp(F.col("text")), F.lit(0).cast("long")
            ).alias("nt"),
            subword_token_count(F.col("text")).alias("ns"),
        ).collect()
        got = {r.doc_id: (r.nt, r.ns) for r in rows}
        want = {i: spec(t) for i, t in enumerate(ts)}
        assert got == want, {
            i: (ts[i], got[i], want[i]) for i in want if got[i] != want[i]
        }

    run()


def test_token_counters_match_duckdb_on_hostile_unicode(spark):
    import random

    import duckdb
    import pandas as pd

    import __spark_entry__ as entrymod
    from propius_spark.functions.text import subword_token_count

    rng = random.Random(0xC0FFEE)  # deterministic "property" corpus
    alphabet = list(" \t\n\x0b\f\r   ") + list(
        "abzXYZ09.,!İıẞßςΣο"
        "́éÀɏ一"
    )
    texts = HOSTILE_TEXTS + [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40)))
        for _ in range(300)
    ]
    rows = [(i, t) for i, t in enumerate(texts)]

    sdf = spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id",
        F.greatest(
            token_count(F.col("text")).cast("long"), F.lit(0).cast("long")
        ).alias("n_tokens"),
        subword_token_count(F.col("text")).alias("n_subword"),
    )
    got = {r["doc_id"]: (r["n_tokens"], r["n_subword"]) for r in sdf.collect()}

    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    con.register("documents", pdf)
    sql = entrymod.oracle_sql()["token_estimates"]
    want = {
        int(d): (int(nt), int(ns))
        for d, nt, ns in con.execute(sql).fetchall()
    }
    assert len(got) == len(want) == len(texts)
    diffs = {
        i: (texts[i], got[i], want[i]) for i in want if got[i] != want[i]
    }
    assert not diffs, f"engine/oracle counter divergence: {diffs}"


def test_vocabulary_rank_guard_raises_past_bound(spark, monkeypatch):
    """vocabulary()'s rank window is single-task over the post-filter
    vocabulary by contract; past the documented bound the plan raises
    (plans.bounded_rank) instead of silently sorting an unbounded
    vocabulary on one core."""
    import pytest

    import propius_spark.operators.dedup as dd
    from propius_spark.operators import vocabulary

    docs = spark.createDataFrame(
        [("a b c d e f g h i j",)], "text string"
    )
    monkeypatch.setattr(dd, "DICT_RANK_MAX", 4)
    with pytest.raises(Exception, match="vocabulary.*documented bound"):
        # collect, not count: count() prunes the rank column and the
        # window (and the sort being guarded) with it
        vocabulary(docs).collect()
    # a LIMIT below the bound keeps the window inside its contract
    assert len(vocabulary(docs, limit=3).collect()) == 3


def test_quality_score_null_text_is_null_not_zero(spark):
    """Round-4 review fix: NULL text scores NULL (the oracle's answer)
    in EVERY size() mode; empty/whitespace-only text scores 0.0."""
    df = spark.createDataFrame([(None,), ("",), ("  \n ",)], "text string")
    vals = [
        r.q for r in df.select(quality_score(F.col("text")).alias("q")).collect()
    ]
    assert vals[0] is None and vals[1] == 0.0 and vals[2] == 0.0


def test_corpus_summary_null_group_keeps_vocab(spark):
    """Round-4 review fix: the NULL group row survived both aggregates
    but the plain equi-join couldn't match NULL = NULL, silently
    zeroing its vocab_size; the join is now null-safe (oracle: IS NOT
    DISTINCT FROM)."""
    from propius_spark.operators import corpus_summary

    docs = spark.createDataFrame(
        [(None, "hello world hello"), ("en", "a b")], "lang string, text string"
    )
    rows = {r.lang: r for r in corpus_summary(docs, group_col="lang").collect()}
    assert rows[None].vocab_size == 2 and rows[None].total_tokens == 3
    assert rows["en"].vocab_size == 2


def test_subword_token_count_accepts_str_name(spark):
    """ADVICE r5: subword_token_count regressed to Column-only when it
    grew a .isNull() call; every sibling counter accepts a plain
    column-name string. Pin str/Column equivalence."""
    from pyspark.sql import functions as F

    from propius_spark.functions import subword_token_count

    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "abc123 Zz")],
        "doc_id long, text string",
    )
    got = df.select(
        subword_token_count("text").alias("by_name"),
        subword_token_count(F.col("text")).alias("by_col"),
    ).collect()
    assert all(r.by_name == r.by_col for r in got)
