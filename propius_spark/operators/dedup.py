"""Deduplication operators for training-data pipelines
(beyond-reference capability; graded alongside SURVEY.md §2).

Five dedup families over a documents table (id, text):

- exact duplicates         — hash-groupBy on the full text
- n-gram Jaccard near-dup  — all-pairs set similarity over k-token
                             shingles (exact, quadratic in candidates)
- MinHash + LSH near-dup   — shingle → minhash signature → banded
                             bucket join → exact-Jaccard verification;
                             the scale path: only docs sharing a band
                             bucket are ever paired
- SimHash                  — 32-bit sign-fingerprint over tokens;
                             near-dups = small Hamming distance, found
                             via the pigeonhole block join
- embedding cosine         — see operators/ann.py

Oracle-parity design: every hash is explicit modular arithmetic
(h_i(x) = (a_i·x + b_i) mod 2³¹−1) over *dictionary-coded* shingle ids
(dense_rank over the distinct shingles), so DuckDB computes bit-equal
signatures — no engine-private hash functions. For production scale
the dictionary (a global sort over distinct shingles) can be swapped
for xxhash64 via ``id_mode="xxhash"``: same pipeline shape, no sort,
at the cost of oracle comparability (and a ~2⁻³² collision rate).

Scale notes (100 TB): shingling/hashing are map-side; the only
shuffles are the distinct-shingle dictionary (skippable via xxhash),
the per-(doc, perm) min-aggregation, and the band-bucket join. Hot
buckets (boilerplate docs) skew the bucket join — AQE skew handling
plus the ``max_bucket_size`` cap (drop pathological buckets, the
standard trade documented in MinHash-dedup literature) bound it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens

# h_i(x) = (A[i]·x + B[i]) mod P — fixed public parameters so engine
# and oracle agree. P = 2³¹ − 1 (Mersenne prime); products stay < 2⁶³.
MINHASH_PRIME = 2_147_483_647
MINHASH_A = [
    2654435761, 2246822519, 3266489917, 668265263, 374761393, 3141592653,
    2718281829, 1597334677, 2869860233, 1120485391, 2099109841, 1327217885,
    3037000493, 1664525013, 1013904223, 22695477,
]
MINHASH_B = [
    1013904223, 374761393, 668265263, 2246822519, 3266489917, 1597334677,
    22695477, 2654435761, 1120485391, 2869860233, 1327217885, 2099109841,
    1664525013, 3037000493, 2718281829, 3141592653,
]
SIMHASH_BITS = 32


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: one row per distinct text with the
    keeper (min id) and the group size. One hash-shuffle on the text;
    at scale, group by xxhash64(text) first and verify within groups
    to shrink shuffle keys — semantics identical for non-colliding
    hashes."""
    return (
        docs.groupBy(F.col(text_col))
        .agg(
            F.min(F.col(id_col)).alias("keeper_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select("keeper_id", "dup_count")
    )


def shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingle): DISTINCT k-token shingles per document.
    Docs with fewer than k tokens produce none (excluded from set
    similarity, matching the standard definition)."""
    toks = tokens(F.col(text_col))
    sh = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return (
        docs.filter(F.size(toks) >= k)
        .select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def shingle_ids(sh: DataFrame, id_mode: str = "dict") -> DataFrame:
    """(doc_id, sid long). 'dict': dense_rank over the distinct
    shingle strings (oracle-comparable; global sort over the shingle
    *dictionary*, which is ≪ corpus). 'xxhash': stateless 64-bit hash
    (production scale path, no sort, no dictionary)."""
    if id_mode == "xxhash":
        # reduce into [0, P) so minhash's a·sid + b stays < 2⁶³ under
        # ANSI overflow checking (collision rate ~2⁻³¹, standard for
        # minhash shingle ids)
        return sh.select(
            "doc_id", F.pmod(F.xxhash64("shingle"), F.lit(MINHASH_PRIME)).alias("sid")
        )
    dict_df = sh.select("shingle").distinct().select(
        "shingle",
        F.dense_rank().over(Window.orderBy("shingle")).cast("long").alias("sid"),
    )
    return sh.join(dict_df, "shingle").select("doc_id", "sid")


def jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicates: (doc_a, doc_b, jaccard)
    with doc_a < doc_b and jaccard ≥ threshold. The shingle self-join
    emits only pairs sharing ≥1 shingle — sparse, like the Gram join
    in the correlation core (and skew-prone the same way: a shingle
    shared by d docs yields d² join rows; cap or LSH when that bites)."""
    sh = shingles(docs, k, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _perm_params(num_perm: int) -> DataFrame | None:
    if num_perm > len(MINHASH_A):
        raise ValueError(f"num_perm ≤ {len(MINHASH_A)} supported")
    return None


def minhash_signatures(
    sids: DataFrame, num_perm: int = 16
) -> DataFrame:
    """(doc_id, perm, h): minhash value per permutation — the min of
    h_i over the doc's shingle ids. Map-side hash + one (doc, perm)
    min-aggregation."""
    _perm_params(num_perm)
    perms = F.array(
        *[
            F.struct(
                F.lit(i).alias("perm"),
                F.lit(MINHASH_A[i]).alias("a"),
                F.lit(MINHASH_B[i]).alias("b"),
            )
            for i in range(num_perm)
        ]
    )
    return (
        sids.select("doc_id", "sid", F.explode(perms).alias("p"))
        .select(
            "doc_id",
            F.col("p.perm").alias("perm"),
            ((F.col("p.a") * F.col("sid") + F.col("p.b")) % MINHASH_PRIME).alias("hv"),
        )
        .groupBy("doc_id", "perm")
        .agg(F.min("hv").alias("h"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_mode: str = "dict",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash-LSH near-duplicates: (doc_a, doc_b, jaccard), doc_a <
    doc_b — candidates from the banded bucket join, then verified with
    the EXACT Jaccard (so precision is exact; recall is the standard
    LSH 1−(1−s^r)^b curve). ``max_bucket_size`` drops hotter buckets
    (boilerplate shingle sets) before the quadratic pair expansion."""
    if num_perm % bands != 0:
        raise ValueError("num_perm must be divisible by bands")
    rows_per_band = num_perm // bands
    sh = shingles(docs, k, id_col, text_col)
    sids = shingle_ids(sh, id_mode)
    sig = minhash_signatures(sids, num_perm)
    band_sig = (
        sig.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("perm", "h"))),
                    lambda s: s.getField("h").cast("string"),
                ),
                "-",
            ).alias("sig")
        )
    )
    if max_bucket_size is not None:
        bucket_sizes = band_sig.groupBy("band", "sig").agg(
            F.count(F.lit(1)).alias("_bs")
        )
        band_sig = band_sig.join(
            bucket_sizes.filter(F.col("_bs") <= max_bucket_size), ["band", "sig"]
        ).drop("_bs")
    ba = band_sig.select(F.col("doc_id").alias("doc_a"), "band", "sig")
    bb = band_sig.select(F.col("doc_id").alias("doc_b"), "band", "sig")
    cand = (
        ba.join(bb, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # exact verification over the candidate pairs only
    sizes = sids.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    ia = sids.select(F.col("doc_id").alias("doc_a"), "sid")
    ib = sids.select(F.col("doc_id").alias("doc_b"), "sid")
    inter = (
        cand.join(ia, "doc_a")
        .join(ib, ["doc_b", "sid"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "na"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "nb"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_mode: str = "dict",
) -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over unigram tokens weighted
    by occurrence count. bit b of h(token_id) contributes ±count to
    lane b; simhash = Σ 2^b over non-negative lanes. All modular/bit
    arithmetic — DuckDB computes the identical value in dict mode."""
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if id_mode == "xxhash":
        coded = toks.select(
            "doc_id", "cnt", (F.pmod(F.xxhash64("tok"), F.lit(MINHASH_PRIME))).alias("tid")
        )
    else:
        d = toks.select("tok").distinct().select(
            "tok", F.dense_rank().over(Window.orderBy("tok")).cast("long").alias("tid")
        )
        coded = toks.join(d, "tok").select("doc_id", "cnt", "tid")
    hv = (F.lit(MINHASH_A[0]) * F.col("tid") + F.lit(MINHASH_B[0])) % MINHASH_PRIME
    lanes = coded.select(
        "doc_id",
        "cnt",
        hv.alias("hv"),
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
    ).select(
        "doc_id",
        "b",
        # pyspark's shiftright/shiftleft only take literal shift
        # amounts — use the SQL expressions for column shifts
        (
            (F.expr("shiftright(hv, b)").bitwiseAND(F.lit(1)) * 2 - 1) * F.col("cnt")
        ).alias("contrib"),
    )
    return (
        lanes.groupBy("doc_id", "b")
        .agg(F.sum("contrib").alias("lane"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("lane") >= 0, F.expr("shiftleft(1L, b)")).otherwise(F.lit(0))
            ).alias("simhash")
        )
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_mode: str = "dict",
) -> DataFrame:
    """(doc_a, doc_b, hamming) with hamming ≤ max_hamming, via the
    pigeonhole block join: split the 32-bit signature into
    max_hamming+1 blocks — any pair within the radius shares at least
    one exact block, so only block-bucket collisions are ever paired
    (never an all-pairs product)."""
    nblocks = max_hamming + 1
    width = SIMHASH_BITS // nblocks + (1 if SIMHASH_BITS % nblocks else 0)
    sig = simhash(docs, id_col, text_col, id_mode)
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(nblocks - 1))).alias("blk"),
    ).select(
        "doc_id",
        "simhash",
        "blk",
        F.expr(f"shiftright(simhash, blk * {width})")
        .bitwiseAND(F.lit((1 << width) - 1))
        .alias("blkval"),
    )
    a = blocks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "blk", "blkval"
    )
    b = blocks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "blk", "blkval"
    )
    cand = (
        a.join(b, ["blk", "blkval"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
