"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Fixture mapping (FIXTURES.md §4): the co-occurrence event log is
``lineitem(l_orderkey AS reference_id, l_partkey AS item_id)``
("parts bought together") or ``events(user_id, dense-coded
event_type)``; the item dictionary is ``part(p_partkey AS id,
p_name AS title)`` (p_partkey is 0-based in the testdata, so no −1
shift is needed for store-id parity).

Float policy: every correlation/score column is rounded to 6 dp in
BOTH the Spark query and the oracle SQL before the driver hashes
values (absorbs summation-order nondeterminism, SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from propius_spark.operators import (
    build_cells,
    corr_pairs,
    get_similar_items,
    similar_items_candidates,
    similar_items_exact,
)
from propius_spark.serving import (
    get_database_stats,
    get_item_info,
    retrieve_similar_items,
    search_items_by_name,
)
from propius_spark.sources import (
    occurrences_from_events,
    occurrences_from_lineitem,
)

FLAGSHIP_ITEM = 1  # p_partkey of the demo part (exists at every sf)


def _part_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """correlated_items dim from the part table (FIXTURES.md §4)."""
    return spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"),
        F.col("p_name").alias("key"),
        F.lit(None).cast("string").alias("human_label"),
    )


def _lineitem_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_cells(occurrences_from_lineitem(spark, sf_dir))


def _r6(df: DataFrame, *cols: str) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, F.round(F.col(c), 6))
    return out


# ---------------------------------------------------------------- queries


def q_corr_pairs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 ops 9/10/13/14/15/33: all-pairs Pearson over
    co-occurring (shared-order) part pairs."""
    pairs = corr_pairs(_lineitem_cells(spark, sf_dir))
    return _r6(pairs.select("item_a", "item_b", "corr"), "corr")


def q_similar_one_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 ops 22/23/24/34: one item's exact full correlation
    row (zero-dot neighbors included), mean+2σ threshold."""
    sims = get_similar_items(
        _lineitem_cells(spark, sf_dir), FLAGSHIP_ITEM, "std_dev", 2.0
    )
    return _r6(sims.select("item_b", "corr"), "corr")


def q_similar_exact_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.2: full batch publication — for EVERY item, neighbors
    over the complete correlation row clearing mean+2σ, min-max scaled.
    Replaces the reference's per-item N+1 loop (propius/data.py:116-149)
    with one distributed job."""
    sims = similar_items_exact(_lineitem_cells(spark, sf_dir), k_sigma=2.0)
    return _r6(
        sims.select("item_a", "item_b", "corr", "scaled_score"),
        "corr",
        "scaled_score",
    )


def q_similar_candidates_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates mode (co-occurring pairs only) with an absolute
    threshold (SURVEY §2 op-24's non-std_dev branch) on the events
    fixture (user × dense-coded event_type)."""
    sims = similar_items_candidates(
        build_cells(occurrences_from_events(spark, sf_dir)),
        threshold_method="absolute",
        threshold_value=-1.0,
    )
    return _r6(sims.select("item_a", "item_b", "corr"), "corr")


def q_retrieve_topk_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 ops 28/30/34/35: serving retrieve — one item's
    neighbors joined to the dim for names, top-10 by score."""
    # full correlation row (absolute threshold −2 keeps everything),
    # shaped as the published similar_items fact table
    row = get_similar_items(
        _lineitem_cells(spark, sf_dir), FLAGSHIP_ITEM, "absolute", -2.0
    )
    fact = row.select(
        F.lit(FLAGSHIP_ITEM).cast("long").alias("item_a_id"),
        F.col("item_b").cast("long").alias("item_b_id"),
        F.col("corr").alias("scaled_score"),
    )
    out = retrieve_similar_items(
        fact, _part_dim(spark, sf_dir), FLAGSHIP_ITEM, limit=10
    )
    return _r6(out, "scaled_score")


def q_item_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 op-25: point lookup on the dim table."""
    return get_item_info(_part_dim(spark, sf_dir), 42)


def q_search_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 ops 26/36: case-insensitive substring search,
    ordered, limited. Tie-broken by id for determinism."""
    return search_items_by_name(_part_dim(spark, sf_dir), "WIDGET", limit=10)


def q_db_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2 ops 19/20/21: COUNT(*), GROUP BY count, nested AVG
    rounded to 2 dp — the reference's get_database_stats shape
    (propius/data.py:316-359) over dim=part / fact=lineitem."""
    dim = _part_dim(spark, sf_dir)
    fact = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_partkey").alias("item_a_id"),
        F.col("l_orderkey").alias("item_b_id"),
        F.lit(1.0).alias("scaled_score"),
    )
    return get_database_stats(fact, dim)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 'parts bought together' for one part at sf0.001 —
    full model row, name-joined, top-10."""
    return q_retrieve_topk_part(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "corr_pairs_parts": q_corr_pairs_parts,
        "similar_one_part": q_similar_one_part,
        "similar_exact_parts": q_similar_exact_parts,
        "similar_candidates_events": q_similar_candidates_events,
        "retrieve_topk_part": q_retrieve_topk_part,
        "item_info": q_item_info,
        "search_items": q_search_items,
        "db_stats": q_db_stats,
    }


# ---------------------------------------------------------------- oracles

# Shared model CTEs over lineitem: cells → n → per-item stats → valid
# stats (den² = n·q − s² > 0) → gram (co-occurring pair dots).
_MODEL = """
WITH occ AS (SELECT l_orderkey AS ref, l_partkey AS item FROM lineitem),
cells AS (SELECT item, ref, COUNT(*)::DOUBLE AS cnt FROM occ GROUP BY 1, 2),
nn AS (SELECT COUNT(DISTINCT ref)::DOUBLE AS n FROM cells),
st AS (SELECT item, SUM(cnt) AS s, SUM(cnt*cnt) AS q FROM cells GROUP BY 1),
vs AS (SELECT item, s, sqrt(n.n*q - s*s) AS den
       FROM st, nn n WHERE n.n*q - s*s > 0),
gram AS (SELECT a.item AS item_a, b.item AS item_b,
                SUM(a.cnt*b.cnt) AS dot
         FROM cells a JOIN cells b ON a.ref = b.ref AND a.item <> b.item
         GROUP BY 1, 2)
"""

_ONE_ROW = f"""
{_MODEL},
me AS (SELECT s, den FROM vs WHERE item = {FLAGSHIP_ITEM}),
dots AS (SELECT item_b, dot FROM gram WHERE item_a = {FLAGSHIP_ITEM}),
row_ AS (SELECT v.item AS item_b,
                (n.n*COALESCE(d.dot, 0) - me.s*v.s)/(me.den*v.den) AS corr
         FROM vs v LEFT JOIN dots d ON v.item = d.item_b, me, nn n
         WHERE v.item <> {FLAGSHIP_ITEM})
"""


def oracle_sql() -> dict[str, str]:
    return {
        "corr_pairs_parts": f"""
            {_MODEL}
            SELECT g.item_a, g.item_b,
                   ROUND((n.n*g.dot - a.s*b.s)/(a.den*b.den), 6) AS corr
            FROM gram g
            JOIN vs a ON g.item_a = a.item
            JOIN vs b ON g.item_b = b.item, nn n
        """,
        "similar_one_part": f"""
            {_ONE_ROW},
            cut AS (SELECT AVG(corr) + 2.0*STDDEV_SAMP(corr) AS v FROM row_)
            SELECT item_b, ROUND(corr, 6) AS corr
            FROM row_, cut WHERE corr >= cut.v
        """,
        "similar_exact_parts": f"""
            {_MODEL},
            pairs AS (SELECT a.item AS item_a, b.item AS item_b,
                     (n.n*COALESCE(g.dot, 0) - a.s*b.s)/(a.den*b.den) AS corr
                      FROM vs a JOIN vs b ON a.item <> b.item
                      LEFT JOIN gram g
                        ON g.item_a = a.item AND g.item_b = b.item, nn n),
            w AS (SELECT item_a, item_b, corr,
                         AVG(corr) OVER pw AS mean_,
                         STDDEV_SAMP(corr) OVER pw AS std_,
                         MIN(corr) OVER pw AS mn,
                         MAX(corr) OVER pw AS mx
                  FROM pairs WINDOW pw AS (PARTITION BY item_a))
            SELECT item_a, item_b, ROUND(corr, 6) AS corr,
                   ROUND(CASE WHEN mx = mn THEN 0.0
                              ELSE (corr - mn)/(mx - mn) END, 6) AS scaled_score
            FROM w WHERE corr >= mean_ + 2.0*std_
        """,
        "similar_candidates_events": """
            WITH coded AS (SELECT event_type,
                                  DENSE_RANK() OVER (ORDER BY event_type) - 1
                                    AS item_id
                           FROM (SELECT DISTINCT event_type FROM events)),
            occ AS (SELECT e.user_id AS ref, c.item_id AS item
                    FROM events e JOIN coded c USING (event_type)),
            cells AS (SELECT item, ref, COUNT(*)::DOUBLE AS cnt
                      FROM occ GROUP BY 1, 2),
            nn AS (SELECT COUNT(DISTINCT ref)::DOUBLE AS n FROM cells),
            st AS (SELECT item, SUM(cnt) AS s, SUM(cnt*cnt) AS q
                   FROM cells GROUP BY 1),
            vs AS (SELECT item, s, sqrt(n.n*q - s*s) AS den
                   FROM st, nn n WHERE n.n*q - s*s > 0),
            gram AS (SELECT a.item AS item_a, b.item AS item_b,
                            SUM(a.cnt*b.cnt) AS dot
                     FROM cells a JOIN cells b
                       ON a.ref = b.ref AND a.item <> b.item
                     GROUP BY 1, 2)
            SELECT g.item_a, g.item_b,
                   ROUND((n.n*g.dot - a.s*b.s)/(a.den*b.den), 6) AS corr
            FROM gram g JOIN vs a ON g.item_a = a.item
            JOIN vs b ON g.item_b = b.item, nn n
            WHERE (n.n*g.dot - a.s*b.s)/(a.den*b.den) >= -1.0
        """,
        "retrieve_topk_part": f"""
            {_ONE_ROW}
            SELECT r.item_b AS item_b_id, p.p_name AS item_name,
                   ROUND(r.corr, 6) AS scaled_score
            FROM row_ r JOIN part p ON r.item_b = p.p_partkey
            ORDER BY r.corr DESC, r.item_b ASC LIMIT 10
        """,
        "item_info": """
            SELECT p_partkey AS id, p_name AS key,
                   NULL::VARCHAR AS human_label
            FROM part WHERE p_partkey = 42
        """,
        "search_items": """
            SELECT p_partkey AS id, p_name AS key,
                   NULL::VARCHAR AS human_label
            FROM part
            WHERE lower(p_name) LIKE '%widget%'
               OR lower(NULL) LIKE '%widget%'
            ORDER BY p_name ASC, p_partkey ASC LIMIT 10
        """,
        "db_stats": """
            WITH items AS (SELECT COUNT(*) AS total_items FROM part),
            sims AS (SELECT COUNT(*) AS total_similarities FROM lineitem),
            per AS (SELECT l_partkey, COUNT(*) AS similarity_count
                    FROM lineitem GROUP BY 1),
            a AS (SELECT COALESCE(ROUND(AVG(similarity_count), 2), 0.0)
                    AS avg_similarities_per_item FROM per)
            SELECT items.total_items, sims.total_similarities,
                   a.avg_similarities_per_item
            FROM items, sims, a
        """,
    }
