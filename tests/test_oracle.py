"""Local replica of the driver's DuckDB-oracle gate (SURVEY.md §5.2).

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the
same parquet, compares row count, column names, and order-insensitive
values (rounded floats). Default sf0.001 for speed; set
PROPIUS_ORACLE_SF_DIR=/root/testdata/sf0.01 to mirror the driver.
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("PROPIUS_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def _norm(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if isinstance(row, dict) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    if v == 0:
                        v = 0.0  # -0.0 → 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = [r.asDict() for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    ores = ddb.execute(sql)
    ocols_raw = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in ocols_raw
    ), f"{name}: column mismatch spark={scols} oracle={ocols_raw}"
    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    got = _norm(srows, scols)
    # map oracle tuples into same sorted-column order
    idx = [ocols_raw.index(next(o for o in ocols_raw if o.lower() == c.lower()))
           for c in scols]
    want = _norm([[r[i] for i in idx] for r in orows], list(range(len(scols))))
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, f"{name}: {len(mism)} value mismatches; first: {mism[:3]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.columns) > 0


def test_register_model_views_sql_serving(spark, tmp_path):
    """Published tables registered as temp views serve the reference's
    SQL statements verbatim through spark.sql (SURVEY.md §3.3)."""
    from pyspark.sql import functions as F

    from propius_spark.operators import publish_model
    from propius_spark.serving import register_model_views
    from propius_spark.session import clear_materialized

    sf_dir = SF_DIR
    occ = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("reference_id"),
        F.col("l_partkey").alias("item_id"),
    )
    dim = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.col("p_partkey").alias("id"), F.col("p_name").alias("title")
    )
    paths = publish_model(occ, dim, str(tmp_path / "model"), n_buckets=4)
    clear_materialized(spark)
    register_model_views(spark, paths)

    # SELECT * shape = the reference's 3-column DDL: the bucketed
    # store's internal layout columns must not leak into the view
    assert sorted(spark.table("similar_items").columns) == [
        "item_a_id", "item_b_id", "scaled_score",
    ]

    row = spark.sql(
        """SELECT COUNT(*) AS total_similarities,
                  (SELECT COUNT(*) FROM correlated_items) AS total_items
           FROM similar_items"""
    ).first()
    assert row.total_similarities > 0 and row.total_items > 0

    top = spark.sql(
        """SELECT si.item_b_id, ci.key, si.scaled_score
           FROM similar_items si JOIN correlated_items ci
             ON si.item_b_id = ci.id
           ORDER BY si.scaled_score DESC LIMIT 5"""
    ).collect()
    assert 0 < len(top) <= 5 and top[0].key is not None


def test_retrieve_similar_batch_equals_point_calls(spark):
    """Bulk retrieval ≡ per-item retrieve_similar_items results for
    each requested id, including bucket pruning."""
    from propius_spark.serving import (
        retrieve_similar_batch,
        retrieve_similar_items,
    )

    sims = spark.createDataFrame(
        [(a, b, float(a * 10 + b) / 100, (a % 4))
         for a in range(6) for b in range(6) if a != b],
        "item_a_id long, item_b_id long, scaled_score double, bucket int",
    )
    dim = spark.createDataFrame(
        [(i, f"name{i}", None) for i in range(6)],
        "id long, key string, human_label string",
    )
    batch = retrieve_similar_batch(sims, dim, [1, 3], k=3, n_buckets=4)
    got = {}
    for r in batch.collect():
        got.setdefault(r.item_a_id, []).append(
            (r.rn, r.item_b_id, r.item_name, r.scaled_score)
        )
    for item in (1, 3):
        want = [
            (j + 1, r.item_b_id, r.item_name, r.scaled_score)
            for j, r in enumerate(
                retrieve_similar_items(sims, dim, item, limit=3, n_buckets=4).collect()
            )
        ]
        assert sorted(got[item]) == want, item


def test_serving_twins_documented_missing_dim_postures(spark):
    """The two serving twins take DELIBERATELY different missing-dim
    postures (pinned here so a drift in either direction fails): the
    point path is reference parity (data.py:233-247 joins first, so
    the next-ranked NAMED neighbor fills the top-k — what the
    reference's SQL returns on a name-deduped published store); the
    batch path ranks on the fact table first, so a missing dim row is
    a gap (rank stability for bulk exports)."""
    from propius_spark.serving import (
        retrieve_similar_batch,
        retrieve_similar_items,
    )

    sims = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)],
        "item_a_id long, item_b_id long, scaled_score double",
    )
    dim = spark.createDataFrame(  # id 10 (the top neighbor) is missing
        [(11, "eleven", None), (12, "twelve", None)],
        "id long, key string, human_label string",
    )
    # point twin: reference semantics — next named neighbor promoted
    point = retrieve_similar_items(sims, dim, 1, limit=1).collect()
    assert [(r.item_b_id, r.item_name) for r in point] == [(11, "eleven")]
    # batch twin: fact-table rank — rank 1 is missing from the dim, gap
    batch = retrieve_similar_batch(sims, dim, [1], k=1).collect()
    assert [r.item_b_id for r in batch] == []
