"""Decade-scale the sf0.1 testdata into a scratch sf1.0 replica.

/root/testdata is read-only and tops out at sf0.1; the scale-smoke
series (SCALE.md) wants one more decade for the five heavy queries.
This script builds it the way TPC-H itself scales — every keyed
dimension grows with SF — by stacking REPLICAS of sf0.1 with disjoint
key ranges, so degree/size DISTRIBUTIONS stay identical while
cardinalities grow 10x (items 20k->200k, contexts 150k->1.5M, docs
5k->50k, vectors 2k->20k). A naive row-copy without key offsets would
instead multiply every context's DEGREE by 10 and explode pair outputs
~100x — that benchmarks a different (quadratically harder) workload,
not the same workload one decade up.

Cross-replica decorrelation (so near-dup workloads scale 10x, not 100x):
- documents: every token in replica r>0 is prefixed `r{r}x`, which
  renames all shingles -> cross-replica Jaccard/MinHash/SimHash
  similarity is 0 while within-replica structure is bit-identical.
- embeddings: replica r>0 applies one deterministic orthogonal-ish map
  (circular component roll by 7r + a per-replica Rademacher sign
  pattern). Norms and within-replica cosines are EXACTLY preserved;
  cross-replica cosines scatter to ~0 for generic vectors.

Deterministic (fixed seeds, no wall clock). Writes OUT_DIR (default
.scratch/sf1.0 under the repo root — gitignored scratch, never
/root/testdata). Usage:

    python scripts/make_scale_data.py [out_dir] [n_replicas]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / ".scratch" / "sf1.0"
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    def key_max(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) FROM '{SRC}/{table}.parquet'"
        ).fetchone()[0]

    # stride = next power of 10 above the max key, so replica key ranges
    # are disjoint AND human-readable (replica of key k is r*stride + k)
    def stride(table: str, col: str) -> int:
        s = 1
        while s <= key_max(table, col):
            s *= 10
        return s

    so = stride("orders", "o_orderkey")
    sp = stride("part", "p_partkey")
    ss = stride("supplier", "s_suppkey")
    sc = stride("customer", "c_custkey")
    sd = stride("documents", "doc_id")
    sv = stride("embeddings", "vec_id")
    se = stride("events", "event_id")
    su = stride("events", "user_id")

    def replicate(table: str, select_tpl: str) -> None:
        """UNION ALL of n_rep replicas; {r} is the 0-based replica id."""
        union = " UNION ALL ".join(
            f"SELECT {select_tpl.format(r=r)} FROM '{SRC}/{table}.parquet'"
            for r in range(n_rep)
        )
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )

    # fixed-size dims: copy as-is (nation/region are constant in TPC-H)
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO"
            f" '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )

    replicate(
        "lineitem",
        f"l_orderkey + {{r}}*{so} AS l_orderkey,"
        f" l_partkey + {{r}}*{sp} AS l_partkey,"
        f" l_suppkey + {{r}}*{ss} AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate",
    )
    replicate(
        "orders",
        f"o_orderkey + {{r}}*{so} AS o_orderkey,"
        f" o_custkey + {{r}}*{sc} AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    # dim names get a replica suffix so name-keyed joins/search stay
    # selective instead of 10-way colliding
    replicate(
        "part",
        f"p_partkey + {{r}}*{sp} AS p_partkey,"
        " p_name || ' #r' || {r} AS p_name,"
        " p_brand, p_type, p_size, p_retailprice",
    )
    replicate(
        "supplier",
        f"s_suppkey + {{r}}*{ss} AS s_suppkey,"
        " s_name || ' #r' || {r} AS s_name, s_nationkey, s_acctbal",
    )
    replicate(
        "customer",
        f"c_custkey + {{r}}*{sc} AS c_custkey, * EXCLUDE (c_custkey)",
    )
    replicate(
        "events",
        f"event_id + {{r}}*{se} AS event_id, ts,"
        f" user_id + {{r}}*{su} AS user_id, event_type, value, props",
    )
    # documents: token-prefix replicas r>0 (shingle-space disjointness).
    # The text rewrite happens in an inner subquery and length() in the
    # outer select, so n_chars unambiguously measures the REWRITTEN
    # text in one COPY (ADVICE r6: the old form leaned on lateral-alias
    # binding of length(text) and needed a second full COPY to fix up)
    union = " UNION ALL ".join(
        "SELECT doc_id, text, lang, source, length(text) AS n_chars "
        "FROM (SELECT "
        + f"doc_id + {r}*{sd} AS doc_id, "
        + (
            "text"
            if r == 0
            else rf"regexp_replace(text, '(\S+)', 'r{r}x\1', 'g') AS text"
        )
        + f", lang, source FROM '{SRC}/documents.parquet')"
        for r in range(n_rep)
    )
    con.execute(
        f"COPY ({union}) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)"
    )

    # embeddings: numpy roll + Rademacher signs per replica
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_ids = tbl.column("vec_id").to_numpy()
    labels = tbl.column("label").to_numpy()
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    out_ids, out_lbl, out_emb = [], [], []
    for r in range(n_rep):
        rng = np.random.default_rng(1_000_003 + r)
        signs = (
            np.ones(dim, dtype=np.float32)
            if r == 0
            else rng.choice(np.float32([-1.0, 1.0]), size=dim)
        )
        rolled = emb if r == 0 else np.roll(emb, 7 * r, axis=1)
        out_ids.append(vec_ids + r * sv)
        out_lbl.append(labels)
        out_emb.append(rolled * signs)
    all_emb = np.concatenate(out_emb)
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(all_emb.reshape(-1), type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
                "embedding": arr,
                "label": pa.array(
                    np.concatenate(out_lbl), type=pa.int32()
                ),
            }
        ),
        f"{out_dir}/embeddings.parquet",
    )

    for t in (
        "region nation customer supplier part orders lineitem events"
        " documents embeddings"
    ).split():
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
