"""Document chunking and sequence packing — the two reshaping ops a
training pipeline runs between "clean corpus" and "training batches".

Both are pure Catalyst (array expressions + one window), fully
replayable by a SQL oracle, and deliberately deterministic: a chunk or
bin assignment must not depend on partitioning or execution order, or
re-runs produce different training data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import tokens
from ..schemas import require_columns


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens`` with
    ``overlap`` tokens shared between consecutive chunks (stride =
    chunk_tokens − overlap): (doc_id, chunk_id, chunk_text, n_tokens).
    Chunk i covers tokens [i·stride, i·stride + chunk_tokens); starts
    run at 0, stride, 2·stride, ... < n, so trailing chunks may be
    short. Empty docs produce no chunks. A trailing start that adds no
    NEW tokens (s ≥ n − overlap with s > 0: the window is fully inside
    the previous chunk's overlap region) is dropped — emitting it
    duplicated training content verbatim.

    OUTPUT IS NORMALIZED TEXT, not a byte slice of the original:
    chunk_text is rebuilt from the shared tokens() stream, so it is
    lowercased with all whitespace runs collapsed to single spaces
    (oracle-pinned parity). Pipelines that must preserve casing/layout
    should chunk on their own token offsets over the raw string; this
    operator's contract is token-budgeted TRAINING chunks over the
    family's canonical tokenization.

    Map-side only — tokenize, window-slice, and explode are per-row
    array expressions fused into the scan; output cardinality is
    Σ⌈n_i/stride⌉ rows. No shuffle at any scale.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    require_columns(docs, [id_col, text_col], "chunk_documents")
    stride = chunk_tokens - overlap
    t = tokens(F.col(text_col))
    starts = F.filter(
        F.sequence(F.lit(0), F.size("__t") - 1, F.lit(stride)),
        lambda s: (s == 0) | (s < F.size("__t") - overlap),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), t.alias("__t"))
        .filter(F.size("__t") > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    starts, lambda s: F.slice("__t", s + 1, chunk_tokens)
                )
            ).alias("chunk_id", "__c"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", "__c").alias("chunk_text"),
            F.size("__c").cast("long").alias("n_tokens"),
        )
    )


def pack_documents(
    docs: DataFrame,
    target_tokens: int = 2048,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequence packing: assign whole documents to training
    bins of ~``target_tokens``, returning (shard, bin_id, doc_id,
    n_tokens). Documents are packed in doc-id order within
    ``n_shards`` deterministic shards (shard = doc_id mod n_shards);
    a doc lands in the bin where its running token total starts
    (bin_id = prefix_sum_before div target), so bins overflow by at
    most one document — the standard greedy concat-and-cut packing.

    Scale: the running sum is a per-shard window — one shuffle on the
    shard key and n_shards-way parallelism (never a single global
    ordering task); raise n_shards with cluster size. Deterministic in
    (doc_id, n_shards, target) — independent of physical partitioning,
    so re-runs and the SQL oracle agree row-for-row.
    """
    require_columns(docs, [id_col, text_col], "pack_documents")
    # validate like chunk_documents: without these, a bad target made
    # `div 0` yield NULL bin ids and a bad shard count made pmod yield
    # one NULL shard — corrupt training bins, silently
    if target_tokens < 1:
        raise ValueError(f"pack_documents: target_tokens must be >= 1, got {target_tokens}")
    if n_shards < 1:
        raise ValueError(f"pack_documents: n_shards must be >= 1, got {n_shards}")
    id_type = docs.schema[id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"pack_documents: {id_col} must be an integer column for the "
            f"deterministic shard/order arithmetic, got {id_type}"
        )
    nt = F.size(tokens(F.col(text_col)))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        nt.cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return (
        base.select(
            "shard",
            "doc_id",
            "n_tokens",
            (cum - F.col("n_tokens")).cast("long").alias("__before"),
        )
        .select(
            "shard",
            # integer div, not `/`: double division loses exactness
            # past 2^53 cumulative tokens and can round across a bin
            # boundary; the oracle uses integer // (repo convention)
            F.expr(f"__before div {int(target_tokens)}").alias("bin_id"),
            "doc_id",
            "n_tokens",
        )
    )
