"""Occurrence-log ingestion.

Replaces the reference's chunked pandas readers and URI dispatch
(reference propius/utils.py:6-35). Spark's reader already resolves the
URI scheme (`file://`, `s3a://`, `hdfs://`) and partitions the scan, so
the reference's three functions collapse into one: a thin wrapper that
applies the canonical schema. The reference's `occurrences_size`
pre-allocation parameter (propius/similarity.py:63) is an artifact of
building COO triplet arrays and is dropped entirely.

S3 credentials: Spark picks up `spark.hadoop.fs.s3a.access.key` /
`secret.key` conf or the standard AWS env vars via the default
credential provider chain — the reference read the same env vars
manually (propius/utils.py:16-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import OCCURRENCES, OCCURRENCES_STR_REF, require_columns


def load_occurrences(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    header: bool = True,
    string_reference: bool = False,
) -> DataFrame:
    """Load a co-occurrence event log as (reference_id, item_id).

    `fmt` is inferred from the extension when not given
    (csv/json/parquet/orc); an extension-less path raises rather than
    guessing — the old csv fallback silently parsed parquet/orc
    DIRECTORIES (the standard extension-less Spark write layout) as
    permissive-mode CSV, yielding all-NULL rows instead of an error.
    `s3://` paths are rewritten to `s3a://` (the Hadoop S3 connector).
    All formats come back in the canonical schema: self-describing
    formats (parquet/orc) are CAST to it, so `string_reference` and
    the long item typing hold regardless of how the file was written.
    """
    if not path:
        raise ValueError("path is required")
    if path.startswith("s3://"):
        path = "s3a://" + path[len("s3://"):]
    if fmt is None:
        for ext in ("parquet", "json", "orc", "csv"):
            if path.endswith("." + ext):
                fmt = ext
                break
        else:
            raise ValueError(
                f"load_occurrences: cannot infer format from {path!r} "
                "(no .csv/.json/.parquet/.orc extension) — pass fmt= "
                "explicitly; guessing csv here silently misparses "
                "binary formats"
            )
    schema = OCCURRENCES_STR_REF if string_reference else OCCURRENCES
    if fmt == "csv":
        df = spark.read.schema(schema).option("header", str(header).lower()).csv(path)
    elif fmt == "json":
        df = spark.read.schema(schema).json(path)
    elif fmt in ("parquet", "orc"):
        raw = spark.read.parquet(path) if fmt == "parquet" else spark.read.orc(path)
        require_columns(raw, ["reference_id", "item_id"], "load_occurrences")
        # enforce the canonical types, not just the names: a parquet
        # file with string ids otherwise flowed through untyped and
        # broke long-key joins downstream
        df = raw.select(
            F.col("reference_id").cast(schema["reference_id"].dataType),
            F.col("item_id").cast(schema["item_id"].dataType),
        )
    else:
        raise ValueError(f"unsupported occurrences format: {fmt}")
    require_columns(df, ["reference_id", "item_id"], "load_occurrences")
    return df


def occurrences_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Parts bought together': lineitem → (order, part) co-occurrences.

    The flagship fixture mapping (FIXTURES.md §4): l_orderkey is the
    context, l_partkey the item. Column pruning means the parquet scan
    reads exactly these two columns.
    """
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("reference_id"),
        F.col("l_partkey").alias("item_id"),
    )


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table regardless of session defaults.

    Event timestamps arrive in two parquet encodings depending on the
    writer: INT64 TIMESTAMP(NANOS), which a default SparkSession
    refuses to read (PARQUET_TYPE_ILLEGAL) unless
    `spark.sql.legacy.parquet.nanosAsLong` is set, and
    TIMESTAMP(MICROS, isAdjustedToUTC=false), which reads natively as
    TIMESTAMP_NTZ. The plain read is attempted FIRST; only when the
    legacy-nanos encoding is actually present does this fall back to
    setting `nanosAsLong` — and that setting is SESSION-WIDE (the
    option has no per-read form): every later parquet read in the
    session will then decode TIMESTAMP(NANOS) columns as long nanos.
    Downstream event-time operators normalize either shape through
    `_ts_micros` (operators/sessions.py).
    """
    path = f"{sf_dir}/events.parquet"
    try:
        return spark.read.parquet(path)
    except Exception as e:
        # Only the nanos-encoding failure justifies flipping the
        # session-wide legacy conf — a missing path or any unrelated
        # error must NOT change how every later parquet read in the
        # session decodes TIMESTAMP(NANOS) columns
        msg = str(e)
        if "PARQUET_TYPE_ILLEGAL" not in msg and "NANOS" not in msg:
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def occurrences_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User–event-type co-occurrences from the events table.

    event_type is dense-coded to a stable long id by hashing into an
    ordinal via a join against the distinct set — tiny dimension, so the
    join broadcasts.

    NULL event_type is excluded EXPLICITLY (and mirrored in the oracle
    twin): the inner join would silently drop such rows anyway, but a
    NULL row in the distinct set would also consume a dense_rank slot
    — with ENGINE-SPECIFIC placement (Spark sorts NULLS FIRST, DuckDB
    NULLS LAST), shifting every real item id by one on one side only.
    With the filter, ids are 0..K−1 over real types and stable whether
    or not the data carries NULLs.
    """
    ev = (
        read_events(spark, sf_dir)
        .select("user_id", "event_type")
        .filter(F.col("event_type").isNotNull())
    )
    types = ev.select("event_type").distinct()
    coded = types.select(
        "event_type",
        (F.dense_rank().over(Window.orderBy("event_type")) - 1).alias("item_id"),
    )
    return ev.join(F.broadcast(coded), "event_type").select(
        F.col("user_id").alias("reference_id"), F.col("item_id").cast("long").alias("item_id")
    )
