"""Model (correlation-pairs table) persistence.

Replaces the reference's dense-matrix save/load
(propius/similarity.py:170-207: CSV via pandas, `.npy` via numpy, and a
documented-but-unimplemented "pickle" that raises). The engine's model
is the long-form pairs DataFrame; parquet is the canonical format (CSV
kept for interchange parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_pairs(pairs: DataFrame, path: str, fmt: str = "parquet") -> None:
    if fmt == "parquet":
        pairs.write.mode("overwrite").parquet(path)
    elif fmt == "csv":
        pairs.write.mode("overwrite").option("header", "true").csv(path)
    else:
        raise ValueError(f"Unsupported format: {fmt}")


def load_pairs(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.parquet(path)
    elif fmt == "csv":
        return (
            spark.read.option("header", "true")
            .schema("item_a long, item_b long, corr double")
            .csv(path)
        )
    else:
        raise ValueError(f"Unsupported format: {fmt}")
