"""Parquet IO + testdata loaders (SURVEY.md §2.1 S4/S5 made distributed).

The reference's only parquet write is a driver-side
``pandas.DataFrame.to_parquet`` after a full collect
(transformers_test.py:377) — at 100 TB that is a driver OOM. The engine
always writes distributed parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (TESTDATA.md) as a DataFrame.

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark 4 rejects by
    default (PARQUET_TYPE_ILLEGAL); the legacy conf reads it as a long of
    epoch nanoseconds, and queries derive micro/second timestamps from it
    (exact integer division — no float drift vs the DuckDB oracle).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Distributed parquet sink; partition_by for partition-pruned reads."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
