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

    NOTE: the conf is SESSION-WIDE and intentionally left set (the engine's
    own session factory already declares it at build time; setting it here
    too covers driver-provided vanilla sessions). It only affects
    TIMESTAMP(NANOS) parquet columns — the MILLIS/MICROS tables are
    untouched — and every engine query expects the long-typed reading, so
    leaving it set is the declared engine contract, not a leak.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def fan_out(df: DataFrame, per_core: int = 1) -> DataFrame:
    """Round-robin repartition to cluster parallelism.

    Small single-file parquet inputs arrive as ONE partition; any
    compute-heavy per-row work downstream (higher-order-function folds,
    cross joins, shingle explosion) would then run in a single task. On a
    real cluster the same hazard appears whenever file count << cores.
    Cheap for small inputs, and for large inputs the repartition cost is
    dwarfed by the compute it parallelizes. Row values are unchanged —
    round-robin repartition sorts batches locally for determinism.
    """
    if df.isStreaming:  # partition count is the source's concern per batch
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * per_core
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df


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
