"""Bucketed-table sink: pre-shuffled on-disk layout for co-located joins.

At 100 TB the recurring cost of a fact-fact join is the shuffle of BOTH
sides on the join key, every time the join runs.  Bucketing pays that
shuffle ONCE at write time: ``bucketBy(n, key)`` hash-partitions rows into
n files per directory and records the layout in the catalog, so any later
equi-join (or aggregate) on the bucket key reads both sides already
co-partitioned — Spark plans a SortMergeJoin with NO Exchange on either
side (``tests/test_sources.py`` pins exactly that plan).

Spark's bucketing lives behind the table catalog (``saveAsTable`` — plain
``.parquet(path)`` cannot record bucket metadata), so this module routes
through the session catalog with an explicit ``path`` option: data stays
in the caller's directory, only metadata lives in the warehouse.  Notes
for a real deployment:

- both sides must use the SAME bucket count (or a divisor under
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``) for the
  exchange-free plan;
- ``sortBy`` on the bucket key additionally removes the per-task Sort
  from the merge join;
- bucket pruning applies equality filters on the bucket key at scan time
  (only 1/n of files read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally bucket-sorted) parquet
    table registered as ``table``; files land under ``path``."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucket layout (outputPartitioning =
    HashPartitioning(bucket_col, n) — the property the join planner uses
    to elide the Exchange)."""
    return spark.table(table)
