"""ORC source/sink (IO-matrix extension beyond the reference's CSV/parquet —
SURVEY.md §2.1 S1/S5 generalized to the second columnar format Spark ships
a vectorized reader for).

Same contract as the parquet/CSV sources: explicit schema in, distributed
write out, predicate pushdown and column pruning reach the scan (ORC keeps
min/max stripe statistics, so pushed filters skip whole stripes the same
way parquet row-group stats do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """ORC scan. ``schema`` skips footer inference (one less metadata pass
    over the file listing — at 100 TB that listing is itself a job);
    ``merge_schema`` reconciles evolved schemas across files."""
    reader = spark.read.format("orc")
    if schema is not None:
        reader = reader.schema(schema)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.load(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """Distributed ORC write (zstd by default — same ratio class as parquet's
    default, decodes faster than zlib). ``partition_by`` lays out
    hive-style directories so downstream reads prune partitions."""
    writer = df.write.format("orc").mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
