"""JSON-Lines source/sink — the interchange format LLM training corpora
actually ship in (one JSON object per line; e.g. the common
``{"text": ..., "meta": {...}}`` corpus layout).

Extension beyond the reference's CSV/TSV surface (SURVEY.md §2.1), built
on the same rule as sources/csv.py: an EXPLICIT schema is required.
Spark's JSON schema inference is a full extra pass over the corpus, and
at 100 TB a malformed-record policy must be declared, not discovered —
so ``mode`` defaults to PERMISSIVE with a corrupt-record column the
caller can route to a quarantine sink, and FAILFAST is one flag away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "PERMISSIVE",
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSONL scan with explicit schema.

    ``keep_corrupt=True`` appends ``_corrupt_record`` (the raw line for
    rows that failed to parse, NULL for clean rows) so a cleaning
    pipeline can count/quarantine junk lines instead of silently
    null-filling them; with the default False the column is dropped and
    unparseable lines surface as all-NULL rows (PERMISSIVE) or errors
    (FAILFAST).
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
        schema = schema.add(CORRUPT_COL, "string")
    df = (
        spark.read.format("json")
        .schema(schema)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .load(path)
    )
    if not keep_corrupt and CORRUPT_COL in df.columns:
        df = df.drop(CORRUPT_COL)
    return df


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Distributed JSONL sink: one file per partition, no driver collect;
    ``partition_by`` for hive-style partition-pruned layouts."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def corrupt_line_stats(df: DataFrame, anchor: str | None = None) -> DataFrame:
    """(n_rows, n_corrupt, n_nonnull_<anchor>): the quarantine counter for
    a ``read_jsonl(keep_corrupt=True)`` frame — one aggregate, no shuffle
    of the data rows.

    A data column is counted alongside the corrupt column because Spark
    disallows queries whose referenced columns are ONLY the internal
    corrupt-record column on a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — anchoring on
    a real field keeps the aggregate a single pass with no cache, and the
    non-null count of a required field is the quality stat a cleaning
    pipeline wants anyway."""
    anchor = anchor or next(c for c in df.columns if c != CORRUPT_COL)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.col(CORRUPT_COL)).alias("n_corrupt"),
        F.count(F.col(anchor)).alias(f"n_nonnull_{anchor}"),
    )
