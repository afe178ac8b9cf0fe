"""Schema-declared delimited-text sources (SURVEY.md §2.1 S1-S3).

The reference reads every dataset with ``inferSchema=True`` (qnli_test.py:66,
qqp_test.py:28, sst2_test2.py:34), which double-scans the file and is brittle
at scale; at 100 TB an inference pass is a full extra read of the corpus.
The engine requires an explicit schema and exposes the reference's
quote/escape TSV mode (qqp_test.py:25-31) as a flag.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_tsv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = "\t",
    header: bool = True,
    quoted: bool = False,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """CSV/TSV scan with explicit schema.

    ``quoted=True`` reproduces the RFC-4180-ish handling of embedded
    tabs/quotes the reference needs for QQP (qqp_test.py:29-30:
    quote='"', escape='"').
    """
    reader = (
        spark.read.format("csv")
        .schema(schema)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", mode)
    )
    if quoted:
        reader = reader.option("quote", '"').option("escape", '"')
    return reader.load(path)


def normalize_columns(
    df: DataFrame,
    column_mapping: Mapping[str, str],
    keep: list[str] | None = None,
) -> DataFrame:
    """Declarative column-mapping layer generalizing the reference's
    per-task rename loop (transformers_test.py:66-92).

    ``column_mapping`` maps source column -> engine column; ``keep`` is the
    final projection (defaults to the mapped names). Implemented as a single
    select so Catalyst sees one projection (column pruning reaches the scan).
    """
    from pyspark.sql import functions as F

    cols = [F.col(src).alias(dst) for src, dst in column_mapping.items()]
    out = df.select(*cols)
    if keep:
        out = out.select(*keep)
    return out


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    """S4 CSV sink (sst2_test2.py:225-227), distributed: one file per
    partition — no driver collect. Prefer parquet for anything machine-read;
    CSV exists for the reference's prediction-export parity."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def read_tsv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = "\t",
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE scan that splits clean rows from malformed ones.

    Returns ``(clean, quarantine)``: malformed lines (wrong arity,
    uncastable cells) land in the quarantine frame with the raw line
    preserved in ``corrupt_col`` for replay/repair — the same
    dead-letter contract as the JSONL source (sources/jsonl.py), so a
    feed with 0.01% garbage keeps flowing at 100 TB instead of failing
    the job (FAILFAST) or silently dropping rows (DROPMALFORMED).

    The corrupt-record column must be part of the declared schema;
    Spark requires the frame to be cached before the corrupt column is
    filterable (SPARK-38523) — done here, scoped to the split."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    full = (
        StructType.fromDDL(schema) if isinstance(schema, str) else schema
    ).add(corrupt_col, StringType())
    df = (
        spark.read.format("csv")
        .schema(full)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .load(path)
        .cache()
    )
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, quarantine
