"""Raw text-line source: the very first step of corpus ingestion.

``spark.read.text`` yields one row per line with no parsing cost — the
right entry point for crawl dumps / log corpora before any structure is
imposed. ``wholetext=True`` reads one row per FILE (document-per-file
corpora); ``lineSep`` handles exotic delimiters. Column pruning/pushdown
don't apply (one opaque column) — the scan parallelizes by file split,
so the lever at 100 TB is file sizing (see parquet.compact_files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_lines(
    spark: SparkSession,
    path: str,
    whole_file: bool = False,
    line_sep: str | None = None,
    with_file: bool = False,
) -> DataFrame:
    """(value [, file]) rows from raw text files.

    ``with_file=True`` adds the source filename (provenance column every
    corpus pipeline wants; computed from split metadata, free)."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    df = reader.text(path, wholetext=whole_file)
    if with_file:
        df = df.withColumn("file", F.input_file_name())
    return df
