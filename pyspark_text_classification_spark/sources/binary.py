"""Binary-file source: the ingestion path for multimodal corpora.

``spark.read.format("binaryFile")`` turns a directory of media files
(images, audio, video, PDFs) into a DataFrame of
``(path, modificationTime, length, content binary)`` — the entry point
that feeds operators/multimodal.py's decode / feature / resize stages.

Scale notes (100 TB of media):
- one ROW per file: fine for media corpora (files are the natural unit),
  but millions of tiny files bottleneck on driver-side file listing —
  pack small assets into parquet (multimodal.py's payload+meta layout)
  or raise ``spark.sql.files.maxPartitionBytes``-adjacent listing
  parallelism via more, larger directories.
- ``pathGlobFilter`` prunes by extension BEFORE any byte is read, and
  predicate pushdown on ``length`` skips oversized payloads at the
  listing level (both are scan options, not post-filters).
- the ``content`` column is the whole file; project it away (or filter
  first) when only metadata is needed — column pruning keeps unread
  payloads on disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    max_bytes: int | None = None,
) -> DataFrame:
    """(path, modificationTime, length, content) — one row per file.

    ``glob`` (e.g. ``*.png``) filters at the listing, ``recursive``
    descends subdirectories, ``max_bytes`` drops oversized files via a
    pushed-down length predicate (the file is never opened)."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def binary_files_meta(df: DataFrame) -> DataFrame:
    """Metadata-only projection (path, name, length): prunes the payload
    column so the scan reads file statistics, not file bytes."""
    return df.select(
        "path",
        F.element_at(F.split(F.col("path"), "/"), -1).alias("name"),
        "length",
    )
