"""Python user-defined TABLE functions (UDTF) — the Spark 4 API surface.

The reference's UDF surface is scalar-only (SURVEY.md §2.8 U1-U4); Spark 4
adds Python UDTFs — functions returning a TABLE, invoked laterally per
input row.  This module exercises that surface end-to-end (class with
``eval`` generator, ``returnType`` schema, ``spark.udtf.register``,
``LATERAL`` SQL join) on a deterministic chunker so the whole path is
oracle-checkable.

UDTFs are the SLOW path (row-at-a-time Python, like scalar Python UDFs):
the native twin of this exact computation is pipeline_chunk_overlap's
JVM-side sequence/substring chunker, which is what the hot path should
use.  Register a UDTF when the per-row expansion logic genuinely needs
Python (a tokenizer library, a parser) — and even then prefer
``mapInPandas`` if the logic is batchable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from pyspark_text_classification_spark.registry import query

UDTF_CHUNK_W = 120  # characters per chunk


class _ChunkUDTF:
    """Split one document into fixed-width character chunks."""

    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF protocol signature
        t = text or ""
        for i in range(0, len(t), UDTF_CHUNK_W):
            yield doc_id, i // UDTF_CHUNK_W, t[i : i + UDTF_CHUNK_W]


chunk_udtf = udtf(
    _ChunkUDTF,
    returnType="doc_id long, chunk_idx int, chunk_text string",
)


@query(
    "text_udtf_chunks",
    oracle=f"""
    SELECT d.doc_id,
           CAST(t.blk AS INT) AS chunk_idx,
           substr(d.text, CAST(t.blk * {UDTF_CHUNK_W} + 1 AS INT),
                  {UDTF_CHUNK_W}) AS chunk_text
    FROM documents d,
         LATERAL (
           SELECT unnest(range((length(d.text) + {UDTF_CHUNK_W} - 1)
                               // {UDTF_CHUNK_W})) AS blk
         ) t
    """,
)
def text_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width document chunking through a registered Python UDTF,
    invoked with LATERAL in SQL — one input row fans out to ceil(len/W)
    chunk rows.  Value-identical to the DuckDB substr unroll (ASCII
    corpus: Spark and DuckDB substr both index codepoints), proving the
    UDTF protocol (generator eval, typed returnType, lateral join)
    round-trips exactly.  Partition-local: the expansion happens in the
    Python worker feeding the scan's own partitions, no shuffle."""
    spark.udtf.register("doc_chunks", chunk_udtf)
    spark.read.parquet(f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.chunk_text
        FROM udtf_docs d, LATERAL doc_chunks(d.doc_id, d.text) c
        """
    )
