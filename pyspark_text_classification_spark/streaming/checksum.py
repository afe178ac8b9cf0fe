"""Streaming ingest integrity: the running XOR content checksum of
everything consumed so far, held to the batch table checksum.

The batch twin (operators/pipeline.pipeline_table_checksum) proves a
copy after the fact; this proves an INGEST as it happens — each
micro-batch folds its rows' hashes into a complete-mode global XOR
aggregate, so at any trigger the sink holds the checksum of the exact
row set consumed, and a drained run must equal the batch checksum over
the same files (the oracle).  XOR's self-inverse property is what makes
the state O(1): the aggregate buffer is one int64 regardless of volume.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import char_poly_hash
from pyspark_text_classification_spark.operators.pipeline import (
    _CK_MOD,
    _CK_MULT,
    _DOC_ROW_SQL,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.infer import DOCS_STREAM_SCHEMA
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def stream_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(documents) -> per-row Horner hash -> complete-mode
    global (count, bit_xor) aggregate -> drain."""
    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    row_h = (F.col("doc_id") * _CK_MULT + char_poly_hash("text")) % _CK_MOD
    agg = src.select(row_h.alias("h")).agg(
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(h)").cast("long").alias("checksum"),
    )
    sink_name = f"stream_ck_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


query(
    "pipeline_stream_checksum",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor({_DOC_ROW_SQL}) AS BIGINT) AS checksum
    FROM documents
    """,
)(stream_checksum)
