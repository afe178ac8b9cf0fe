"""Streaming model inference: the batch mapInPandas inference path
(ml/inference.batch_infer) applied to an unbounded source.

``mapInPandas`` composes directly with Structured Streaming — the same
Arrow-batched, per-worker-singleton operator serves both modes, which is
the engine's answer to the reference's batch-only grouped-map UDF
(SURVEY.md §2.8 U4/U6): one inference implementation, two execution modes.
No shuffle, no state: each micro-batch's partitions stream through the
Python worker independently, so throughput scales with source parallelism.

Declared with the SAME DuckDB oracle as ml_infer_batch — on a fully
drained replay the streaming plan must produce identical predictions.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from pyspark_text_classification_spark.functions.hashing import (
    sql_char_poly_hash,
)
from pyspark_text_classification_spark.ml.inference import batch_infer
from pyspark_text_classification_spark.registry import query

DOCS_STREAM_SCHEMA = (
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
)


def stream_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(documents) -> mapInPandas stub inference -> memory sink,
    drained with availableNow; returns a batch DataFrame."""
    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    preds = batch_infer(src, text_col="text", id_col="doc_id")
    sink_name = f"stream_infer_{uuid.uuid4().hex[:8]}"
    q = (
        preds.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)


query(
    "ml_infer_stream",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {sql_char_poly_hash("substr(text, 1, 256)")} AS hh
      FROM documents
    )
    SELECT doc_id,
           CAST(hh % 2 AS INTEGER) AS predicted_label,
           0.5 + (hh % 1000) / 2000.0 AS confidence
    FROM h
    """,
)(stream_infer)
