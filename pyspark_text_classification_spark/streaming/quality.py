"""Stateless streaming corpus filtering.

The other streaming operators (tumbling aggregate, sessionize, dedup,
interval join) are all STATEFUL; this is the stateless shape — a pure
column program applied per micro-batch with append output and no state
store — which is how quality gating runs in a live ingestion pipeline:
filter at the edge, before anything shuffles or accumulates.

The column program is operators/textstats.quality_stats, shared verbatim
with the batch text_quality query, so the streaming result is held to the
same DuckDB oracle as a batch run over the same files.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.operators.textstats import (
    QUALITY_ORACLE_SQL,
    quality_stats,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.infer import (
    DOCS_STREAM_SCHEMA,
)

QUALITY_MIN = 0.2  # keep threshold for the streaming gate
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(documents) -> quality_stats -> stateless filter ->
    append-mode memory sink, drained with availableNow."""
    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    kept = quality_stats(src).filter(F.col("quality_score") >= QUALITY_MIN)
    sink_name = f"stream_quality_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            kept.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


query(
    "pipeline_stream_quality_filter",
    oracle=f"""
    SELECT * FROM ({QUALITY_ORACLE_SQL})
    WHERE quality_score >= {QUALITY_MIN}
    """,
)(stream_quality_filter)
