"""Streaming exact deduplication: the batch dedup_exact semantics over an
unbounded source.

Keyed by the cross-engine polynomial text hash (not the raw string) so the
streaming state per distinct document is one long + the running keeper id
instead of the full text — the state-size discipline that matters when the
stream is a 100 TB backfill. Aggregation state (min doc_id, count per hash)
lives in the streaming state store partitioned by key; ``complete`` output
mode re-emits the table per trigger, drained here with availableNow.

Declared with a full DuckDB oracle: on a drained replay the stateful
aggregate must equal the batch GROUP BY. (Spark's own
``dropDuplicates``-on-stream keeps an arbitrary first row per key —
nondeterministic across partitions reorders — so the engine's streaming
dedup is the min-keeper aggregate, same policy as the batch operator.)
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    char_poly_hash,
    sql_char_poly_hash,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.infer import (
    DOCS_STREAM_SCHEMA,
)
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def stream_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(documents) -> groupBy(text hash) -> (min keeper, count)
    -> memory sink, drained with availableNow."""
    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    dedup = (
        src.select(char_poly_hash("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )
    sink_name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            dedup.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


query(
    "dedup_stream_exact",
    oracle=f"""
    SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY {sql_char_poly_hash('text')}
    """,
)(stream_dedup_exact)
