"""Streaming Count-Min sketch: the live heavy-hitter state of an ingest.

The batch twin (operators/sketches.sketch_cms_heavy_hitters) builds the
sketch after the fact; this maintains it AS the corpus streams in.  CMS
is linear, so a complete-mode (row_id, cell) sum over the exploded token
stream IS the sketch — each micro-batch's partial counts merge into the
state-store cells exactly like map-side partials merge in batch, and a
drained run must equal the batch sketch over the same files (the
oracle).  The state is bounded at depth x width cells regardless of
stream volume — the property that makes CMS the standard streaming
frequency sketch.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    HASH_MOD,
    char_poly_hash,
    sql_char_poly_hash,
)
from pyspark_text_classification_spark.functions.text import tokenize
from pyspark_text_classification_spark.operators.sketches import (
    CMS_PARAMS,
    CMS_WIDTH,
    _cms_cell_sql,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.infer import DOCS_STREAM_SCHEMA

_SQL_TOKS = (
    r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"
)
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def cms_sketch_frame(src: DataFrame) -> DataFrame:
    """The sketch dataflow over any documents frame (batch OR stream):
    explode tokens, hash each to its {len(CMS_PARAMS)} cells, count per
    (row_id, cell).  Shared by the registered streaming query and the
    multi-batch test so both exercise the production plan."""
    toks = src.select(
        F.explode(tokenize("text", 2)).alias("term")
    ).withColumn("h", char_poly_hash("term"))
    cells = None
    for i, a, b in CMS_PARAMS:
        part = toks.select(
            F.lit(i).alias("row_id"),
            (((a * F.col("h") + b) % HASH_MOD) % CMS_WIDTH).alias("cell"),
        )
        cells = part if cells is None else cells.unionByName(part)
    return cells.groupBy("row_id", "cell").agg(
        F.count("*").alias("cell_sum")
    )


def stream_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(documents) -> explode tokens -> hash to each sketch
    row's cell -> complete-mode (row_id, cell) count -> drain."""
    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    agg = cms_sketch_frame(src)
    sink_name = f"stream_cms_{uuid.uuid4().hex[:8]}"
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
    "sketch_stream_cms",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT term, {sql_char_poly_hash('term')} AS h,
             CAST(count(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1
    ),
    cells AS (
      {" UNION ALL ".join(
        f"SELECT {i} AS row_id, {_cms_cell_sql(i)} AS cell, cnt FROM tf"
        for i in range(len(CMS_PARAMS))
      )}
    )
    SELECT row_id, cell, CAST(sum(cnt) AS BIGINT) AS cell_sum
    FROM cells GROUP BY 1, 2
    """,
)(stream_cms_sketch)
