"""Streaming CUSUM change-point monitor: the 24th streaming twin.

The batch twin (operators/timeseries.events_cusum_changepoint) scans
the corpus after the fact; this maintains the hourly count state AS
events stream in.  The hourly (event_type, h) count is an algebraic
complete-mode aggregate whose state is bounded by types x WALL-CLOCK
hours (never by stream volume) — exactly the property that makes the
statistic streamable.  The drained state then runs through the SAME
``series_from_counts`` + ``cusum_peak`` reduction the batch query uses
(shared code, not a re-implementation), so a drained run over the same
files must hash-equal the batch CUSUM — and the oracle below IS the
batch query's oracle verbatim.

At 100 TB/day the complete-mode aggregate is the standard streaming
counter (map-side partials merged into the state store per
micro-batch); the peak reduction runs on the bounded drained state, the
same place an alerting job would evaluate it each trigger.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.operators.timeseries import (
    HOUR_US,
    cusum_peak,
    series_from_counts,
)
from pyspark_text_classification_spark.functions.time import ts_us
from pyspark_text_classification_spark.registry import ORACLES, query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)


def hourly_counts_frame(src: DataFrame) -> DataFrame:
    """The streamable dataflow over any events frame (batch OR stream):
    (event_type, h, y) hourly counts — shared by the registered
    streaming query and the multi-batch test."""
    return (
        src.select(
            "event_type", (ts_us() / HOUR_US).cast("long").alias("h")
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").alias("y"))
    )


def stream_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> complete-mode hourly counts -> drain ->
    shared gap-fill + CUSUM peak reduction on the bounded state."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    agg = hourly_counts_frame(src)
    sink_name = f"stream_cusum_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # The drained state is BOUNDED (types x wall hours); checkpoint it so
    # the shared reduction's self-referencing joins (types x grid x
    # counts all derive from it) resolve against one concrete relation
    # instead of three copies of the memory-sink view.
    counts = spark.table(sink_name).localCheckpoint(eager=True)
    return cusum_peak(series_from_counts(counts))


query(
    "events_stream_cusum",
    # the batch query's oracle BY REFERENCE, not a copied string — any
    # future change to the batch CUSUM definition (tiebreak, gap-fill
    # bounds, normalization) flows to the twin automatically, keeping
    # the "held to the batch statistic verbatim" guarantee structural
    oracle=ORACLES["events_cusum_changepoint"],
)(stream_cusum_changepoint)
