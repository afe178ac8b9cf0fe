"""Stream-stream interval join: the batch time-range join
(operators/temporal.events_range_join) as a watermarked two-stream join.

Structured Streaming's stream-stream join buffers both sides in state and
emits matches as they arrive; the event-time watermarks plus the interval
condition bound how long a signup waits for purchases (1 hour + watermark),
so state is evicted instead of growing forever — the property that makes
this shape viable on an unbounded 100 TB firehose. Held to the SAME DuckDB
oracle as the batch range join: a fully drained replay must emit exactly
the batch result.

Timestamps follow the µs precision contract (operators/temporal.py): the
join runs on `timestamp_micros(ts_us())` so boundary pairs agree with the
integer-µs oracle.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.operators.temporal import (
    RANGE_JOIN_WINDOW_US,
)
from pyspark_text_classification_spark.functions.time import ts_us
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def stream_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) split into signup/purchase streams -> watermarked
    interval join -> memory sink, drained with availableNow."""

    def src() -> DataFrame:
        return (
            spark.readStream.schema(EVENTS_STREAM_SCHEMA)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
            .select(
                "event_id",
                "user_id",
                "event_type",
                ts_us().alias("ts_us"),
                F.timestamp_micros(ts_us()).alias("event_ts"),
            )
        )

    signups = (
        src()
        .filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts_us").alias("s_us"),
            F.col("event_ts").alias("s_ts"),
        )
        .withWatermark("s_ts", "1 hour")
    )
    purchases = (
        src()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts_us").alias("p_us"),
            F.col("event_ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_us") > F.col("s_us"))
        & (F.col("p_us") - F.col("s_us") <= RANGE_JOIN_WINDOW_US)
        # timestamp-typed bound so the engine derives state-eviction limits
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        "signup_id",
        "purchase_id",
        F.col("s_user").alias("user_id"),
        (F.col("p_us") - F.col("s_us")).alias("delay_us"),
    )
    sink_name = f"stream_range_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


# Same oracle as the batch range join (operators/temporal.events_range_join).
query(
    "events_stream_range_join",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
      FROM events
    ),
    s AS (
      SELECT event_id AS signup_id, user_id, ts_us
      FROM e WHERE event_type = 'signup'
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts_us
      FROM e WHERE event_type = 'purchase'
    )
    SELECT s.signup_id, p.purchase_id, s.user_id,
           p.ts_us - s.ts_us AS delay_us
    FROM s JOIN p
      ON s.user_id = p.user_id
     AND p.ts_us > s.ts_us
     AND p.ts_us - s.ts_us <= {RANGE_JOIN_WINDOW_US}
    """,
)(stream_range_join)
