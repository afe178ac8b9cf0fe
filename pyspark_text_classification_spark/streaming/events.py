"""Structured Streaming surface: the batch tumbling aggregate re-expressed
as a watermarked stream, held to the SAME DuckDB oracle as the batch query
(operators/events.events_tumbling_hourly).

The reference is batch-only (SURVEY.md §1.1 "No streams"); this module
supplies the engine's streaming execution mode. The file source replays the
static events parquet as a stream; ``Trigger.AvailableNow`` drains it in
one run, so the declared query is deterministic and returns a plain
DataFrame from the memory sink.

Scale notes: with a real unbounded source (Kafka/files), switch
``outputMode`` to ``update`` + a real sink; the 1-hour watermark bounds
state for late data, and the (window, event_type) grouping state is
partitioned by key across executors — the standard Structured Streaming
scale shape. The memory sink + complete mode here is only the test/driver
harness configuration.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from pyspark_text_classification_spark.functions.text import round_half_up
from pyspark_text_classification_spark.functions.time import ts_us
from pyspark_text_classification_spark.registry import query

EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),  # TIMESTAMP(MICROS) parquet
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> watermark -> 1h window x event_type aggregate,
    drained with availableNow into a memory sink; returns the result as a
    batch DataFrame."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")  # dir source, one table
        .load(sf_dir)
    )
    ts = F.timestamp_micros(ts_us())
    agg = (
        src.withColumn("event_ts", ts)
        .withWatermark("event_ts", "1 hour")
        .groupBy(F.window("event_ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            round_half_up(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch_s"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    sink_name = f"stream_hourly_{uuid.uuid4().hex[:8]}"
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


# Same oracle as the batch operator — the streaming plan must produce
# identical results when the source is fully drained.
from pyspark_text_classification_spark.functions.text import sql_round_half_up  # noqa: E402

query(
    "events_stream_tumbling_hourly",
    oracle=f"""
    SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch_s,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {sql_round_half_up('sum(value)', 4)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)(stream_tumbling_hourly)


def stream_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> watermark -> SLIDING 1h/15m window x
    event_type aggregate (each event in 4 overlapping windows — the
    streaming state holds 4 open windows per key instead of 1), drained
    with availableNow into a memory sink."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    ts = F.timestamp_micros(ts_us())
    agg = (
        src.withColumn("event_ts", ts)
        .withWatermark("event_ts", "1 hour")
        .groupBy(F.window("event_ts", "1 hour", "15 minutes"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            round_half_up(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start_s"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )
    sink_name = f"stream_sliding_{uuid.uuid4().hex[:8]}"
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
    "events_stream_sliding_1h_15m",
    oracle=f"""
    SELECT ((epoch_us(ts)) // 900000000 - k) * 900 AS win_start_s,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {sql_round_half_up('sum(value)', 4)} AS sum_value
    FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
    GROUP BY 1, 2
    """,
)(stream_sliding_1h_15m)


def stream_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming anomaly scoring against STATIC per-user moments — the
    model-scoring twin of events_value_zscore: the reference statistics
    are computed once from the historical table (in production: refreshed
    on a cadence), broadcast to every executor, and each arriving event
    scores with a map-side join — no stream-side shuffle, no state. On a
    drained replay of the same table this must equal the batch query
    (same oracle)."""
    import uuid as _uuid

    from pyspark_text_classification_spark.operators.events import (
        user_moments,
        zscore_against_moments,
    )
    from pyspark_text_classification_spark.sources.parquet import load_table

    static = load_table(spark, sf_dir, "events")
    moments = user_moments(static)
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    scored = zscore_against_moments(src, moments)
    sink_name = f"stream_zscore_{_uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            scored.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


from pyspark_text_classification_spark.registry import ORACLES  # noqa: E402

query(
    "events_stream_value_zscore",
    oracle=ORACLES["events_value_zscore"],
)(stream_value_zscore)


def ohlc_agg(src: DataFrame) -> DataFrame:
    """The OHLC tumbling-window aggregate over a (batch or streaming)
    events frame — shared by the registered streaming twin and the
    multi-batch split test."""
    key = F.struct(
        ts_us().alias("t"), F.col("event_id").alias("i"), F.col("value").alias("v")
    )
    return (
        src.withColumn("event_ts", F.timestamp_micros(ts_us()))
        .withWatermark("event_ts", "1 hour")
        .groupBy(F.window("event_ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.min(key)["v"].alias("open"),
            F.max(key)["v"].alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_epoch_s"),
            "event_type",
            "n_events",
            "open",
            "close",
            "high",
            "low",
        )
    )


def stream_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming OHLC downsampling: the events_ohlc_hourly rollup as a
    watermarked tumbling-window aggregate. open/close remain min/max over
    a (ts, event_id, value) struct — typed min/max state merges correctly
    across micro-batches (each partial keeps its extreme; merge keeps the
    smaller/larger struct), so the drained stream equals the batch rollup
    with NO ordering assumption on arrival — the property that makes
    first/last-by-time safe in a streaming engine."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    agg = ohlc_agg(src)
    sink_name = f"stream_ohlc_{uuid.uuid4().hex[:8]}"
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
    "events_stream_ohlc_hourly",
    oracle=ORACLES["events_ohlc_hourly"],
)(stream_ohlc_hourly)
