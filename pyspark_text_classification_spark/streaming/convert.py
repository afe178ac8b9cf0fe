"""Stateful streaming conversion detector: first '{view}' -> first
'{purchase}' per user, emitted exactly once, with the first-view timestamp
carried across micro-batches as GroupState.

The batch twin is the `lat` stage of
operators/events.events_time_to_convert; a drained replay must reproduce
it row for row (the registered oracle below is exactly that CTE).  The
cross-batch property — a user whose view and purchase land in DIFFERENT
micro-batches still converts, and converts once — is what the GroupState
buys over a per-batch join, and is asserted by a split-file test.

Delivery assumption: event-time-ordered arrival per user across batches
(the same contract the sessionizer's state fold documents); production
out-of-order feeds add a watermark + update-mode retraction on top of the
identical state schema.  State is two longs + a flag per user — O(active
users), hash-spread across executors at 100 TB.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyspark_text_classification_spark.operators.events import (
    CONVERT_FROM,
    CONVERT_TO,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)

_OUT_SCHEMA = "user_id LONG, latency_s LONG"
_STATE_SCHEMA = "first_view_us LONG, emitted INT"
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def _convert_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through (first_view_us, emitted)."""
    fv, emitted = state.get if state.exists else (-1, 0)
    first_view = None if fv < 0 else fv  # -1 encodes "no view yet"
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    out = []
    for ts, etype in zip(rows["ts_us"], rows["event_type"]):
        if etype == CONVERT_FROM and first_view is None:
            first_view = int(ts)
        elif (
            etype == CONVERT_TO
            and first_view is not None
            and ts > first_view
            and not emitted
        ):
            out.append((key[0], (int(ts) - first_view) // 1_000_000))
            emitted = 1
    state.update((first_view if first_view is not None else -1, emitted))
    yield pd.DataFrame(out, columns=["user_id", "latency_s"])


def stream_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> groupBy(user) -> stateful conversion fold ->
    append-mode memory sink, drained with availableNow."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    conv = (
        src.selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _convert_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink_name = f"stream_convert_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            conv.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


# the batch twin's per-user latency table, verbatim
query(
    "events_stream_time_to_convert",
    oracle=f"""
    WITH a AS (
      SELECT user_id, min(epoch_us(ts)) AS t_a FROM events
      WHERE event_type = '{CONVERT_FROM}' GROUP BY 1
    ),
    b AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_b
      FROM events e JOIN a ON e.user_id = a.user_id
      WHERE e.event_type = '{CONVERT_TO}' AND epoch_us(e.ts) > a.t_a
      GROUP BY 1
    )
    SELECT a.user_id, (b.t_b - a.t_a) // 1000000 AS latency_s
    FROM a JOIN b ON a.user_id = b.user_id
    """,
)(stream_time_to_convert)
