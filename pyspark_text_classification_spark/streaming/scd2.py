"""Streaming SCD type-2 dimension maintenance: state-change intervals
emitted live as GroupState per user.

The batch twin is operators/events.events_scd2_intervals; a drained
replay must reproduce its CLOSED intervals row for row (the registered
oracle below is the batch CTE restricted to ``valid_to IS NOT NULL`` —
an append-mode stream can only emit an interval once its successor
state change closes it; the still-open interval lives in the state
store, exactly like events_stream_closed_sessions holds its open
session).  The cross-batch property — a state run spanning micro-batch
boundaries closes with the correct valid_from — is what the GroupState
buys and is asserted by a split-file test.

Delivery assumption: event-time-ordered arrival per user across batches
(the sessionizer's documented contract); out-of-order feeds add a
watermark + update-mode retraction on the identical state schema.
State is one (state, valid_from_us) pair per user — O(active users),
hash-spread across executors at 100 TB.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

import pyspark_text_classification_spark.operators.events  # noqa: F401
# ^ streaming.events reuses operators.events' registered oracles at import
# time; a Python WORKER unpickling _scd2_group imports THIS module first,
# so the dependency must be explicit here (batch registration order covers
# it everywhere else).
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)

_OUT_SCHEMA = (
    "user_id LONG, state STRING, valid_from_us LONG, valid_to_us LONG"
)
_STATE_SCHEMA = "cur_state STRING, valid_from_us LONG"
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def _scd2_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through (cur_state, valid_from_us):
    every state CHANGE closes the open interval and opens a new one."""
    cur, vfrom = state.get if state.exists else (None, -1)
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    out = []
    for ts, etype in zip(rows["ts_us"], rows["event_type"]):
        if cur is None:
            cur, vfrom = etype, int(ts)
        elif etype != cur:
            out.append((key[0], cur, vfrom, int(ts)))
            cur, vfrom = etype, int(ts)
    state.update((cur, vfrom))
    yield pd.DataFrame(
        out, columns=["user_id", "state", "valid_from_us", "valid_to_us"]
    )


def stream_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> groupBy(user) -> stateful run fold ->
    append-mode memory sink (closed intervals only), drained with
    availableNow."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    iv = (
        src.selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _scd2_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink_name = f"stream_scd2_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            iv.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


# batch twin's interval table restricted to closed intervals, verbatim
query(
    "events_stream_scd2",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type AS state, epoch_us(ts) AS ts_us, event_id
      FROM events
    ),
    runs AS (
      SELECT user_id, state, ts_us,
             lag(state) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev_state
      FROM ev
    ),
    changes AS (
      SELECT user_id, state, ts_us AS valid_from_us
      FROM runs
      WHERE prev_state IS NULL OR prev_state <> state
    ),
    iv AS (
      SELECT user_id, state, valid_from_us,
             lead(valid_from_us) OVER (PARTITION BY user_id
                                       ORDER BY valid_from_us, state)
               AS valid_to_us
      FROM changes
    )
    SELECT user_id, state, valid_from_us, valid_to_us
    FROM iv WHERE valid_to_us IS NOT NULL
    """,
)(stream_scd2_intervals)
