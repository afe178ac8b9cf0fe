"""Stateful streaming 3-step funnel: the events_funnel_steps sequence
(view -> click -> purchase, each at-or-after the previous step's per-user
time) detected ONLINE, emitting one (user_id, t1_us, t2_us, t3_us) row
the moment a user completes the funnel.

The batch twin is operators/funnel.events_funnel_steps' per-user CTE
chain; the registered oracle below is that chain restricted to completed
users, so a drained replay must reproduce it row for row.  The
cross-batch property — funnel steps landing in DIFFERENT micro-batches
still complete, exactly once — is what the GroupState buys over a
per-batch join.

State is three longs + a flag per user (the step timestamps reached so
far) — O(active users), hash-spread across executors at 100 TB, and
evictable with an event-time timeout in production (the sessionizer
documents the same knob).  Delivery assumption: event-time-ordered
arrival per user across batches (the module-wide streaming contract);
within a batch, equal-timestamp events process in funnel-step order so
the fold's >= comparisons match the batch CTE exactly.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

import pyspark_text_classification_spark.operators.events  # noqa: F401
# ^ registers the batch oracles streaming.events reads at ITS import time —
#   required on executors too, where this module is the unpickle entry point
from pyspark_text_classification_spark.operators.funnel import FUNNEL_STEPS
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)

_OUT_SCHEMA = "user_id LONG, t1_us LONG, t2_us LONG, t3_us LONG"
_STATE_SCHEMA = "t1 LONG, t2 LONG, emitted INT"
_STEP_RANK = {s: i for i, s in enumerate(FUNNEL_STEPS)}


def _funnel_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through (t1, t2, emitted); -1 = unset."""
    t1, t2, emitted = state.get if state.exists else (-1, -1, 0)
    rows = pd.concat(list(pdfs))
    rows = rows.assign(rank=rows["event_type"].map(_STEP_RANK))
    rows = rows.sort_values(["ts_us", "rank", "event_id"])
    out = []
    for ts, etype in zip(rows["ts_us"], rows["event_type"]):
        ts = int(ts)
        if etype == FUNNEL_STEPS[0] and t1 < 0:
            t1 = ts
        elif etype == FUNNEL_STEPS[1] and t1 >= 0 and t2 < 0 and ts >= t1:
            t2 = ts
        elif (
            etype == FUNNEL_STEPS[2]
            and t2 >= 0
            and not emitted
            and ts >= t2
        ):
            out.append((key[0], t1, t2, ts))
            emitted = 1
    state.update((t1, t2, emitted))
    yield pd.DataFrame(out, columns=["user_id", "t1_us", "t2_us", "t3_us"])


def stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> groupBy(user) -> stateful funnel fold ->
    append-mode memory sink, drained with availableNow."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    funnel = (
        src.selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink_name = f"stream_funnel_{uuid.uuid4().hex[:8]}"
    q = (
        funnel.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)


# the batch funnel's per-user chain, restricted to completed users
query(
    "events_stream_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND epoch_us(e.ts) >= s1.t1
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND epoch_us(e.ts) >= s2.t2
      GROUP BY 1
    )
    SELECT s1.user_id, s1.t1 AS t1_us, s2.t2 AS t2_us, s3.t3 AS t3_us
    FROM s1
    JOIN s2 ON s2.user_id = s1.user_id
    JOIN s3 ON s3.user_id = s1.user_id
    """,
)(stream_funnel)


# --- windowed variant: conversion windows + dead-funnel state ---------------
from pyspark_text_classification_spark.operators.funnel import (  # noqa: E402
    FUNNEL_WINDOW_US,
)

_WOUT_SCHEMA = "user_id LONG, t1_us LONG, t2_us LONG, t3_us LONG"
_WSTATE_SCHEMA = "t1 LONG, t2 LONG, done INT"


def _funnel_windowed_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through (t1, t2, done); -1 = unset.

    ``done`` goes 1 on completion OR when event time passes a step's
    conversion window (a DEAD funnel: the batch semantics pin t1 to the
    FIRST view, so a funnel that missed its window can never complete —
    the marker makes that O(1) instead of rescanning).  In production
    the dead markers are the state a TTL evicts."""
    t1, t2, done = state.get if state.exists else (-1, -1, 0)
    rows = pd.concat(list(pdfs))
    rows = rows.assign(rank=rows["event_type"].map(_STEP_RANK))
    rows = rows.sort_values(["ts_us", "rank", "event_id"])
    out = []
    for ts, etype in zip(rows["ts_us"], rows["event_type"]):
        ts = int(ts)
        if done:
            break
        # window expiry: no in-window next step can arrive anymore
        # (event-time-ordered delivery contract)
        if t1 >= 0 and t2 < 0 and ts >= t1 + FUNNEL_WINDOW_US:
            done = 1
            break
        if t2 >= 0 and ts >= t2 + FUNNEL_WINDOW_US:
            done = 1
            break
        if etype == FUNNEL_STEPS[0] and t1 < 0:
            t1 = ts
        elif (
            etype == FUNNEL_STEPS[1]
            and t1 >= 0
            and t2 < 0
            and t1 <= ts < t1 + FUNNEL_WINDOW_US
        ):
            t2 = ts
        elif (
            etype == FUNNEL_STEPS[2]
            and t2 >= 0
            and t2 <= ts < t2 + FUNNEL_WINDOW_US
        ):
            out.append((key[0], t1, t2, ts))
            done = 1
    state.update((t1, t2, done))
    yield pd.DataFrame(out, columns=["user_id", "t1_us", "t2_us", "t3_us"])


def stream_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> stateful WINDOWED funnel fold -> append sink."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    funnel = (
        src.selectExpr(
            "event_id",
            "user_id",
            "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_windowed_group,
            outputStructType=_WOUT_SCHEMA,
            stateStructType=_WSTATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink_name = f"stream_funnel_w_{uuid.uuid4().hex[:8]}"
    q = (
        funnel.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)


# the batch windowed funnel's per-user chain, completed users only
query(
    "events_stream_funnel_windowed",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[1]}'
        AND epoch_us(e.ts) >= s1.t1
        AND epoch_us(e.ts) < s1.t1 + {FUNNEL_WINDOW_US}
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[2]}'
        AND epoch_us(e.ts) >= s2.t2
        AND epoch_us(e.ts) < s2.t2 + {FUNNEL_WINDOW_US}
      GROUP BY 1
    )
    SELECT s1.user_id, s1.t1 AS t1_us, s2.t2 AS t2_us, s3.t3 AS t3_us
    FROM s1
    JOIN s2 ON s2.user_id = s1.user_id
    JOIN s3 ON s3.user_id = s1.user_id
    """,
)(stream_funnel_windowed)
