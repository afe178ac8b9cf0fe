"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the SURVEY.md engine-mapping for "custom
stateful operators"; the batch twin is operators/events.events_sessionize).

Per user_id the operator keeps (last event time, running session counter)
as GroupState; each micro-batch's events are sorted and folded through
that state, so session ids stay correct ACROSS micro-batches — the
property a stateless window cannot give on an unbounded stream. State is
two longs per user: at 100 TB scale state size is O(active users), spread
across executors by the groupBy hash, and an event-time timeout
(``GroupStateTimeout``) would evict idle users in production; the test
harness drains a bounded replay so no timeout fires.

Declared with the SAME DuckDB oracle as the batch sessionizer: on a fully
drained, single-batch replay the stateful fold must reproduce the batch
window exactly (the driver sees a strong hash check, not rows-only).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from pyspark_text_classification_spark.operators.events import SESSION_GAP_US
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)

_OUT_SCHEMA = "event_id LONG, user_id LONG, session_id LONG"
_STATE_SCHEMA = "last_ts_us LONG, session_id LONG"
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through (last_ts_us, session_id) state."""
    last_ts, sid = state.get if state.exists else (None, 0)
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["ts_us", "event_id"])
    out = []
    for ts in rows["ts_us"]:
        if last_ts is None or ts - last_ts > SESSION_GAP_US:
            sid += 1
        out.append(sid)
        last_ts = ts
    state.update((int(last_ts), int(sid)))
    yield pd.DataFrame(
        {
            "event_id": rows["event_id"],
            "user_id": key[0],
            "session_id": out,
        }
    )


def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> groupBy(user) -> stateful pandas fold ->
    memory sink, drained with availableNow; returns a batch DataFrame."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    sessions = (
        src.selectExpr("event_id", "user_id", "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) AS ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink_name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


# Same oracle as the batch sessionizer (operators/events.events_sessionize).
query(
    "events_stream_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN epoch_us(ts)
                    - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1
                  WHEN lag(ts) OVER w IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM g
    """,
)(stream_sessionize)


# ---------------------------------------------------------------------------
# Closed-session aggregates (successor-closed — deterministic on any split)
# ---------------------------------------------------------------------------

_CLOSED_OUT_SCHEMA = (
    "user_id LONG, session_id LONG, n_events LONG, "
    "start_us LONG, end_us LONG"
)
_CLOSED_STATE_SCHEMA = (
    "session_id LONG, start_us LONG, last_us LONG, n_events LONG"
)


def _closed_sessions_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit a session the moment its SUCCESSOR opens (the gap proves it
    closed). The user's final session stays open in state and is never
    emitted — so the emitted set is identical no matter how the stream is
    micro-batched, without any timeout semantics."""
    sid, start, last, n = state.get if state.exists else (0, None, None, 0)
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    closed = []
    for ts in rows["ts_us"]:
        ts = int(ts)
        if start is None:
            sid, start, last, n = 1, ts, ts, 1
        elif ts - last > SESSION_GAP_US:
            closed.append((key[0], sid, n, start, last))
            sid, start, last, n = sid + 1, ts, ts, 1
        else:
            last, n = ts, n + 1
    state.update((int(sid), int(start), int(last), int(n)))
    yield pd.DataFrame(
        closed,
        columns=["user_id", "session_id", "n_events", "start_us", "end_us"],
    )


def stream_closed_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> stateful fold -> per-session aggregate rows
    for every session CLOSED by a later event, drained with availableNow.

    The production pattern for session analytics over an unbounded
    stream: state per user is four longs, emission is append-mode (each
    session row exactly once), and the last-open session would be flushed
    by an event-time timeout in production — excluded here so the result
    is deterministic and oracle-checkable on a drained replay."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    from pyspark_text_classification_spark.functions.time import TS_US_EXPR

    sessions = (
        src.selectExpr("event_id", "user_id", f"{TS_US_EXPR} AS ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _closed_sessions_group,
            outputStructType=_CLOSED_OUT_SCHEMA,
            stateStructType=_CLOSED_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink_name = f"closed_sessions_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            sessions.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


# Oracle: batch-sessionize, aggregate per session, then keep every session
# except each user's LAST (the one still open when the stream drained).
query(
    "events_stream_closed_sessions",
    oracle=f"""
    WITH g AS (
      SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             CASE WHEN epoch_us(ts)
                    - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1
                  WHEN lag(ts) OVER w IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT event_id, user_id, ts_us,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM g
    ),
    agg AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             CAST(count(*) AS BIGINT) AS n_events,
             min(ts_us) AS start_us, max(ts_us) AS end_us,
             max(session_id) OVER (PARTITION BY user_id) AS last_sid
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id, session_id, n_events, start_us, end_us
    FROM agg WHERE session_id < last_sid
    """,
)(stream_closed_sessions)
