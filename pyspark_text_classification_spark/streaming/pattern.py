"""Stateful streaming pattern alerting: the events_pattern_search
subsequence distance evaluated ONLINE, emitting an alert row the moment
any user's trailing length-W value window comes within
PATTERN_ALERT_MAX of the query shape.

The batch twin is operators/events.events_pattern_search's lag-chain
distance; streaming swaps its global top-k for a THRESHOLD (top-k is not
an append-mode-streamable aggregate, an alert predicate is — exactly the
production difference between a motif-mining report and a live pattern
alarm).  The registered oracle below is the batch lag chain filtered to
the same threshold, so a drained replay must reproduce the alert set row
for row.

State is the last W-1 value cents per user (a fixed tuple of longs +
fill count) — O(active users) and evictable with an event-time timeout
in production.  Delivery assumption: event-time-ordered arrival per user
across batches (the module-wide streaming contract); within a batch rows
sort on (ts_us, event_id), matching the batch window's order exactly.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

import pyspark_text_classification_spark.operators.events  # noqa: F401
# ^ registers the batch oracles on executors too, where this module is
#   the unpickle entry point
from pyspark_text_classification_spark.operators.events import (
    PATTERN_Q,
    PATTERN_W,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)

# Alert threshold on the integer squared distance: ~1% of windows at
# every bundled sf (measured min d2 4.5M-18.6M across sf0.001-0.1).
PATTERN_ALERT_MAX = 30_000_000

_OUT_SCHEMA = "user_id LONG, event_id LONG, d2 LONG"
_STATE_SCHEMA = (
    ", ".join(f"h{i} LONG" for i in range(PATTERN_W - 1)) + ", n INT"
)


def _pattern_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Slide one user's trailing window across the micro-batch rows."""
    if state.exists:
        *hist, n = state.get
        hist = list(hist[: int(n)])
    else:
        hist = []
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    out = []
    for eid, vc in zip(rows["event_id"], rows["vc"]):
        window = hist + [int(vc)]
        if len(window) == PATTERN_W:
            d2 = sum(
                (v - q) * (v - q) for v, q in zip(window, PATTERN_Q)
            )
            if d2 <= PATTERN_ALERT_MAX:
                out.append((key[0], int(eid), d2))
        hist = window[-(PATTERN_W - 1):]
    padded = hist + [0] * (PATTERN_W - 1 - len(hist))
    state.update((*padded, len(hist)))
    yield pd.DataFrame(out, columns=["user_id", "event_id", "d2"])


@query(
    "events_stream_pattern_alert",
    oracle=f"""
    WITH v AS (
      SELECT user_id, event_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
             ts
      FROM events
    ),
    lagged AS (
      SELECT user_id, event_id,
             {', '.join(
                 f'lag(vc, {PATTERN_W - 1 - i}) OVER w AS v{i}'
                 for i in range(PATTERN_W - 1))},
             vc AS v{PATTERN_W - 1}
      FROM v
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           {' + '.join(
               f'(v{i} - {q}) * (v{i} - {q})'
               for i, q in enumerate(PATTERN_Q))} AS d2
    FROM lagged
    WHERE v0 IS NOT NULL
      AND {' + '.join(
              f'(v{i} - {q}) * (v{i} - {q})'
              for i, q in enumerate(PATTERN_Q))} <= {PATTERN_ALERT_MAX}
    """,
)
def events_stream_pattern_alert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """readStream(events) -> groupBy(user) -> stateful sliding-window
    pattern distance -> append-mode memory sink, drained with
    availableNow; held to the batch lag-chain oracle at the same
    threshold."""
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    alerts = (
        src.selectExpr(
            "event_id",
            "user_id",
            "CAST(floor(value * 100 + 0.5) AS LONG) AS vc",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink_name = f"stream_pattern_{uuid.uuid4().hex[:8]}"
    q = (
        alerts.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink_name)
