"""State-TTL eviction twin: per-user session aggregation where idle state
is EVICTED AND EMITTED by ``GroupStateTimeout.EventTimeTimeout`` — the
third stateful watermark surface after join-drop (streaming/latedrop.py,
round 7) and windowed-aggregation eviction (round 8).

A 100 TB behavioral firehose cannot keep every user's state forever: the
production shape is a per-key TTL where a key that goes quiet for longer
than the TTL (in EVENT time, i.e. measured by the watermark, not the
wall clock) has its state flushed downstream and removed from the store.
This twin runs exactly that loop: one (n_events, first_us, last_us)
aggregate per user, closed EITHER on the data path — the same user
returns after a gap > TTL, so the old session is emitted and a new one
starts — OR on the timeout path: the watermark passes last_us + TTL with
no further events, ``state.hasTimedOut`` fires, the session is emitted
tagged ``'timeout'`` and the state removed.  Output = every CLOSED
session; the final session of a still-recent user stays in the store
(exactly what a live deployment would carry into tomorrow).

Empirically pinned semantics (prototype-verified against the oracle at
sf0.001/0.01 before registration; tests/test_streaming_watermark.py adds
the crafted-fixture pins):

- A timeout fires when the watermark advances STRICTLY past the set
  timestamp (``wm > timeout_ts``, milliseconds) — the oracle's keep
  predicate for timeout-closed sessions is the mirrored strict
  ``floor_ms(last_us) + TTL_MS < floor_ms(max ts) - delay_ms``.
- ``setTimeoutTimestamp`` must exceed the current watermark, so the set
  value is ``max(last_ms + TTL_MS, getCurrentWatermarkMs() + 1)`` — a
  no-op for live keys, and for a key that is already idle-past-TTL on
  arrival it defers eviction to the next watermark advance without
  changing WHAT is emitted (the drained output is when-insensitive).
- The availableNow no-data batch runs the final timeout sweep (the same
  mechanism that finalizes append-mode windows, pinned in round 8).

Scale shape: state is three longs per ACTIVE user, hash-partitioned
across executors; the TTL bounds the store at O(users active in the
last TTL), which is the entire point.  The drain is scoped to 8 state
partitions like the other state-store-bound twins (streaming/state.py).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

import pyspark_text_classification_spark.operators.events  # noqa: F401
# ^ registers the batch oracles streaming.events reads at ITS import time —
#   required on executors too, where this module is the unpickle entry point
from pyspark_text_classification_spark.functions.time import ts_us
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)

# Session TTL (event-time) and the source watermark delay.  12 h splits
# the bundled corpus's per-user gap distribution (median 7.4 h, p95
# ~32 h), so BOTH close paths are exercised at every sf: sf0.001 drains
# 314 gap-closed + 3 timeout-evicted sessions, sf0.01 3142 + 39.
TTL_MS = 43_200_000
TTL_US = TTL_MS * 1000
TTL_DELAY = "1 hour"
TTL_DELAY_MS = 3_600_000

_OUT_SCHEMA = (
    "user_id LONG, n_events LONG, first_us LONG, last_us LONG,"
    " closed_by STRING"
)
_STATE_SCHEMA = "n LONG, first LONG, last LONG"
_COLS = ["user_id", "n_events", "first_us", "last_us", "closed_by"]


def _ttl_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through (n, first, last); -1 = unset.

    Timeout path: emit the idle session tagged 'timeout' and REMOVE the
    state — the eviction itself.  Data path: a row arriving more than
    TTL after ``last`` closes the old session ('gap') and starts a new
    one; ties process in (ts, event_id) order so the fold is
    deterministic under any batch split."""
    if state.hasTimedOut:
        n, first, last = state.get
        state.remove()
        yield pd.DataFrame(
            [(key[0], n, first, last, "timeout")], columns=_COLS
        )
        return
    n, first, last = state.get if state.exists else (0, -1, -1)
    rows = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    out = []
    for ts in rows["ts_us"]:
        ts = int(ts)
        if last >= 0 and ts - last > TTL_US:
            out.append((key[0], n, first, last, "gap"))
            n, first = 0, -1
        if first < 0:
            first = ts
        n += 1
        last = ts
    state.update((n, first, last))
    state.setTimeoutTimestamp(
        max(last // 1000 + TTL_MS, state.getCurrentWatermarkMs() + 1)
    )
    yield pd.DataFrame(out, columns=_COLS)


def stream_state_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) -> watermark -> EventTimeTimeout TTL fold ->
    append-mode memory sink, drained with availableNow.

    SINGLE-DATA-BATCH CONTRACT (ADVICE r9): the batch oracle labels
    every non-final session 'gap', which matches the stream only when
    the whole corpus arrives in ONE data batch (wm=0 during it, so no
    mid-stream timeout can fire; the availableNow no-data sweep then
    closes idle finals as 'timeout').  Under a multi-file source a user
    evicted by a MID-stream timeout who later returns would emit that
    session as 'timeout' where the oracle says 'gap'
    (test_state_ttl_evicts_idle_user_between_batches proves mid-stream
    timeouts do fire).  The glob below is therefore asserted to match
    exactly one file so a future multi-file fixture fails loudly here
    instead of hash-mismatching on closed_by."""
    import glob as _glob
    import os as _os

    matches = _glob.glob(_os.path.join(sf_dir, "events.parquet"))
    if len(matches) != 1 or not _os.path.isfile(matches[0]):
        raise ValueError(
            "events_stream_state_ttl's batch oracle assumes ONE data "
            f"batch = one single-file source; {sf_dir!r} has "
            f"{[m for m in matches]} (need exactly one regular file "
            "named events.parquet — directory-parquet sources also "
            "match nothing under pathGlobFilter)"
        )
    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .select(
            "event_id",
            "user_id",
            F.timestamp_micros(ts_us()).alias("event_ts"),
            ts_us().alias("ts_us"),
        )
    )
    ttl = (
        src.withWatermark("event_ts", TTL_DELAY)
        .groupBy("user_id")
        .applyInPandasWithState(
            _ttl_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    sink_name = f"stream_ttl_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            ttl.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


# Batch twin: gaps-and-islands sessionization with the SAME gap rule
# (strictly > TTL_US starts a new session), keeping every non-final
# session (the data path closed it) plus final sessions the final
# watermark evicted (strict ms-floor arithmetic, the shared watermark
# mirror: floor_ms(max ts) - delay).  The 'gap' label on every
# non-final session is only correct under the SINGLE-DATA-BATCH
# contract stream_state_ttl asserts on its source glob (see its
# docstring): with multiple data batches a mid-stream timeout could
# close a non-final session as 'timeout'.
query(
    "events_stream_state_ttl",
    oracle=f"""
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
    mx AS (SELECT (max(t) // 1000 - {TTL_DELAY_MS}) AS wm FROM e),
    g AS (
      SELECT user_id, t,
             CASE WHEN t - lag(t) OVER (
                    PARTITION BY user_id ORDER BY t, event_id
                  ) > {TTL_US}
                  THEN 1 ELSE 0 END AS brk
      FROM e
    ),
    s AS (
      SELECT user_id, t,
             sum(brk) OVER (PARTITION BY user_id ORDER BY t
               ROWS UNBOUNDED PRECEDING) AS sid
      FROM g
    ),
    sess AS (
      SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_events,
             min(t) AS first_us, max(t) AS last_us
      FROM s GROUP BY 1, 2
    ),
    fin AS (SELECT user_id AS fuid, max(sid) AS fsid FROM sess GROUP BY 1)
    SELECT sess.user_id, n_events, first_us, last_us,
           CASE WHEN sess.sid < fin.fsid THEN 'gap' ELSE 'timeout' END
             AS closed_by
    FROM sess JOIN fin ON sess.user_id = fin.fuid, mx
    WHERE sess.sid < fin.fsid
       OR (last_us // 1000 + {TTL_MS}) < mx.wm
    """,
)(stream_state_ttl)
