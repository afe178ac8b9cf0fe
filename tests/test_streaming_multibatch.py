"""Multi-micro-batch streaming: the stateful sessionizer must produce the
same sessions as the batch window even when a user's timeline is SPLIT
across micro-batches — the property that distinguishes GroupState from a
per-batch window."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from pyspark_text_classification_spark.operators.events import SESSION_GAP_US
from pyspark_text_classification_spark.streaming.sessionize import (
    _OUT_SCHEMA,
    _STATE_SCHEMA,
    _sessionize_group,
)
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)


def test_sessionize_state_survives_batch_split(spark, tmp_path):
    us = 1_000  # ns per microsecond
    gap = SESSION_GAP_US * 1_000  # session gap in ns
    rows = []
    for uid in (1, 2):
        # session A: two events; session B: two events after a > gap pause.
        # near-identical bases INTERLEAVE the users' timelines, so the
        # mid-point file split puts every user's session B in batch 2 —
        # its session_id is 2 only if batch 1's state survived.
        base = 10 * gap + uid * us
        rows += [
            (uid * 100 + 1, base, uid, "click", 1.0, "{}"),
            (uid * 100 + 2, base + 60 * us, uid, "view", 1.0, "{}"),
            (uid * 100 + 3, base + gap + 120 * us, uid, "click", 1.0, "{}"),
            (uid * 100 + 4, base + gap + 180 * us, uid, "view", 1.0, "{}"),
        ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(rows, columns=cols).sort_values("ts")
    d = tmp_path / "stream_src"
    os.makedirs(d)
    # split MID-SESSION: events 1-2 of session B land in different files
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(str(d / "a_first.parquet"), index=False)
    pdf.iloc[half:].to_parquet(str(d / "b_second.parquet"), index=False)
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # force one file per micro-batch
        .load(str(d))
    )
    sessions = (
        src.selectExpr("event_id", "user_id", "ts div 1000 AS ts_us")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("multibatch_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.event_id: r.session_id
        for r in spark.table("multibatch_sessions").collect()
    }
    # state carried across batches: the 3rd/4th events are session 2 of the
    # SAME counter, not session 1 of a fresh one
    for uid in (1, 2):
        assert got[uid * 100 + 1] == 1 and got[uid * 100 + 2] == 1
        assert got[uid * 100 + 3] == 2 and got[uid * 100 + 4] == 2
    assert len(got) == 8