"""Watermark semantics: in append mode a record arriving LATER than the
watermark allows is dropped, and only watermark-finalized windows are
emitted — the state-bounding contract that makes unbounded streams viable."""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import functions as F

import pyspark_text_classification_spark.all_queries  # noqa: F401 (register)
from pyspark_text_classification_spark.streaming.events import (
    EVENTS_STREAM_SCHEMA,
)

HOUR_US = 3_600_000_000  # events.ts is TIMESTAMP(MICROS)


def test_append_mode_drops_late_event_and_emits_final_windows(spark, tmp_path):
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    # the watermark is an EVICTION bound, not a hard drop line: a late row
    # is only dropped once its window was finalized in an EARLIER batch.
    # batch 1: events at hour 0 and hour 3 -> watermark advances to 2h
    batch1 = pd.DataFrame(
        [(1, 0 * HOUR_US + 1, 7, "click", 1.0, "{}"),
         (2, 3 * HOUR_US + 1, 7, "click", 1.0, "{}")],
        columns=cols,
    )
    # batch 2 (runs with wm=2h): hour-0 window is finalized+evicted here
    batch2 = pd.DataFrame(
        [(4, 4 * HOUR_US + 1, 7, "click", 1.0, "{}")], columns=cols
    )
    # batch 3 (wm=3h): a LATE event back at hour 0 — state gone -> dropped
    batch3 = pd.DataFrame(
        [(3, 0 * HOUR_US + 2, 7, "click", 1.0, "{}")], columns=cols
    )
    for b in (batch1, batch2, batch3):
        b["ts"] = pd.to_datetime(b["ts"], unit="us").astype("datetime64[us]")
    d = tmp_path / "wm_src"
    os.makedirs(d)
    batch1.to_parquet(str(d / "a_first.parquet"), index=False)
    batch2.to_parquet(str(d / "b_second.parquet"), index=False)
    batch3.to_parquet(str(d / "c_third.parquet"), index=False)
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 200, now - 200))
    os.utime(d / "b_second.parquet", (now - 100, now - 100))
    os.utime(d / "c_third.parquet", (now, now))

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    agg = (
        src.withColumn("event_ts", F.timestamp_micros(F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")))
        .withWatermark("event_ts", "1 hour")
        .groupBy(F.window("event_ts", "1 hour"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_s"), "cnt"
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_windows")
        .outputMode("append")  # only watermark-closed windows are emitted
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.hour_s: r.cnt for r in spark.table("wm_windows").collect()}
    # hour-0 window closed with ONE event: the late arrival was dropped,
    # not merged (complete/update mode or no watermark would show 2)
    assert got.get(0) == 1, got
    # hour-3 and hour-4 windows never passed the final 3h watermark ->
    # unemitted open state, exactly the append-mode contract
    assert 3 * 3600 not in got and 4 * 3600 not in got, got

def test_stream_stream_join_drops_rows_past_the_watermark(spark, tmp_path):
    """The late-drop twin's contract on crafted rows: a signup delivered
    AFTER the watermark passed it is dropped (its matching purchase sits
    in state, so the only reason the pair is missing is the lateness
    filter), while a late-but-inside-the-delay signup still joins."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import QUERIES

    def ts(mo, d, h, mi=0):
        return pd.Timestamp(2024, mo, d, h, mi)

    rows = pd.DataFrame(
        {
            # fresh pair (signup >= T_SPLIT=Jan16): always kept
            "event_id": [1, 2, 10, 11, 20, 21],
            "ts": [
                ts(1, 30, 23, 0), ts(1, 30, 23, 30),   # fresh s, p (u1)
                ts(1, 14, 10, 0), ts(1, 14, 10, 30),   # survivor s, p (u2)
                ts(1, 2, 10, 0), ts(1, 2, 10, 30),     # dropped s, p (u3)
            ],
            "user_id": [1, 1, 2, 2, 3, 3],
            "event_type": ["signup", "purchase"] * 3,
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    sf_dir = str(tmp_path / "latedrop_fixture")
    os.makedirs(sf_dir)
    pq.write_table(
        pa.Table.from_pandas(rows, schema=schema),
        f"{sf_dir}/events.parquet",
    )
    # watermark = min(floor_ms(max fresh signup), floor_ms(max purchase))
    #           - 504h = Jan 30 23:00 - 21d = Jan 9 23:00.
    # u3's signup (Jan 2) is delivered in the last batch, 8 days past the
    # watermark -> dropped; u2's (Jan 14) is late but inside the delay.
    got = {
        (r.signup_id, r.purchase_id)
        for r in QUERIES["events_stream_late_drop_join"](
            spark, sf_dir
        ).collect()
    }
    assert (1, 2) in got, got        # fresh pair emitted
    assert (10, 11) in got, got      # late-but-allowed pair emitted
    assert (20, 21) not in got, got  # past-watermark signup DROPPED
    assert len(got) == 2, got


def test_late_drop_watermark_ignores_the_nudge_batch(spark, tmp_path):
    """Pins the TWO-batch watermark lag the late-drop oracle relies on,
    in the regime where the alternatives diverge: max purchase (Jan 30
    23:59) exceeds max fresh signup (Jan 30 22:00), so

      - stats-through-b1, min-of-sides (the oracle's model):
        W = Jan 9 22:00 -> the Jan 9 23:00 signup is KEPT;
      - a one-batch lag would fold the nudge (Mar 1) into the signup
        node by b3, making W = floor_ms(max purchase) - delay
        = Jan 9 23:59 -> the signup would be DROPPED.

    Measured: Spark keeps the pair, i.e. the b2 nudge's own maxima never
    take effect (they would apply at a batch 4 that never runs) and the
    effective watermark at b3 derives from b0+b1 exactly as the oracle
    computes.  If a Spark upgrade ever tightens the lag to one batch,
    THIS test fails first and the oracle must drop its fresh-signup
    term."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import QUERIES

    def ts(d, h, m=0, s=0):
        return pd.Timestamp(2024, 1, d, h, m, s)

    rows = pd.DataFrame(
        {
            "event_id": [1, 2, 10, 11],
            "ts": [
                ts(30, 22, 0), ts(30, 23, 59),      # fresh s, max p (u1)
                ts(9, 23, 0), ts(9, 23, 59, 30),    # boundary-gap s, p (u2)
            ],
            "user_id": [1, 1, 2, 2],
            "event_type": ["signup", "purchase"] * 2,
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    sf_dir = str(tmp_path / "latedrop_regime")
    os.makedirs(sf_dir)
    pq.write_table(
        pa.Table.from_pandas(rows, schema=schema),
        f"{sf_dir}/events.parquet",
    )
    got = {
        (r.signup_id, r.purchase_id)
        for r in QUERIES["events_stream_late_drop_join"](
            spark, sf_dir
        ).collect()
    }
    assert (10, 11) in got, got  # kept: the nudge never moved the watermark


def test_late_drop_agg_finalized_window_drops_open_window_merges(
    spark, tmp_path
):
    """The registered aggregation twin's contract on crafted rows: a
    click delivered past the watermark into an ALREADY-FINALIZED day
    window is dropped (its window is absent from the append-mode
    output), while late clicks into a still-open window merge and the
    window is finalized — with the merged count — once the March nudge
    advances the watermark past it.

      fresh  Jan 30 23:00  -> wm at the late batch = Jan 9 23:00 - eps
      late   Jan  2 10:00  -> window end Jan 3 <= wm  -> DROPPED
      late   Jan 14 10:00 + 11:00 -> window end Jan 15 > wm -> MERGED
      (spacer Jan 16 and the Mar 1 nudge come from the feed builder)
    """
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import QUERIES

    def ts(mo, d, h):
        return pd.Timestamp(2024, mo, d, h)

    rows = pd.DataFrame(
        {
            "event_id": [1, 10, 20, 21],
            "ts": [ts(1, 30, 23), ts(1, 2, 10), ts(1, 14, 10), ts(1, 14, 11)],
            "user_id": [1, 2, 3, 3],
            "event_type": ["click"] * 4,
            "value": [0.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    sf_dir = str(tmp_path / "lateagg_fixture")
    os.makedirs(sf_dir)
    pq.write_table(
        pa.Table.from_pandas(rows, schema=schema),
        f"{sf_dir}/events.parquet",
    )
    got = {
        r.wstart_us: r.cnt
        for r in QUERIES["events_stream_late_drop_agg"](
            spark, sf_dir
        ).collect()
    }
    day_us = 86_400_000_000

    def day_start(mo, d):
        us = int(pd.Timestamp(2024, mo, d).value // 1000)
        assert us % day_us == 0  # window starts are day-aligned
        return us

    assert day_start(1, 2) not in got, got       # finalized window: DROPPED
    assert got.get(day_start(1, 14)) == 2, got   # open window: MERGED, then
    #                                              finalized by the nudge
    assert got.get(day_start(1, 30)) == 1, got   # fresh row's window emitted
    assert got.get(day_start(1, 16)) == 1, got   # the spacer's window
    assert day_start(3, 1) not in got, got       # nudge window never closes
    assert len(got) == 3  # exactly the three emitted windows


def test_late_drop_agg_boundary_window_end_equals_watermark(
    spark, tmp_path
):
    """Pins the one boundary the corpus never exercises (its watermark is
    never midnight-aligned): a late click whose DAY-WINDOW END equals the
    in-force watermark EXACTLY.  The fresh click at Jan 30 00:00:00.000
    makes wm = Jan 9 00:00:00.000 precisely (504h delay, exact ms), so

      late @ Jan 8 10:00  -> window end Jan 9 == wm  (the boundary case)
      late @ Jan 9 10:00  -> window end Jan 10 > wm  (control: merges)

    The registered oracle keeps a late row iff window_end > wm (strict),
    i.e. it predicts the boundary row is DROPPED — this test fails first
    if a Spark upgrade (or a mis-pinned predicate) flips that."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import QUERIES

    rows = pd.DataFrame(
        {
            "event_id": [1, 10, 20],
            "ts": [
                pd.Timestamp(2024, 1, 30),      # fresh: wm -> Jan 9 00:00
                pd.Timestamp(2024, 1, 8, 10),   # boundary: end == wm
                pd.Timestamp(2024, 1, 9, 10),   # control: end > wm
            ],
            "user_id": [1, 2, 3],
            "event_type": ["click"] * 3,
            "value": [0.0] * 3,
            "props": ["{}"] * 3,
        }
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    sf_dir = str(tmp_path / "lateagg_boundary")
    os.makedirs(sf_dir)
    pq.write_table(
        pa.Table.from_pandas(rows, schema=schema),
        f"{sf_dir}/events.parquet",
    )
    got = {
        r.wstart_us: r.cnt
        for r in QUERIES["events_stream_late_drop_agg"](
            spark, sf_dir
        ).collect()
    }
    day_us = 86_400_000_000

    def day_start(mo, d):
        return int(pd.Timestamp(2024, mo, d).value // 1000)

    assert day_start(1, 8) not in got, got   # end == wm: DROPPED (strict >)
    assert got.get(day_start(1, 9)) == 1, got   # end > wm: merged + emitted
    assert got.get(day_start(1, 30)) == 1, got
    assert day_us  # (documented unit for the day_start math)
