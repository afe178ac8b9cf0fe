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


def _ttl_drain(spark, feed_dir, multi_file=False):
    """Drain the state-TTL fold over a feed dir (the registered query's
    plan with the file-per-batch option for crafted multi-batch feeds)."""
    import uuid

    from pyspark.sql.streaming.state import GroupStateTimeout

    from pyspark_text_classification_spark.functions.time import ts_us
    from pyspark_text_classification_spark.streaming.ttl import (
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        TTL_DELAY,
        _ttl_group,
    )

    src = spark.readStream.schema(EVENTS_STREAM_SCHEMA).format("parquet")
    if multi_file:
        src = src.option("maxFilesPerTrigger", 1).option(
            "latestFirst", "false"
        )
    stream = (
        src.load(str(feed_dir))
        .select(
            "event_id",
            "user_id",
            F.timestamp_micros(ts_us()).alias("event_ts"),
            ts_us().alias("ts_us"),
        )
        .withWatermark("event_ts", TTL_DELAY)
        .groupBy("user_id")
        .applyInPandasWithState(
            _ttl_group,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    name = f"ttl_test_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).collect()


def _ttl_feed(tmp_path, batches):
    """Write one parquet file per batch with mtimes pinning replay order."""
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    d = tmp_path / "ttl_feed"
    os.makedirs(d)
    now = time.time()
    for i, rows in enumerate(batches):
        b = pd.DataFrame(rows, columns=cols)
        b["ts"] = pd.to_datetime(b["ts"], unit="us").astype("datetime64[us]")
        p = d / f"b{i}.parquet"
        b.to_parquet(str(p), index=False)
        os.utime(p, (now - 100 * (len(batches) - i), ) * 2)
    return d


def test_state_ttl_evicts_idle_user_between_batches(spark, tmp_path):
    """The split-batch eviction the TTL twin exists for: user 7's state is
    created in batch 0, no further user-7 events ever arrive, and user
    9's later batches advance the watermark past 7's last + TTL — the
    EventTimeTimeout path must emit 7's session tagged 'timeout' and
    evict the state, while user 9's still-recent session stays in the
    store unemitted."""
    from pyspark_text_classification_spark.streaming.ttl import TTL_MS

    assert TTL_MS == 43_200_000  # the 12h the timings below encode
    feed = _ttl_feed(
        tmp_path,
        [
            # batch 0: user 7 at 1h and 2h -> state (n=2, last=2h)
            [
                (1, 1 * HOUR_US, 7, "click", 1.0, "{}"),
                (2, 2 * HOUR_US, 7, "click", 1.0, "{}"),
            ],
            # batch 1: user 9 at 20h -> after it, wm = 19h > 2h+12h
            [(3, 20 * HOUR_US, 9, "click", 1.0, "{}")],
            # batch 2: user 9 again (gap < TTL, same open session); runs
            # under wm=19h, so user 7's timeout fires HERE — between
            # batches, not merely at the final no-data sweep
            [(4, int(20.5 * HOUR_US), 9, "click", 1.0, "{}")],
        ],
    )
    rows = _ttl_drain(spark, feed, multi_file=True)
    assert len(rows) == 1, rows
    r = rows[0]
    assert (
        r.user_id,
        r.n_events,
        r.first_us,
        r.last_us,
        r.closed_by,
    ) == (7, 2, 1 * HOUR_US, 2 * HOUR_US, "timeout"), rows


def test_state_ttl_boundary_timeout_needs_strictly_greater_watermark(
    spark, tmp_path
):
    """Pins the eviction boundary the bundled corpus cannot hit exactly:
    a session whose last_ms + TTL equals the final watermark TO THE
    MILLISECOND is NOT evicted (timeouts fire on wm > ts, strictly);
    one more millisecond of watermark evicts it.  The registered
    oracle's strict '<' keep-predicate encodes exactly this — the test
    fails first if a Spark upgrade flips the comparison."""
    from pyspark_text_classification_spark.streaming.ttl import TTL_MS

    def drain(max_extra_ms):
        # user 7 last at 1h; wm_final = floor_ms(max) - 1h delay.
        # max = 14h + extra -> wm_final = 13h + extra = (1h + TTL) + extra
        feed = _ttl_feed(
            tmp_path / f"x{max_extra_ms}",
            [[
                (1, 1 * HOUR_US, 7, "click", 1.0, "{}"),
                (2, 14 * HOUR_US + max_extra_ms * 1000, 9, "click", 1.0,
                 "{}"),
            ]],
        )
        return {
            (r.user_id, r.closed_by): r.n_events
            for r in _ttl_drain(spark, feed)
        }
    assert TTL_MS == 43_200_000
    assert drain(0) == {}, "wm == last+TTL exactly must NOT evict (strict >)"
    assert drain(1) == {(7, "timeout"): 1}, "one ms past the boundary evicts"


def test_state_ttl_rejects_multi_file_and_directory_sources(spark, tmp_path):
    """ADVICE r9: the registered TTL oracle labels every non-final
    session 'gap', which is only correct when the whole corpus arrives
    as ONE data batch — i.e. the glob resolves to exactly one regular
    file.  A directory-parquet events.parquet (what a 10x fixture
    builder writes by default) or a missing file must fail loudly in
    stream_state_ttl rather than hash-mismatching on closed_by (or
    silently running an empty stream: pathGlobFilter matches nothing
    on directories)."""
    import pytest

    from pyspark_text_classification_spark.streaming.ttl import (
        stream_state_ttl,
    )

    # directory named events.parquet (Spark-style directory output)
    d = tmp_path / "dirsrc"
    (d / "events.parquet").mkdir(parents=True)
    (d / "events.parquet" / "part-00000.parquet").write_bytes(b"")
    with pytest.raises(ValueError, match="ONE data batch"):
        stream_state_ttl(spark, str(d))

    # missing file entirely
    e = tmp_path / "emptysrc"
    e.mkdir()
    with pytest.raises(ValueError, match="ONE data batch"):
        stream_state_ttl(spark, str(e))
