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
    gap = SESSION_GAP_US  # session gap in µs (events.ts is TIMESTAMP(MICROS))
    rows = []
    for uid in (1, 2):
        # session A: two events; session B: two events after a > gap pause.
        # near-identical bases INTERLEAVE the users' timelines, so the
        # mid-point file split puts every user's session B in batch 2 —
        # its session_id is 2 only if batch 1's state survived.
        base = 10 * gap + uid
        rows += [
            (uid * 100 + 1, base, uid, "click", 1.0, "{}"),
            (uid * 100 + 2, base + 60, uid, "view", 1.0, "{}"),
            (uid * 100 + 3, base + gap + 120, uid, "click", 1.0, "{}"),
            (uid * 100 + 4, base + gap + 180, uid, "view", 1.0, "{}"),
        ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(rows, columns=cols).sort_values("ts")
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
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

def test_stream_near_dup_across_batches_matches_batch(spark, tmp_path):
    """The streaming near-dup admission filter must equal the batch
    similarity_near_dup on a drained replay even when the vectors arrive
    split across micro-batches — each batch joins the same static LSH
    index, and the a < b guard keeps every pair exactly once no matter
    which batch its members arrive in."""
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import QUERIES
    from pyspark_text_classification_spark.operators.similarity import (
        lsh_bucket_table,
        with_norms,
    )
    from pyspark_text_classification_spark.sources.parquet import load_table
    from pyspark_text_classification_spark.streaming.similarity import (
        EMB_STREAM_SCHEMA,
        near_dup_stream_frame,
    )

    sf = "/root/testdata/sf0.001"
    want = {
        (r.vec_id, r.neighbor_id, r.cos_sim)
        for r in QUERIES["similarity_near_dup"](spark, sf).collect()
    }
    assert want, "fixture should contain near-dup pairs"

    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    d = tmp_path / "emb_stream"
    os.makedirs(d)
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), str(d / "a_first.parquet"))
    pq.write_table(tbl.slice(half), str(d / "b_second.parquet"))
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    static_e = with_norms(load_table(spark, sf, "embeddings")).persist()
    index = lsh_bucket_table(static_e).persist()
    index.count()
    src = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(str(d))
    )
    near = near_dup_stream_frame(src, static_e, index)
    q = (
        near.writeStream.format("memory")
        .queryName("near_dup_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.vec_id, r.neighbor_id, r.cos_sim)
        for r in spark.table("near_dup_mb").collect()
    }
    static_e.unpersist()
    index.unpersist()
    assert got == want


def test_idempotent_sink_exactly_once_on_replay_and_restart(spark, tmp_path):
    """foreachBatch parquet sink: a replayed batch_id must overwrite its own
    partition (no duplicates), and a clean restart from the same checkpoint
    must not reprocess committed batches."""
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.sources.parquet import load_table
    from pyspark_text_classification_spark.streaming.infer import (
        DOCS_STREAM_SCHEMA,
    )
    from pyspark_text_classification_spark.streaming.sink import (
        idempotent_parquet_sink,
        write_batch_idempotent,
    )

    sf = "/root/testdata/sf0.001"
    src_dir = tmp_path / "sink_src"
    os.makedirs(src_dir)
    tbl = pq.read_table(f"{sf}/documents.parquet")
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), str(src_dir / "a_first.parquet"))
    pq.write_table(tbl.slice(half), str(src_dir / "b_second.parquet"))
    now = time.time()
    os.utime(src_dir / "a_first.parquet", (now - 100, now - 100))
    os.utime(src_dir / "b_second.parquet", (now, now))

    out = str(tmp_path / "sink_out")
    ckpt = str(tmp_path / "sink_ckpt")
    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # two micro-batches
        .load(str(src_dir))
    )
    idempotent_parquet_sink(src, out, ckpt).awaitTermination()

    want = load_table(spark, sf, "documents").count()
    assert spark.read.parquet(out).count() == want
    # two batch partitions were committed
    batches = {p for p in os.listdir(out) if p.startswith("batch_id=")}
    assert batches == {"batch_id=0", "batch_id=1"}

    # crash replay: re-deliver batch 1's frame with the same batch_id —
    # the partition is overwritten, not appended
    replay = spark.read.parquet(str(src_dir / "b_second.parquet"))
    write_batch_idempotent(replay, 1, out)
    assert spark.read.parquet(out).count() == want

    # clean restart on the same checkpoint: offsets are committed, so the
    # drained source yields no new batch and the output is untouched
    src2 = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .load(str(src_dir))
    )
    idempotent_parquet_sink(src2, out, ckpt).awaitTermination()
    assert spark.read.parquet(out).count() == want


def test_closed_sessions_deterministic_across_batch_split(spark, tmp_path):
    """The closed-session emitter must produce the same session rows no
    matter where the micro-batch boundary falls — including a boundary in
    the MIDDLE of a session (state carries the open session across)."""
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import ORACLES
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf}/events.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            ORACLES["events_stream_closed_sessions"]
        ).fetchall()
    }
    assert want, "fixture should close at least one session"

    # split the events table into three files -> three micro-batches
    tbl = pq.read_table(f"{sf}/events.parquet")
    d = tmp_path / "closed_src"
    os.makedirs(d)
    third = tbl.num_rows // 3
    pq.write_table(tbl.slice(0, third), str(d / "a.parquet"))
    pq.write_table(tbl.slice(third, third), str(d / "b.parquet"))
    pq.write_table(tbl.slice(2 * third), str(d / "c.parquet"))
    now = time.time()
    for i, f in enumerate(("a.parquet", "b.parquet", "c.parquet")):
        os.utime(d / f, (now - 300 + i * 100, now - 300 + i * 100))

    from pyspark.sql.streaming.state import GroupStateTimeout

    from pyspark_text_classification_spark.functions.time import TS_US_EXPR
    from pyspark_text_classification_spark.streaming.sessionize import (
        _CLOSED_OUT_SCHEMA,
        _CLOSED_STATE_SCHEMA,
        _closed_sessions_group,
    )

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(str(d))
    )
    closed = (
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
    q = (
        closed.writeStream.format("memory")
        .queryName("closed_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_id, r.n_events, r.start_us, r.end_us)
        for r in spark.table("closed_mb").collect()
    }
    assert got == want


def test_stream_ohlc_merge_correct_under_reversed_arrival(spark, tmp_path):
    """open/close from struct min/max must be arrival-order-independent:
    the LATEST event of the hour arrives in micro-batch 1 and the
    EARLIEST in micro-batch 2 — a first()/last()-style aggregate would
    report batch order; the struct extremes must report event time."""
    from pyspark_text_classification_spark.streaming.events import ohlc_agg

    hour_us = 3_600_000_000
    base = 100 * hour_us  # one clean hour bucket
    rows = [
        # (event_id, ts_us, user_id, type, value) — ts INTENTIONALLY not
        # aligned with file order below
        (1, base + 3000, 1, "click", 5.0),   # latest  -> close
        (2, base + 1000, 1, "click", 1.0),   # earliest -> open
        (3, base + 2000, 1, "click", 9.0),   # high
        (4, base + 2500, 1, "click", 0.5),   # low
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(
        [(i, t, u, e, v, "{}") for i, t, u, e, v in rows], columns=cols
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
    d = tmp_path / "ohlc_src"
    os.makedirs(d)
    # batch 1 = latest event only; batch 2 = the rest (reversed arrival)
    pdf.iloc[:1].to_parquet(str(d / "a_first.parquet"), index=False)
    pdf.iloc[1:].to_parquet(str(d / "b_second.parquet"), index=False)
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    sink = "ohlc_split_sink"
    q = (
        ohlc_agg(src)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table(sink).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_events, r.open, r.close, r.high, r.low) == (4, 1.0, 5.0, 9.0, 0.5)
    assert r.hour_epoch_s == 100 * 3600


def test_conversion_state_survives_batch_split(spark, tmp_path):
    """A user whose first view and first purchase land in DIFFERENT
    micro-batches must still convert — exactly once, with the latency
    measured from the batch-1 view; purchases before any view never
    convert."""
    from pyspark_text_classification_spark.streaming.convert import (
        _convert_group,  # exercised through the real stream below
    )

    base = 1_000_000_000_000  # µs
    rows = [
        # user 1: view in batch 1, purchase in batch 2 -> converts (300s)
        (101, base, 1, "view", 1.0, "{}"),
        (102, base + 100_000_000, 1, "click", 1.0, "{}"),
        (103, base + 300_000_000, 1, "purchase", 1.0, "{}"),
        # second purchase later must NOT re-emit
        (104, base + 400_000_000, 1, "purchase", 1.0, "{}"),
        # user 2: purchase BEFORE any view -> never converts
        (201, base + 50_000_000, 2, "purchase", 1.0, "{}"),
        (202, base + 150_000_000, 2, "click", 1.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(rows, columns=cols).sort_values("ts")
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
    d = tmp_path / "conv_src"
    os.makedirs(d)
    half = len(pdf) // 2  # split lands between user 1's view and purchase
    pdf.iloc[:half].to_parquet(str(d / "a_first.parquet"), index=False)
    pdf.iloc[half:].to_parquet(str(d / "b_second.parquet"), index=False)
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    conv = (
        src.selectExpr(
            "event_id", "user_id", "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _convert_group,
            outputStructType="user_id LONG, latency_s LONG",
            stateStructType="first_view_us LONG, emitted INT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = "conv_split_sink"
    q = (
        conv.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [(r.user_id, r.latency_s) for r in spark.table(sink).collect()]
    assert got == [(1, 300)]


def test_processing_time_timeout_evicts_idle_state(spark, tmp_path):
    """GroupStateTimeout.ProcessingTimeTimeout: a user idle across a
    micro-batch boundary must be evicted via the timeout path (empty
    batch iterator + hasTimedOut) — the state-eviction mechanism the
    stateful operators document for production unbounded streams."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})
            return
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        state.setTimeoutDuration(1)  # 1 ms: fires at the next batch
        yield pd.DataFrame({"user_id": [], "n_events": []}).astype(
            {"user_id": "int64", "n_events": "int64"}
        )

    base = 1_000_000_000_000
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    b1 = pd.DataFrame(
        [(1, base, 1, "click", 1.0, "{}"), (2, base + 10, 1, "view", 1.0, "{}")],
        columns=cols,
    )
    b2 = pd.DataFrame([(3, base + 20, 2, "click", 1.0, "{}")], columns=cols)
    d = tmp_path / "timeout_src"
    os.makedirs(d)
    for pdf, name, age in ((b1, "a_first.parquet", 100), (b2, "b_second.parquet", 0)):
        pdf = pdf.copy()
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
        pdf.to_parquet(str(d / name), index=False)
        now = time.time()
        os.utime(d / name, (now - age, now - age))

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    evicted = (
        src.select("event_id", "user_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType="user_id LONG, n_events LONG",
            stateStructType="n LONG",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
    sink = "timeout_evict_sink"
    # availableNow would stop before pending timeouts fire; run a paced
    # trigger and poll until the eviction lands, then stop the query
    q = (
        evicted.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        got: list = []
        while time.time() < deadline:
            got = [(r.user_id, r.n_events) for r in spark.table(sink).collect()]
            if got:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # user 1 (idle after batch 1) was evicted with its batch-1 count
    assert (1, 2) in got


def test_stream_pq_codes_across_batches_matches_batch(spark, tmp_path):
    """The streaming PQ encoder must equal batch similarity_pq_codes on a
    drained replay even when vectors arrive split across micro-batches —
    the encode is stateless per row against a literal codebook, so
    batch-split invariance is structural; this pins it."""
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import QUERIES
    from pyspark_text_classification_spark.operators.pq import (
        _quantized,
        pq_codebook_refined,
    )
    from pyspark_text_classification_spark.streaming.pq import (
        pq_codes_stream_frame,
    )
    from pyspark_text_classification_spark.streaming.similarity import (
        EMB_STREAM_SCHEMA,
    )

    sf = "/root/testdata/sf0.001"
    want = {
        tuple(sorted(r.asDict().items()))
        for r in QUERIES["similarity_pq_codes"](spark, sf).collect()
    }
    assert want

    tbl = pq.read_table(f"{sf}/embeddings.parquet")
    d = tmp_path / "emb_pq_stream"
    os.makedirs(d)
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), str(d / "a_first.parquet"))
    pq.write_table(tbl.slice(half), str(d / "b_second.parquet"))
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    cb_rows = pq_codebook_refined(_quantized(spark, sf)).collect()
    src = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    frame = pq_codes_stream_frame(src, cb_rows)
    q = (
        frame.writeStream.format("memory")
        .queryName("pq_codes_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        tuple(sorted(r.asDict().items()))
        for r in spark.table("pq_codes_mb").collect()
    }
    assert got == want


def test_stream_enrich_accumulates_across_batches(spark, sf_dir, tmp_path):
    """Stream-static broadcast enrichment: with orders split across two
    micro-batches, the complete-mode per-nation aggregate must equal the
    batch customer⋈orders GROUP BY — the static dim side is re-read and
    re-broadcast per trigger, and the aggregate state accumulates."""
    import uuid

    from pyspark_text_classification_spark.sources.parquet import load_table
    from pyspark_text_classification_spark.streaming.enrich import (
        ORDERS_STREAM_SCHEMA,
        enrich_frame,
    )

    orders = load_table(spark, sf_dir, "orders")
    pdf = orders.toPandas().sort_values("o_orderkey")
    d = tmp_path / "orders_stream"
    os.makedirs(d)
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(str(d / "a_first.parquet"), index=False)
    pdf.iloc[half:].to_parquet(str(d / "b_second.parquet"), index=False)
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    src = (
        spark.readStream.schema(ORDERS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(str(d))
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    enriched = enrich_frame(src, dim)  # the PRODUCTION frame builder
    sink = f"enrich_mb_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None  # stream actually ran

    got = {
        r["c_nationkey"]: (r["n_orders"], r["revenue_c"])
        for r in spark.table(sink).collect()
    }
    want = {
        r["c_nationkey"]: (r["n_orders"], r["revenue_c"])
        for r in enrich_frame(orders, dim).collect()
    }
    assert got == want


def test_stream_cms_sketch_merges_across_batches(spark, sf_dir, tmp_path):
    """Streaming Count-Min: with the corpus split across two
    micro-batches, the complete-mode (row_id, cell) counts must equal
    the batch sketch over the union — CMS's linearity is exactly what
    makes per-batch partials merge into the state store losslessly."""
    import uuid

    from pyspark_text_classification_spark.sources.parquet import load_table
    from pyspark_text_classification_spark.streaming.infer import (
        DOCS_STREAM_SCHEMA,
    )
    from pyspark_text_classification_spark.streaming.sketch import (
        cms_sketch_frame,
    )

    docs = load_table(spark, sf_dir, "documents")
    pdf = docs.toPandas().sort_values("doc_id")
    d = tmp_path / "docs_stream"
    os.makedirs(d)
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(str(d / "a_first.parquet"), index=False)
    pdf.iloc[half:].to_parquet(str(d / "b_second.parquet"), index=False)
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .load(str(d))
    )
    sink = f"cms_mb_{uuid.uuid4().hex[:8]}"
    q = (
        cms_sketch_frame(src)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    got = {
        (r["row_id"], r["cell"]): r["cell_sum"]
        for r in spark.table(sink).collect()
    }
    want = {
        (r["row_id"], r["cell"]): r["cell_sum"]
        for r in cms_sketch_frame(docs).collect()
    }
    assert got == want


def test_scd2_interval_closes_across_batch_split(spark, tmp_path):
    """A state run OPENED in batch 1 and CLOSED in batch 2 must emit one
    interval with the batch-1 valid_from; the final (open) state emits
    nothing."""
    from pyspark_text_classification_spark.streaming.scd2 import (
        _OUT_SCHEMA as SCD_OUT,
        _STATE_SCHEMA as SCD_STATE,
        _scd2_group,
    )

    base = 1_000_000_000_000  # µs
    rows = [
        # user 1: view-run opens in batch 1, closes on click in batch 2
        (101, base, 1, "view", 1.0, "{}"),
        (102, base + 100_000_000, 1, "view", 1.0, "{}"),
        (103, base + 300_000_000, 1, "click", 1.0, "{}"),
        # click-run stays open -> no second interval
        (104, base + 400_000_000, 1, "click", 1.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(rows, columns=cols).sort_values("ts")
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
    d = tmp_path / "scd2_src"
    os.makedirs(d)
    half = len(pdf) // 2  # split lands inside the view run
    pdf.iloc[:half].to_parquet(str(d / "a_first.parquet"), index=False)
    pdf.iloc[half:].to_parquet(str(d / "b_second.parquet"), index=False)
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    iv = (
        src.selectExpr(
            "event_id", "user_id", "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _scd2_group,
            outputStructType=SCD_OUT,
            stateStructType=SCD_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = "scd2_split_sink"
    q = (
        iv.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r.user_id, r.state, r.valid_from_us, r.valid_to_us)
        for r in spark.table(sink).collect()
    ]
    assert got == [(1, "view", base, base + 300_000_000)]


def test_funnel_state_survives_batch_split(spark, tmp_path):
    """A user whose funnel steps land in THREE different micro-batches
    must still complete — exactly once, with the step timestamps the
    batch CTE chain would produce; out-of-order steps (click before any
    view, purchase before any click) never complete."""
    from pyspark_text_classification_spark.streaming.funnel import (
        _funnel_group,  # exercised through the real stream below
    )

    base = 1_000_000_000_000  # µs
    rows = [
        # user 1: view (b1), click (b2), purchase (b3) -> completes once
        (101, base, 1, "view", 1.0, "{}"),
        (102, base + 100_000_000, 1, "click", 1.0, "{}"),
        (103, base + 300_000_000, 1, "purchase", 1.0, "{}"),
        # a second purchase must NOT re-emit
        (104, base + 400_000_000, 1, "purchase", 1.0, "{}"),
        # user 2: click then purchase, no view -> never completes
        (201, base + 50_000_000, 2, "click", 1.0, "{}"),
        (202, base + 150_000_000, 2, "purchase", 1.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(rows, columns=cols).sort_values("ts")
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
    d = tmp_path / "funnel_src"
    os.makedirs(d)
    # three files -> three micro-batches, one funnel step per batch
    splits = [(0, 2, "a"), (2, 4, "b"), (4, 6, "c")]
    now = time.time()
    for i, (lo, hi, tag) in enumerate(splits):
        p = d / f"{tag}_part.parquet"
        pdf.iloc[lo:hi].to_parquet(str(p), index=False)
        os.utime(p, (now - 100 + i, now - 100 + i))

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    fun = (
        src.selectExpr(
            "event_id", "user_id", "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_group,
            outputStructType="user_id LONG, t1_us LONG, t2_us LONG, t3_us LONG",
            stateStructType="t1 LONG, t2 LONG, emitted INT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = "funnel_split_sink"
    q = (
        fun.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.table(sink).collect()
    ]
    assert got == [(1, base, base + 100_000_000, base + 300_000_000)]


def test_windowed_funnel_expires_out_of_window_steps(spark, tmp_path):
    """A click arriving after the first view's conversion window must
    kill the funnel (done-marker state), even when the expiry only
    becomes observable in a LATER micro-batch; an in-window user
    completes normally."""
    from pyspark_text_classification_spark.operators.funnel import (
        FUNNEL_WINDOW_US,
    )
    from pyspark_text_classification_spark.streaming.funnel import (
        _funnel_windowed_group,
    )

    base = 1_000_000_000_000  # µs
    late = base + FUNNEL_WINDOW_US + 1
    rows = [
        # user 1: in-window funnel across batches -> completes
        (101, base, 1, "view", 1.0, "{}"),
        (102, base + 100_000_000, 1, "click", 1.0, "{}"),
        (103, base + 200_000_000, 1, "purchase", 1.0, "{}"),
        # user 2: click lands AFTER the view's window -> dead, never
        # completes even though a purchase follows promptly
        (201, base, 2, "view", 1.0, "{}"),
        (202, late, 2, "click", 1.0, "{}"),
        (203, late + 100, 2, "purchase", 1.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(rows, columns=cols).sort_values("ts")
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
    d = tmp_path / "wfunnel_src"
    os.makedirs(d)
    now = time.time()
    for i, (lo, hi, tag) in enumerate([(0, 4, "a"), (4, 6, "b")]):
        p = d / f"{tag}_part.parquet"
        pdf.iloc[lo:hi].to_parquet(str(p), index=False)
        os.utime(p, (now - 100 + i, now - 100 + i))

    from pyspark.sql.streaming.state import GroupStateTimeout

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    fun = (
        src.selectExpr(
            "event_id", "user_id", "event_type",
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
            " ts) AS ts_us",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_windowed_group,
            outputStructType="user_id LONG, t1_us LONG, t2_us LONG, t3_us LONG",
            stateStructType="t1 LONG, t2 LONG, done INT",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = "wfunnel_split_sink"
    q = (
        fun.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.t1_us, r.t2_us, r.t3_us)
        for r in spark.table(sink).collect()
    )
    assert got == [(1, base, base + 100_000_000, base + 200_000_000)]


def test_pattern_alert_window_spans_batches(spark, tmp_path):
    """A sliding window whose 8 values straddle TWO micro-batches must
    still alert (state carries the trailing 7 values); a user whose
    series never approaches the pattern stays silent."""
    from pyspark_text_classification_spark.operators.events import (
        PATTERN_Q,
    )
    from pyspark_text_classification_spark.streaming.pattern import (
        _OUT_SCHEMA as P_OUT,
        _STATE_SCHEMA as P_STATE,
        _pattern_group,
    )

    base = 1_000_000_000_000  # µs
    rows = []
    # user 1: values exactly the query pattern (d2 = 0), split 5 + 3
    for i, q in enumerate(PATTERN_Q):
        rows.append((100 + i, base + i * 1_000_000, 1, "view", q / 100.0, "{}"))
    # user 2: far from the pattern everywhere
    for i in range(8):
        rows.append((200 + i, base + i * 1_000_000, 2, "view", 90_000.0, "{}"))
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    pdf = pd.DataFrame(rows, columns=cols).sort_values(["user_id", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us").astype("datetime64[us]")
    d = tmp_path / "pattern_src"
    os.makedirs(d)
    now = time.time()
    # batch 1: user 1's first 5 values + user 2's first 5; batch 2: rest
    b1 = pdf[(pdf.event_id.isin(range(100, 105))) | (pdf.event_id.isin(range(200, 205)))]
    b2 = pdf[~pdf.event_id.isin(b1.event_id)]
    for i, (tag, part) in enumerate((("a", b1), ("b", b2))):
        p = d / f"{tag}_part.parquet"
        part.to_parquet(str(p), index=False)
        os.utime(p, (now - 100 + i, now - 100 + i))

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
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
            outputStructType=P_OUT,
            stateStructType=P_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = "pattern_split_sink"
    q = (
        alerts.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = [(r.user_id, r.event_id, r.d2) for r in spark.table(sink).collect()]
    # exactly one alert: user 1's full window, completing at event 107,
    # exact match (d2 = 0) — discovered in batch 2 from carried state
    assert got == [(1, 107, 0)]


def test_stream_cusum_counts_merge_across_batches(spark, sf_dir, tmp_path):
    """Streaming CUSUM: with the event log split across two
    micro-batches, the complete-mode hourly counts must equal the batch
    counts over the union (the algebraic-aggregate property the monitor
    rests on), and the shared peak reduction over them must equal the
    batch CUSUM row for row."""
    import uuid

    from pyspark_text_classification_spark.operators.timeseries import (
        cusum_peak,
        series_from_counts,
    )
    from pyspark_text_classification_spark.sources.parquet import load_table
    from pyspark_text_classification_spark.streaming.cusum import (
        hourly_counts_frame,
    )
    from pyspark_text_classification_spark.streaming.events import (
        EVENTS_STREAM_SCHEMA,
    )

    import pyarrow.parquet as pq

    ev = load_table(spark, sf_dir, "events")
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    d = tmp_path / "events_stream"
    os.makedirs(d)
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), str(d / "a_first.parquet"))
    pq.write_table(tbl.slice(half), str(d / "b_second.parquet"))
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    src = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(d))
    )
    sink = f"cusum_mb_{uuid.uuid4().hex[:8]}"
    q = (
        hourly_counts_frame(src)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    drained = spark.table(sink).localCheckpoint(eager=True)
    got_counts = {
        (r["event_type"], r["h"]): r["y"] for r in drained.collect()
    }
    want_counts = {
        (r["event_type"], r["h"]): r["y"]
        for r in hourly_counts_frame(ev).collect()
    }
    assert got_counts == want_counts

    got = sorted(
        tuple(r) for r in cusum_peak(series_from_counts(drained)).collect()
    )
    want = sorted(
        tuple(r)
        for r in cusum_peak(
            series_from_counts(hourly_counts_frame(ev))
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_ivf_delete_accumulates_across_batch_split(spark, tmp_path):
    """The tombstone feed's complete-mode balance must ACCUMULATE across
    micro-batches: a cell receiving tombstones in batch 1 AND batch 2
    reports their SUM, and a cell whose only tombstone arrived in batch
    1 keeps its row in the final complete-mode table (state is the
    running (cell, count) aggregate, not the last batch's).  This is
    the split the registered single-file drain cannot produce — pinned
    here on a crafted 2-file feed against a hand-built member table."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    # static member table: 6 vectors in 3 cells
    members = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 20), (5, 30), (6, 30)],
        "vec_id LONG, cent_id LONG",
    ).localCheckpoint(eager=True)
    percell = (
        members.groupBy("cent_id")
        .agg(F.count("*").alias("n_members"))
        .localCheckpoint(eager=True)
    )

    # tombstone feed: batch 1 deletes {1, 3}, batch 2 deletes {2, 5} —
    # cell 10 spans BOTH batches (sum = 2), cell 20 only batch 1,
    # cell 30 only batch 2; cell totals: 10 -> 2/2, 20 -> 1/2, 30 -> 1/2
    d = tmp_path / "tomb_feed"
    os.makedirs(d)
    schema = pa.schema([("vec_id", pa.int64())])
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"vec_id": [1, 3]}), schema=schema),
        str(d / "a_first.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"vec_id": [2, 5]}), schema=schema),
        str(d / "b_second.parquet"),
    )
    now = time.time()
    os.utime(d / "a_first.parquet", (now - 100, now - 100))
    os.utime(d / "b_second.parquet", (now, now))

    src = (
        spark.readStream.schema("vec_id long")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)  # one tombstone file per batch
        .load(str(d))
    )
    counts = (
        src.join(members, "vec_id")
        .join(F.broadcast(percell), "cent_id")
        .groupBy("cent_id", "n_members")
        .agg(F.count("*").cast("long").alias("n_deleted"))
        .select(
            F.col("cent_id").alias("cell_id"),
            "n_members",
            "n_deleted",
            (F.col("n_members") - F.col("n_deleted")).alias("n_remaining"),
        )
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("tomb_split")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.cell_id: (r.n_members, r.n_deleted, r.n_remaining)
        for r in spark.table("tomb_split").collect()
    }
    assert got == {
        10: (2, 2, 0),   # accumulated across BOTH batches
        20: (2, 1, 1),   # batch-1-only cell survives the final emit
        30: (2, 1, 1),
    }, got
