"""Unit tests for temporal joins (as-of, range), analytic aggregates, and
the sketch/exact agreement contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from pyspark_text_classification_spark.all_queries import QUERIES


def _events_frame(spark, rows):
    """rows: (event_id, user_id, ts_us, event_type). Writes a parquet dir
    shaped like the testdata (ts TIMESTAMP(MICROS) -> TIMESTAMP_NTZ) so
    load_table-based queries can read it."""
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    return spark.createDataFrame(
        [
            (e, epoch + datetime.timedelta(microseconds=t), u, ty, 1.0, "{}")
            for e, u, t, ty in rows
        ],
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    )


@pytest.fixture()
def tiny_events_dir(spark, tmp_path):
    rows = [
        # user 1: click, purchase 10us later, purchase with no prior click
        (1, 1, 100, "click"),
        (2, 1, 110, "purchase"),
        (3, 2, 50, "purchase"),  # user 2: purchase before any click
        (4, 2, 60, "click"),
        # user 3: two clicks same microsecond -> dedup keeps max event_id,
        # then a purchase at the SAME microsecond (<= must match it)
        (5, 3, 200, "click"),
        (6, 3, 200, "click"),
        (7, 3, 200, "purchase"),
        # user 4: signup, purchase exactly 1h later (boundary, included),
        # purchase 1h+1us later (excluded)
        (8, 4, 0, "signup"),
        (9, 4, 3_600_000_000, "purchase"),
        (10, 4, 3_600_000_001, "purchase"),
    ]
    path = tmp_path / "tiny"
    _events_frame(spark, rows).write.parquet(str(path / "events.parquet"))
    return str(path)


def test_asof_join_semantics(spark, tiny_events_dir):
    out = {
        r.event_id: (r.last_click_id, r.click_gap_us)
        for r in QUERIES["events_asof_join"](spark, tiny_events_dir).collect()
    }
    assert out[2] == (1, 10)  # most recent prior click
    assert out[3] == (None, None)  # LEFT: no prior click -> nulls kept
    assert out[7] == (6, 0)  # same-instant click matches; dedup kept max id


def test_range_join_boundary(spark, tiny_events_dir):
    pairs = {
        (r.signup_id, r.purchase_id, r.delay_us)
        for r in QUERIES["events_range_join"](spark, tiny_events_dir).collect()
    }
    assert (8, 9, 3_600_000_000) in pairs  # exactly 1h: included
    assert all(p != 10 for _, p, _ in pairs)  # 1h + 1us: excluded


def test_approx_sketches_close_to_exact(spark, sf_dir):
    """q26 is the sketch-accuracy audit: every tolerance boolean it emits
    must be TRUE (the oracle's stated invariant) and its group grain must
    match the exact-percentile query's."""
    exact = {
        r.l_returnflag
        for r in QUERIES["q24_percentiles"](spark, sf_dir).collect()
    }
    approx = QUERIES["q26_approx_sketches"](spark, sf_dir).collect()
    assert {r.l_returnflag for r in approx} == exact
    for r in approx:
        assert r.ap25_ok and r.ap50_ok and r.ap75_ok and r.ap95_ok, (
            r.l_returnflag,
        )
        assert r.distinct_ok, (r.l_returnflag,)


def test_window_analytics_rank_and_lag(spark, sf_dir):
    df = QUERIES["q25_window_analytics"](spark, sf_dir)
    one_cust = (
        df.filter(F.col("o_custkey") == df.first().o_custkey)
        .orderBy("price_rank")
        .collect()
    )
    ranks = [r.price_rank for r in one_cust]
    assert ranks == sorted(ranks) and ranks[0] == 1
    # running sum is non-decreasing in time order for positive prices
    by_time = sorted(one_cust, key=lambda r: r.run_sum)
    assert [r.run_sum for r in by_time] == sorted(r.run_sum for r in one_cust)


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=2/16 cells must recover a usable fraction of true
    top-5 neighbors (near-orthogonal synthetic vectors are the worst case
    for coarse quantization; the contract is 'beats random', tracked so a
    regression in cell assignment is caught)."""
    truth = {
        (r.vec_id, r.neighbor_id)
        for r in QUERIES["similarity_cosine_topk"](spark, sf_dir).collect()
    }
    approx = {
        (r.vec_id, r.neighbor_id)
        for r in QUERIES["similarity_ann_ivf"](spark, sf_dir).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.15, f"IVF recall {recall:.3f} below floor"


def test_pipeline_clean_corpus_subsumes_filters(spark, sf_dir):
    kept = QUERIES["pipeline_clean_corpus"](spark, sf_dir)
    rows = kept.collect()
    assert all(r.n_tokens >= 10 for r in rows)
    dups_absorbed = sum(r.n_copies - 1 for r in rows)
    assert dups_absorbed >= 0
    # canonical keeper is the minimum doc_id -> ids unique
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))
