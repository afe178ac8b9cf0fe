"""Temporal join operators: as-of join and time-range join over events.

Spark has no native AS OF join (Delta/Pandas have cousins); the engine
expresses it as the classic union-merge: tag both sides, sort each user's
timeline once, and carry the latest left-side row forward with
``last(ignorenulls)`` — ONE shuffle on the entity key, no row explosion,
the shape that survives 100 TB (an equi-join on user_id plus a sorted
window per user; skewed users are bounded by their own event counts).
The DuckDB oracle uses its native ``ASOF LEFT JOIN``, so the two engines
reach the same semantics through independent implementations.

The range join keeps the equi key (user_id) in the join condition so
Catalyst plans a hash join with a residual time-band filter — never a
cartesian.

Precision contract: events.ts is TIMESTAMP(MICROS) parquet (TIMESTAMP_NTZ
in Spark, naive TIMESTAMP in DuckDB), so every predicate and difference
here is computed on exact integer epoch microseconds in BOTH engines —
``functions/time.ts_us()`` on the Spark side, ``epoch_us(ts)`` in the
oracle — keeping boundary pairs and gaps timezone- and float-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.time import ts_us
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import load_table

RANGE_JOIN_WINDOW_US = 3_600_000_000  # 1 hour in microseconds


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        ts_us().alias("ts_us"),
    )


@query(
    "events_asof_join",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
      FROM events
    ),
    clicks AS (
      SELECT user_id, ts_us, max(event_id) AS click_id
      FROM e WHERE event_type = 'click' GROUP BY 1, 2
    ),
    p AS (
      SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           p.ts_us AS purchase_ts_us,
           c.click_id AS last_click_id,
           p.ts_us - c.ts_us AS click_gap_us
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts_us <= p.ts_us
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent click at
    or before it (LEFT: purchases with no prior click keep nulls).

    Clicks are first deduped to one per (user, ts_us) — max event_id — so
    the match is total-order deterministic even with tied timestamps. The
    merge ordering key (ts_us, side, id) puts a click before a same-instant
    purchase, matching ASOF's ``<=``.
    """
    e = _events_us(spark, sf_dir)
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            "ts_us",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            "click_id",
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_us",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("click_id"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side", F.coalesce("event_id", "click_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("side") == 0, F.col("ts_us"))
    return (
        merged.select(
            "user_id",
            "ts_us",
            "side",
            "event_id",
            F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
            F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
        )
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            "last_click_id",
            (F.col("ts_us") - F.col("last_click_ts")).alias("click_gap_us"),
        )
    )


@query(
    "events_range_join",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
      FROM events
    ),
    s AS (
      SELECT event_id AS signup_id, user_id, ts_us
      FROM e WHERE event_type = 'signup'
    ),
    p AS (
      SELECT event_id AS purchase_id, user_id, ts_us
      FROM e WHERE event_type = 'purchase'
    )
    SELECT s.signup_id, p.purchase_id, s.user_id,
           p.ts_us - s.ts_us AS delay_us
    FROM s JOIN p
      ON s.user_id = p.user_id
     AND p.ts_us > s.ts_us
     AND p.ts_us - s.ts_us <= {RANGE_JOIN_WINDOW_US}
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range join: purchases within 1 hour AFTER a signup by the same
    user. The equi key (user_id) rides the join condition so the plan is a
    shuffled hash join with the time band as residual filter — bounded
    output, no cartesian; AQE splits skewed users."""
    e = _events_us(spark, sf_dir)
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts_us").alias("s_us"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts_us").alias("p_us"),
    )
    return (
        s.join(
            p,
            (s.user_id == p.p_user)
            & (F.col("p_us") > F.col("s_us"))
            & (F.col("p_us") - F.col("s_us") <= RANGE_JOIN_WINDOW_US),
        )
        .select(
            "signup_id",
            "purchase_id",
            "user_id",
            (F.col("p_us") - F.col("s_us")).alias("delay_us"),
        )
    )
