"""Event-stream relational operators: per-user windows, sessionization,
tumbling-window aggregation, JSON extraction.

The reference has no window functions (SURVEY.md §2.5 W1 "none") — this
module supplies the window/sort surface the engine needs as first-class,
oracle-checked operators over the synthetic ``events`` table. The streaming
module (streaming/events.py) re-expresses the tumbling aggregate with
Structured Streaming + watermarks and is held to the same oracle.

The ``ts`` column is TIMESTAMP(MICROS) parquet (TIMESTAMP_NTZ in Spark);
all derived times run on ``functions/time.ts_us()`` — exact integer epoch
microseconds on both engines — so no float/timezone drift can enter the
cross-engine hash. The DuckDB side converts with epoch_us().

Scale notes: every operator here shuffles exactly once on user_id (window
partition key) or the (hour, event_type) group key; running sums are
computed inside the sorted window partition — the standard watermarked-
aggregation shape that Structured Streaming distributes per key at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.text import (
    round_half_up,
    sql_round_half_up,
)
from pyspark_text_classification_spark.functions.time import (
    SQL_TS_US,
    TS_US_EXPR,
    ts_us,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import load_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@query(
    "events_user_window",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(row_number() OVER w AS INT)             AS seq,
           epoch_us(ts)
             - lag(epoch_us(ts)) OVER w         AS gap_us,
           {sql_round_half_up('sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)', 4)} AS run_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_user_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered window: sequence number, inter-event gap (µs),
    running value sum. One shuffle on user_id; the running sum is a
    sequential in-order fold on both engines, so doubles match bit-exactly
    before rounding."""
    ev = load_table(spark, sf_dir, "events")
    us = ts_us()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).alias("seq"),
        (us - F.lag(us).over(w)).alias("gap_us"),
        round_half_up(F.sum("value").over(run), 4).alias("run_value"),
    )


@query(
    "events_sessionize",
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
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity boundary): mark session
    starts with lag(), then a running sum assigns 1-based session ids —
    pure integer window arithmetic, deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    us = ts_us()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    new_session = (
        F.when(gap > SESSION_GAP_US, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(new_session).over(run).cast("long").alias("session_id"),
    )


@query(
    "events_tumbling_hourly",
    oracle=f"""
    SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_epoch_s,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {sql_round_half_up('sum(value)', 4)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate per event type. Hour boundary from
    exact integer division of epoch micros; the float sum is commutative-
    order-dependent but round_half_up(4) absorbs the ulps."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.expr(f"({TS_US_EXPR}) div 3600000000") * 3600).alias("hour_epoch_s")
    return (
        ev.groupBy(hour, "event_type")
        .agg(
            F.count("*").alias("cnt"),
            round_half_up(F.sum("value"), 4).alias("sum_value"),
        )
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 JSON surface: pull a typed field out of the props JSON column
    (get_json_object — JVM-side, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k_val"),
    )


TRAILING_WINDOW_US = 3_600_000_000  # 1 hour in microseconds


@query(
    "events_trailing_1h",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
      FROM events
    )
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_trailing,
           {sql_round_half_up('sum(value) OVER w', 4)} AS sum_trailing
    FROM e
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts_us
      RANGE BETWEEN {TRAILING_WINDOW_US} PRECEDING AND CURRENT ROW
    )
    """,
)
def events_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per event, count and value-sum of the SAME
    user's events in the trailing hour (the time-decayed-feature shape).
    RANGE frames bound by the ORDER BY value, not row position — tied
    timestamps share a frame, so the result needs no row tiebreak and is
    deterministic on both engines. One shuffle on user_id.

    µs-truncated ordering key per the precision contract
    (operators/temporal.py): DuckDB only sees microseconds."""
    ev = load_table(spark, sf_dir, "events")
    us = ts_us()
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-TRAILING_WINDOW_US, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_trailing"),
        round_half_up(F.sum("value").over(w), 4).alias("sum_trailing"),
    )


@query(
    "events_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    s AS (
      SELECT user_id, min(ts_us) AS t_signup
      FROM e WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts_us) AS t_click
      FROM e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts_us > s.t_signup
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts_us) AS t_purchase
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts_us > c.t_click
      GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM s
    UNION ALL SELECT 'signup>click', count(*) FROM c
    UNION ALL SELECT 'signup>click>purchase', count(*) FROM p
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users whose first signup precedes a
    click precedes a purchase, counted per stage. Three cascaded
    min-aggregates, each joined to the previous stage's anchor time — the
    standard product-analytics query, strictly ordered (a purchase before
    the first post-signup click does NOT count). Every stage shuffles on
    user_id only; stage frames shrink monotonically."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_type", ts_us().alias("ts_us")
    )
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_signup"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts_us") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_purchase"))
    )

    def stage(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage("signup", s)
        .unionByName(stage("signup>click", c))
        .unionByName(stage("signup>click>purchase", p))
    )


WEEK_US = 7 * 86_400 * 1_000_000  # one week in microseconds


@query(
    "events_cohort_retention",
    oracle=f"""
    WITH e AS (
      SELECT user_id, (epoch_us(ts)) // {WEEK_US} AS week
      FROM events
    ),
    first AS (
      SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, week FROM e)
    SELECT f.cohort_week,
           a.week - f.cohort_week AS weeks_since,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity a JOIN first f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity week, counted in
    each subsequent week they return — the standard retention triangle.
    One aggregate for cohorts, one distinct for activity, one equi-join on
    user_id (broadcast-eligible: cohorts are one row per user), final
    group on the two small keys. Integer week arithmetic on µs timestamps,
    deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", F.expr(f"(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)) div {WEEK_US}").alias("week")
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    activity = e.distinct()
    return (
        activity.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.count("*").alias("n_users"))
    )


RETENTION_WEEKS = (0, 1, 2, 3)


@query(
    "events_retention_pivot",
    oracle=f"""
    WITH e AS (
      SELECT user_id, (epoch_us(ts)) // {WEEK_US} AS week
      FROM events
    ),
    first AS (
      SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, week FROM e),
    r AS (
      SELECT f.cohort_week, a.week - f.cohort_week AS ws
      FROM activity a JOIN first f ON a.user_id = f.user_id
    )
    SELECT cohort_week,
           {', '.join(
               f'CAST(count(*) FILTER (ws = {w}) AS BIGINT) AS week_{w}'
               for w in RETENTION_WEEKS
           )}
    FROM r GROUP BY cohort_week
    """,
)
def events_retention_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention triangle PIVOTED to one row per cohort with fixed
    week columns — exercises groupBy().pivot() (Spark's relational
    transpose; the explicit value list keeps the schema static, which a
    100 TB plan requires anyway: dynamic pivot needs an extra distinct
    scan). Oracle is conditional aggregation with matching column names."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "user_id", F.expr(f"(timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)) div {WEEK_US}").alias("week")
    )
    first = e.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    r = (
        e.distinct()
        .join(first, "user_id")
        .select(
            "cohort_week", (F.col("week") - F.col("cohort_week")).alias("ws")
        )
    )
    pivoted = (
        r.groupBy("cohort_week")
        .pivot("ws", list(RETENTION_WEEKS))
        .agg(F.count(F.lit(1)))  # count("*") is invalid inside Pivot
    )
    return pivoted.select(
        "cohort_week",
        *[
            F.coalesce(F.col(str(w)), F.lit(0)).cast("long").alias(f"week_{w}")
            for w in RETENTION_WEEKS
        ],
    )


@query(
    "events_sliding_1h_15m",
    oracle=f"""
    SELECT ((epoch_us(ts)) // 900000000 - k) * 900 AS win_start_s,
           event_type,
           CAST(count(*) AS BIGINT) AS cnt,
           {sql_round_half_up('sum(value)', 4)} AS sum_value
    FROM events CROSS JOIN (SELECT unnest(range(0, 4)) AS k)
    GROUP BY 1, 2
    """,
)
def events_sliding_1h_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregate: 1-hour windows advancing every 15
    minutes (every event lands in exactly 4 overlapping windows).
    Spark's native window() plans this as a 4-row Expand + ONE hash
    aggregate — not 4 scans; the oracle derives the same 4 window starts
    per event with integer µs arithmetic (both sides truncate the NANOS
    timestamps to µs first, per the cross-engine timestamp contract)."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window(
        F.timestamp_micros(ts_us()), "1 hour", "15 minutes"
    )
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            round_half_up(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_start_s"),
            "event_type",
            "cnt",
            "sum_value",
        )
    )


ZSCORE_OUTLIER = 3.0


@query(
    "events_value_zscore",
    oracle=f"""
    WITH s AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             sum(value) AS sv, sum(value * value) AS svv
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id,
           {sql_round_half_up(
               'CASE WHEN s.n >= 2 AND (s.svv - s.sv * s.sv / s.n) > 0 THEN '
               '(e.value - s.sv / s.n) / '
               'sqrt((s.svv - s.sv * s.sv / s.n) / (s.n - 1)) '
               'ELSE 0.0 END', 4)} AS zscore
    FROM events e JOIN s USING (user_id)
    """,
)
def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value anomaly score: each event's z-score against its own
    user's mean/stddev — the metrics-outlier shape (fraud, telemetry
    spikes) over a grouped population.

    Two passes, one data shuffle avoided: the per-user moment aggregate
    (count/sum/sum-of-squares — all algebraic, map-side combinable)
    produces a USER-bounded table that broadcasts back onto the events
    scan, so the big side joins without moving. Moments are used instead
    of stddev_samp() so both engines evaluate the identical closed-form
    expression (Welford-merge implementations differ in ulps); users with
    <2 events or zero variance score 0."""
    ev = load_table(spark, sf_dir, "events")
    return zscore_against_moments(ev, user_moments(ev))


def user_moments(ev: DataFrame) -> DataFrame:
    """(user_id, n, sv, svv): per-user value moments — algebraic, so the
    aggregate completes map-side and the result is user-bounded."""
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("sv"),
        F.sum(F.col("value") * F.col("value")).alias("svv"),
    )


def zscore_against_moments(ev: DataFrame, moments: DataFrame) -> DataFrame:
    """Score each event against a (broadcast) moments table — shared by the
    batch query and the streaming twin (stream rows vs static moments)."""
    var_num = F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")
    z = F.when(
        (F.col("n") >= 2) & (var_num > 0),
        (F.col("value") - F.col("sv") / F.col("n"))
        / F.sqrt(var_num / (F.col("n") - 1)),
    ).otherwise(F.lit(0.0))
    return ev.join(F.broadcast(moments), "user_id").select(
        "event_id",
        "user_id",
        round_half_up(z, 4).alias("zscore"),
    )


@query(
    "events_retention_unpivot",
    oracle=f"""
    WITH e AS (
      SELECT user_id, (epoch_us(ts)) // {WEEK_US} AS week
      FROM events
    ),
    first AS (
      SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, week FROM e),
    r AS (
      SELECT f.cohort_week, a.week - f.cohort_week AS ws
      FROM activity a JOIN first f ON a.user_id = f.user_id
    ),
    wide AS (
      SELECT cohort_week,
             {', '.join(
                 f'CAST(count(*) FILTER (ws = {w}) AS BIGINT) AS week_{w}'
                 for w in RETENTION_WEEKS
             )}
      FROM r GROUP BY cohort_week
    )
    SELECT cohort_week, week_offset, n_active
    FROM wide
    UNPIVOT (n_active FOR week_offset IN (
      {', '.join(f"week_{w} AS '{w}'" for w in RETENTION_WEEKS)}
    ))
    """,
)
def events_retention_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the wide retention triangle back to tidy long form
    — the missing half of the pivot surface (wide sources arrive from
    spreadsheets/reports; analytics wants long). Spark's native
    ``unpivot`` plans as an Expand (no shuffle, no UDF) over the already
    cohort-sized table. Zero-count cells survive the round trip (they are
    rows with n_active = 0, not dropped rows)."""
    wide = events_retention_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["cohort_week"],
        values=[f"week_{w}" for w in RETENTION_WEEKS],
        variableColumnName="week_offset",
        valueColumnName="n_active",
    ).withColumn(
        "week_offset", F.replace("week_offset", F.lit("week_"), F.lit(""))
    )


_HOUR_US = 3_600_000_000


@query(
    "events_activity_gaps",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_HOUR_US} AS hr FROM events
    ),
    d AS (
      SELECT user_id, hr,
             hr - lag(hr) OVER (PARTITION BY user_id ORDER BY hr) - 1 AS gap
      FROM h
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_active_hours,
           CAST(max(hr) - min(hr) + 1 AS BIGINT) AS span_hours,
           CAST(max(hr) - min(hr) + 1 - count(*) AS BIGINT) AS n_gap_hours,
           CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_hours
    FROM d GROUP BY user_id
    """,
)
def events_activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-gap profile over hourly buckets: active hours,
    total span, missing (gap) hours, and the longest silent stretch — the
    time-series completeness check run before any gap-filling or
    interpolation step.

    Deliberately computed WITHOUT materializing the dense (user, hour)
    grid: gaps fall out of ``lag`` over each user's sorted distinct hours,
    so the plan is distinct -> one window shuffle on user_id -> one
    aggregate, and data volume is bounded by ACTIVE hours (a sequence-
    explode gap-fill would materialize span-bounded rows — strictly more —
    before throwing most of them away). Hour buckets are exact integer
    epoch-microsecond division on both engines."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "user_id", F.expr(f"({TS_US_EXPR}) div {_HOUR_US}").alias("hr")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("hr")
    d = h.withColumn("gap", F.col("hr") - F.lag("hr").over(w) - 1)
    span = F.max("hr") - F.min("hr") + 1
    return d.groupBy("user_id").agg(
        F.count("*").alias("n_active_hours"),
        span.alias("span_hours"),
        (span - F.count("*")).alias("n_gap_hours"),
        F.coalesce(F.max("gap"), F.lit(0)).alias("max_gap_hours"),
    )


@query(
    "events_ohlc_hourly",
    oracle=f"""
    SELECT (epoch_us(ts) // {_HOUR_US}) * 3600 AS hour_epoch_s,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           min({{'t': epoch_us(ts), 'i': event_id, 'v': value}}).v AS open,
           max({{'t': epoch_us(ts), 'i': event_id, 'v': value}}).v AS close,
           max(value) AS high,
           min(value) AS low
    FROM events
    GROUP BY 1, 2
    """,
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC downsampling — the hypertable/time-series rollup: per hour and
    event type, the first (open) and last (close) value plus the high/low
    extremes.  One hash aggregate with map-side partials; open/close come
    from min/max over a (ts, event_id, value) struct — lexicographic
    struct ordering gives "value at the earliest/latest (ts, id)" WITHOUT
    a sort or a window, so the rollup keeps the same single-shuffle shape
    as a plain count at any scale.  event_id in the struct breaks
    equal-timestamp ties deterministically; no arithmetic touches the
    values, so both engines emit bit-identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    hour = (F.expr(f"({TS_US_EXPR}) div {_HOUR_US}") * 3600).alias("hour_epoch_s")
    key = F.struct(
        ts_us().alias("t"), F.col("event_id").alias("i"), F.col("value").alias("v")
    )
    return ev.groupBy(hour, "event_type").agg(
        F.count("*").alias("n_events"),
        F.min(key)["v"].alias("open"),
        F.max(key)["v"].alias("close"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
    )


@query(
    "events_transition_matrix",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT from_type, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, c.n,
           {sql_round_half_up(
               'CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE)', 4)} AS p
    FROM c JOIN t USING (from_type)
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral transition matrix: for consecutive events of
    the same user (ordered by time, event_id tie-break), count each
    (from_type -> to_type) step and normalize rows to transition
    probabilities — the Markov-chain summary behind next-action models
    and funnel-drop analysis.

    Scale shape: one window shuffle on user_id produces the successor
    pairs; the count is a (types x types)-bounded aggregate with map-side
    partials; row normalization joins the type-bounded totals back via
    BROADCAST. Nothing beyond the single user_id exchange ever carries
    event-sized data."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(ts_us(), "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = (
        o.groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        ).agg(F.count("*").alias("n"))
    )
    t = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(t), "from_type").select(
        "from_type",
        "to_type",
        "n",
        round_half_up(
            F.col("n").cast("double") / F.col("tot").cast("double"), 4
        ).alias("p"),
    )


@query(
    "events_gap_fill",
    oracle=f"""
    WITH b AS (
      SELECT user_id, epoch_us(ts) // {_HOUR_US} AS h,
             max({{'t': epoch_us(ts), 'i': event_id, 'v': value}}).v AS v_obs
      FROM events GROUP BY 1, 2
    ),
    span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM b GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM span
    ),
    j AS (
      SELECT g.user_id, g.h, b.v_obs
      FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h
    )
    SELECT user_id, h * 3600 AS hour_epoch_s,
           CAST(CASE WHEN v_obs IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
           last_value(v_obs IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_fill
    FROM j
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (the hypertable ``time_bucket_gapfill`` +
    ``locf`` rollup): resample each user to an hourly grid spanning their
    own first..last hour, mark the empty hours, and forward-fill the last
    observed value into them.

    Plan shape: one hash aggregate collapses events to (user, hour) with
    the latest value chosen by lexicographic max over a (ts, id, value)
    struct (no window, no sort); per-user spans are a second tiny
    aggregate whose ``sequence()`` explode materializes the grid — output
    rows are Σ span-hours, generated distributed, never on the driver; the
    grid left-joins the observations back on (user, hour) and a single
    user-partitioned window does ``last(ignorenulls)`` carry-forward.  At
    100 TB everything shuffles on user_id exactly twice (agg, window) and
    the grid explode is linear in output size."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.expr(f"({TS_US_EXPR}) div {_HOUR_US}")
    key = F.struct(
        ts_us().alias("t"), F.col("event_id").alias("i"), F.col("value").alias("v")
    )
    # by_hour feeds BOTH the span grid and the left join; eager
    # localCheckpoint (not persist) so the events scan + hourly aggregate
    # run once AND no catalog-cache entry outlives this query in a long
    # multi-query driver session (blocks free on GC)
    by_hour = (
        ev.groupBy(F.col("user_id"), hour.alias("h"))
        .agg(F.max(key)["v"].alias("v_obs"))
        .localCheckpoint(eager=True)
    )
    grid = (
        by_hour.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id", F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h")
        )
    )
    j = grid.join(by_hour, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        (F.col("h") * 3600).alias("hour_epoch_s"),
        F.when(F.col("v_obs").isNull(), 1).otherwise(0).cast("long").alias("is_gap"),
        F.last("v_obs", ignorenulls=True).over(w).alias("v_fill"),
    )


_DAY_US = 24 * _HOUR_US
_WAU_WINDOW_DAYS = 7


@query(
    "events_rolling_active_users",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    dau AS (
      SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY 1
    ),
    wau AS (
      SELECT days.d, CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau_7d
      FROM days JOIN du
        ON du.d BETWEEN days.d - {_WAU_WINDOW_DAYS - 1} AND days.d
      GROUP BY 1
    )
    SELECT dau.d * 86400 AS day_epoch_s, dau.dau, wau.wau_7d
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day active users per day — the engagement rollup
    every product pipeline runs.  Rolling COUNT(DISTINCT) is not a window
    function in either engine, so the rolling set union is expressed at
    the day grain: events collapse to distinct (user, day) pairs ONCE
    (the only event-sized shuffle), then a 7-day band join against the
    tiny distinct-day list re-counts distinct users per target day.

    Scale shape: the band join's build side is the day list (span-bounded,
    ~centuries fit in memory) and Spark broadcasts it, so the expensive
    side streams map-side; the distinct-pair aggregate has map-side
    partials.  Work is |distinct pairs| x 7 — linear in data, independent
    of raw event count beyond the first distinct."""
    ev = load_table(spark, sf_dir, "events")
    # du feeds days, dau AND the band join; eager localCheckpoint (not
    # persist) so the event-sized distinct runs once and no cache entry
    # outlives the query ((user, day)-bounded rows)
    du = (
        ev.select("user_id", F.expr(f"({TS_US_EXPR}) div {_DAY_US}").alias("d"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(F.count("*").alias("dau"))
    wau = (
        F.broadcast(days.withColumnRenamed("d", "target_d"))
        .join(
            du,
            (F.col("d") >= F.col("target_d") - (_WAU_WINDOW_DAYS - 1))
            & (F.col("d") <= F.col("target_d")),
        )
        .groupBy("target_d")
        .agg(F.countDistinct("user_id").alias("wau_7d"))
    )
    return (
        dau.join(wau, dau.d == wau.target_d)
        .select((F.col("d") * 86400).alias("day_epoch_s"), "dau", "wau_7d")
    )


_V_SCALE = 1_000_000  # micro-unit quantization; median of ints is dyadic-exact
MAD_K = 3  # flag |v - median| > K * MAD


@query(
    "events_mad_anomaly",
    oracle=f"""
    WITH v AS (
      SELECT event_id, user_id, value,
             CAST(floor(value * {_V_SCALE}.0 + 0.5) AS BIGINT) AS v_us
      FROM events
    ),
    med AS (
      SELECT user_id, quantile_cont(v_us, 0.5) AS med_u FROM v GROUP BY 1
    ),
    dev AS (
      SELECT v.*, med.med_u, abs(v.v_us - med.med_u) AS dev_u
      FROM v JOIN med USING (user_id)
    ),
    mad AS (
      SELECT user_id, quantile_cont(dev_u, 0.5) AS mad_u FROM dev GROUP BY 1
    )
    SELECT d.event_id, d.user_id, d.value,
           {sql_round_half_up(f'd.dev_u / ({MAD_K}.0 * m.mad_u)', 4)} AS score
    FROM dev d JOIN mad m USING (user_id)
    WHERE m.mad_u > 0 AND d.dev_u > {MAD_K} * m.mad_u
    """,
)
def events_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user outlier detection: flag events whose value deviates
    from the user's MEDIAN by more than K times the median absolute
    deviation — the outlier rule that, unlike the z-score twin
    (events_value_zscore), a burst of outliers cannot drag with it.

    Medians interpolate between order statistics, and the two engines'
    interpolation formulas differ in the last ulp on arbitrary doubles —
    so values are quantized to integer micro-units FIRST: every median is
    then a dyadic rational both engines compute bit-identically, and the
    K*MAD comparison is exact.  Plan: two user-keyed exact-percentile
    aggregates with the deviations joined back per user (AQE broadcasts
    the per-user summaries); everything event-sized shuffles on user_id
    only."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_id",
        "user_id",
        "value",
        F.floor(F.col("value") * _V_SCALE + F.lit(0.5)).cast("long").alias("v_us"),
    )
    med = v.groupBy("user_id").agg(
        F.percentile("v_us", F.lit(0.5)).alias("med_u")
    )
    # dev feeds the MAD aggregate AND the output join; eager
    # localCheckpoint (not persist) so the median join pipeline runs once
    # and this event-cardinality working set is never left in the catalog
    # cache after the query returns
    dev = (
        v.join(med, "user_id")
        .withColumn("dev_u", F.abs(F.col("v_us") - F.col("med_u")))
        .localCheckpoint(eager=True)
    )
    mad = dev.groupBy("user_id").agg(
        F.percentile("dev_u", F.lit(0.5)).alias("mad_u")
    )
    return (
        dev.join(mad, "user_id")
        .filter((F.col("mad_u") > 0) & (F.col("dev_u") > MAD_K * F.col("mad_u")))
        .select(
            "event_id",
            "user_id",
            "value",
            round_half_up(
                F.col("dev_u") / (F.lit(float(MAD_K)) * F.col("mad_u")), 4
            ).alias("score"),
        )
    )


N_DECILES = 10


@query(
    "events_value_deciles",
    oracle=f"""
    WITH d AS (
      SELECT event_type, value,
             ntile({N_DECILES}) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS decile
      FROM events
    )
    SELECT event_type, CAST(decile AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n,
           min(value) AS lo, max(value) AS hi
    FROM d GROUP BY 1, 2
    """,
)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count decile summary of event values per event type via
    ntile — the distribution profile behind threshold picking and drift
    dashboards (and the ntile/percent_rank corner of the window surface).

    ntile's bucket rule (remainder rows go to the leading buckets) is
    identical SQL semantics on both engines; the ordering is made total
    with the event_id tie-break so bucket edges cannot drift.  One window
    shuffle on event_type, then a bounded (types x 10) aggregate; the
    values pass through untouched, so min/max are bit-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type", "value", F.ntile(N_DECILES).over(w).alias("decile")
        )
        .groupBy("event_type", F.col("decile").cast("long").alias("decile"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


_WEEK_HOURS = 168  # seasonal-naive lag: same hour one week earlier


@query(
    "events_seasonal_baseline",
    oracle=f"""
    WITH hourly AS (
      SELECT epoch_us(ts) // {_HOUR_US} AS h, event_type,
             CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS v_us
      FROM events GROUP BY 1, 2
    )
    SELECT cur.event_type,
           CAST(count(*) AS BIGINT) AS n_hours,
           {sql_round_half_up(
               'avg(abs(cur.v_us - lag.v_us)) / 1000000.0', 4)} AS mae
    FROM hourly cur
    JOIN hourly lag
      ON cur.event_type = lag.event_type
     AND cur.h = lag.h + {_WEEK_HOURS}
    GROUP BY 1
    """,
)
def events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: predict each hour's total value
    as the SAME hour one week earlier and report the mean absolute error
    per event type — the baseline every real forecaster must beat, and
    the error metric anomaly thresholds calibrate against.

    Per-event values quantize to integer micro-units BEFORE the hourly
    sum (bit-stable under any partitioning); the lag is an equi-join of
    the hour-grain rollup with itself shifted by 168 hours — the rollup
    is span x types rows, so the self-join is tiny no matter how many raw
    events fed it.  One event-sized shuffle (the rollup), everything
    after is bounded."""
    ev = load_table(spark, sf_dir, "events")
    v_us = F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("long")
    # the rollup self-joins (cur vs lag); eager localCheckpoint (not
    # persist) so the event-sized aggregate runs once and no cache entry
    # outlives the query (span x types rows)
    hourly = (
        ev.groupBy(
            F.expr(f"({TS_US_EXPR}) div {_HOUR_US}").alias("h"),
            "event_type",
        )
        .agg(F.sum(v_us).alias("v_us"))
        .localCheckpoint(eager=True)
    )
    cur, lag = hourly.alias("cur"), hourly.alias("lag")
    return (
        cur.join(
            lag,
            (F.col("cur.event_type") == F.col("lag.event_type"))
            & (F.col("cur.h") == F.col("lag.h") + _WEEK_HOURS),
        )
        .groupBy(F.col("cur.event_type").alias("event_type"))
        .agg(
            F.count("*").alias("n_hours"),
            round_half_up(
                F.avg(F.abs(F.col("cur.v_us") - F.col("lag.v_us")))
                / 1_000_000.0,
                4,
            ).alias("mae"),
        )
    )


@query(
    "events_type_affinity",
    oracle=f"""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_users FROM ut GROUP BY 1
    ),
    inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a, i.type_b, i.n_both,
           {sql_round_half_up(
               'CAST(i.n_both AS DOUBLE)'
               ' / (na.n_users + nb.n_users - i.n_both)', 4)} AS jaccard
    FROM inter i
    JOIN n na ON na.event_type = i.type_a
    JOIN n nb ON nb.event_type = i.type_b
    """,
)
def events_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral affinity between event types: Jaccard overlap of the
    user sets that perform each pair of types — the co-usage signal
    behind feature bundling and next-action candidates.

    Scale shape: events collapse to distinct (user, type) ONCE; the
    user-keyed self-join fans out at most (types-per-user choose 2) rows
    per user — bounded by the type vocabulary, NOT by event volume — and
    the per-type user counts broadcast onto the types x types result."""
    ev = load_table(spark, sf_dir, "events")
    # ut feeds the per-type counts AND both self-join sides; eager
    # localCheckpoint (not persist) so the event-sized distinct runs once
    # and no cache entry outlives the query ((user, type)-bounded rows)
    ut = (
        ev.select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = ut.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a, b = ut.alias("a"), ut.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    na = F.broadcast(n.select(F.col("event_type").alias("type_a"),
                              F.col("n_users").alias("na_users")))
    nb = F.broadcast(n.select(F.col("event_type").alias("type_b"),
                              F.col("n_users").alias("nb_users")))
    return (
        inter.join(na, "type_a")
        .join(nb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            round_half_up(
                F.col("n_both").cast("double")
                / (F.col("na_users") + F.col("nb_users") - F.col("n_both")),
                4,
            ).alias("jaccard"),
        )
    )


CONVERT_FROM = "view"
CONVERT_TO = "purchase"


@query(
    "events_time_to_convert",
    oracle=f"""
    WITH a AS (
      SELECT user_id, min(epoch_us(ts)) AS t_a FROM events
      WHERE event_type = '{CONVERT_FROM}' GROUP BY 1
    ),
    b AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t_b
      FROM events e JOIN a ON e.user_id = a.user_id
      WHERE e.event_type = '{CONVERT_TO}' AND epoch_us(e.ts) > a.t_a
      GROUP BY 1
    ),
    lat AS (
      SELECT a.user_id, (b.t_b - a.t_a) // 1000000 AS latency_s
      FROM a JOIN b ON a.user_id = b.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(min(latency_s) AS BIGINT) AS min_s,
           {sql_round_half_up('quantile_cont(latency_s, 0.5)', 4)} AS p50_s,
           {sql_round_half_up('quantile_cont(latency_s, 0.9)', 4)} AS p90_s,
           CAST(max(latency_s) AS BIGINT) AS max_s
    FROM lat
    """,
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for every user, the time from
    their FIRST '{from}' to the first '{to}' that follows it, summarized
    as exact percentiles — the funnel-velocity metric behind "how long
    does signup->purchase take".

    Plan shape: two filtered min-aggregates on user_id (map-side
    partials), a user-keyed join with the strictly-after predicate pushed
    into it, then a bounded percentile pass over per-user latencies —
    integer seconds, so the interpolated percentiles stay engine-exact
    after rounding.  Every event-sized structure shuffles once, on
    user_id."""
    ev = load_table(spark, sf_dir, "events")
    t = ts_us()
    # `a` feeds the qualifying-purchase filter AND the latency join;
    # eager localCheckpoint (not persist) so the filtered min-aggregate
    # runs once and no cache entry outlives the query (per-user rows)
    a = (
        ev.filter(F.col("event_type") == CONVERT_FROM)
        .groupBy("user_id")
        .agg(F.min(t).alias("t_a"))
        .localCheckpoint(eager=True)
    )
    b = (
        ev.filter(F.col("event_type") == CONVERT_TO)
        .select("user_id", t.alias("t_e"))
        .join(a, "user_id")
        .filter(F.col("t_e") > F.col("t_a"))
        .groupBy("user_id")
        .agg(F.min("t_e").alias("t_b"))
    )
    lat = a.join(b, "user_id").select(
        F.expr("(t_b - t_a) div 1000000").alias("latency_s")
    )
    return lat.agg(
        F.count("*").alias("n_converted"),
        F.min("latency_s").alias("min_s"),
        round_half_up(F.percentile("latency_s", F.lit(0.5)), 4).alias("p50_s"),
        round_half_up(F.percentile("latency_s", F.lit(0.9)), 4).alias("p90_s"),
        F.max("latency_s").alias("max_s"),
    )


@query(
    "events_scd2_intervals",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type AS state, {SQL_TS_US} AS ts_us, event_id
      FROM events
    ),
    runs AS (
      SELECT user_id, state, ts_us, event_id,
             lag(state) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev_state
      FROM ev
    ),
    changes AS (
      SELECT user_id, state, ts_us AS valid_from_us
      FROM runs
      WHERE prev_state IS NULL OR prev_state <> state
    )
    SELECT user_id, state, valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us, state)
             AS valid_to_us,
           CAST(lead(valid_from_us) OVER (PARTITION BY user_id
                ORDER BY valid_from_us, state) IS NULL AS INT) AS is_current
    FROM changes
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from an event log: collapse
    each user's event stream into state-validity intervals
    [valid_from, valid_to) with an is_current flag on the open interval —
    the standard dimension-table construction for "what was this user's
    state at time T" joins (which then run as as-of joins against these
    intervals, events_asof_join's shape).

    Two windows, both partitioned BY USER — at 100 TB the sort is
    per-user-partition (no global ordering anywhere) and AQE splits any
    hot user.  Run-collapse before the lead() means the second window
    sees only state CHANGES, typically orders of magnitude fewer rows
    than events.  Ties on ts are broken by event_id so the run detection
    is deterministic cross-engine."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        ts_us().alias("ts_us"),
        "event_id",
    )
    w_run = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_state", F.lag("state").over(w_run))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
        .select("user_id", "state", F.col("ts_us").alias("valid_from_us"))
    )
    # state tiebreak: two state changes at one timestamp would otherwise
    # make lead()/valid_to pairing engine-arbitrary (unique (user_id, ts)
    # in the generator today, but determinism shouldn't rely on that).
    w_iv = Window.partitionBy("user_id").orderBy("valid_from_us", "state")
    return changes.select(
        "user_id",
        "state",
        "valid_from_us",
        F.lead("valid_from_us").over(w_iv).alias("valid_to_us"),
        F.lead("valid_from_us")
        .over(w_iv)
        .isNull()
        .cast("int")
        .alias("is_current"),
    )


# lateness histogram bucket edges (µs) — literals shared by both engines
LATENESS_EDGES_US = (0, 60_000_000, 600_000_000, 3_600_000_000)


@query(
    "events_watermark_audit",
    oracle=f"""
    WITH arr AS (
      SELECT user_id, event_id, {SQL_TS_US} AS ts_us,
             max({SQL_TS_US}) OVER (PARTITION BY user_id
                                    ORDER BY event_id) AS high_water
      FROM events
    ),
    late AS (SELECT user_id, high_water - ts_us AS lateness_us FROM arr)
    SELECT CASE
             WHEN lateness_us <= {LATENESS_EDGES_US[0]} THEN 'in_order'
             WHEN lateness_us <= {LATENESS_EDGES_US[1]} THEN 'lt_1m'
             WHEN lateness_us <= {LATENESS_EDGES_US[2]} THEN 'lt_10m'
             WHEN lateness_us <= {LATENESS_EDGES_US[3]} THEN 'lt_1h'
             ELSE 'ge_1h'
           END AS lateness_bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(lateness_us) AS BIGINT) AS max_lateness_us
    FROM late GROUP BY 1
    """,
)
def events_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness audit that SIZES a streaming watermark: per user
    (per-key arrival order = event_id), how far behind the running
    event-time high-water mark each event arrives, bucketed into the
    delays a ``withWatermark`` would have to tolerate.  The answer to
    "what watermark delay covers 99.9% of late data" BEFORE deploying
    the streaming twins — pick the smallest bucket edge whose cumulative
    count clears the SLO, and ge_1h rows are the candidates for a
    dead-letter path.

    One per-user-partitioned running max (no global ordering anywhere)
    feeding a |buckets|-bounded aggregate; at 100 TB both shuffle keys
    are user_id and the 5-row output is the report."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", ts_us().alias("ts_us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    late = ev.select(
        (F.max("ts_us").over(w) - F.col("ts_us")).alias("lateness_us")
    )
    e0, e1, e2, e3 = LATENESS_EDGES_US
    bucket = (
        F.when(F.col("lateness_us") <= e0, "in_order")
        .when(F.col("lateness_us") <= e1, "lt_1m")
        .when(F.col("lateness_us") <= e2, "lt_10m")
        .when(F.col("lateness_us") <= e3, "lt_1h")
        .otherwise("ge_1h")
    )
    return (
        late.select(bucket.alias("lateness_bucket"), "lateness_us")
        .groupBy("lateness_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.max("lateness_us").alias("max_lateness_us"),
        )
    )


@query(
    "events_pit_join",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type AS state, {SQL_TS_US} AS ts_us, event_id
      FROM events
    ),
    runs AS (
      SELECT user_id, state, ts_us,
             lag(state) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev_state
      FROM ev
    ),
    changes AS (
      SELECT user_id, state, ts_us AS valid_from_us
      FROM runs WHERE prev_state IS NULL OR prev_state <> state
    ),
    iv AS (
      SELECT user_id, state, valid_from_us,
             COALESCE(lead(valid_from_us) OVER (PARTITION BY user_id
                      ORDER BY valid_from_us, state), 9223372036854775807)
               AS valid_to_us
      FROM changes
    ),
    purchases AS (
      SELECT event_id, user_id, {SQL_TS_US} AS ts_us,
             CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_micro
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.value_micro,
           i.state AS state_at_purchase
    FROM purchases p
    JOIN iv i ON i.user_id = p.user_id
            AND p.ts_us >= i.valid_from_us AND p.ts_us < i.valid_to_us
    """,
)
def events_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME join: each purchase event enriched with the user's
    SCD2 state interval containing its timestamp — the feature-store
    correctness join that guarantees a training example only sees
    feature values that existed at label time (no leakage from the
    future).  Composes events_scd2_intervals' dimension build with an
    interval-containment join.

    The join is an EQUI join on user_id with a residual range predicate
    — Catalyst plans a hash/sort-merge join on the key and filters the
    (bounded: one user's intervals) matches, never an unbounded range
    scan.  Each event matches exactly one interval by construction
    (intervals partition the user's timeline from their first event,
    and every purchase lies inside it), so row count == purchase count
    — an auditable invariant.  At 100 TB both sides hash-partition by
    user; the open interval's NULL end is closed with +inf so the
    containment predicate stays two comparisons."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("state"),
        ts_us().alias("ts_us"),
        "event_id",
    )
    w_run = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    changes = (
        ev.withColumn("prev_state", F.lag("state").over(w_run))
        .filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
        .select("user_id", "state", F.col("ts_us").alias("valid_from_us"))
    )
    # state tiebreak mirrors events_scd2_intervals (same determinism trap)
    w_iv = Window.partitionBy("user_id").orderBy("valid_from_us", "state")
    iv = changes.select(
        "user_id",
        "state",
        "valid_from_us",
        F.coalesce(
            F.lead("valid_from_us").over(w_iv),
            F.lit(9223372036854775807),
        ).alias("valid_to_us"),
    )
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            ts_us().alias("ts_us"),
            F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5))
            .cast("long")
            .alias("value_micro"),
        )
    )
    return (
        purchases.alias("p")
        .join(
            iv.alias("i"),
            (F.col("p.user_id") == F.col("i.user_id"))
            & (F.col("p.ts_us") >= F.col("i.valid_from_us"))
            & (F.col("p.ts_us") < F.col("i.valid_to_us")),
        )
        .select(
            "event_id",
            F.col("p.user_id").alias("user_id"),
            "value_micro",
            F.col("i.state").alias("state_at_purchase"),
        )
    )


ATTR_LOOKBACK_US = 24 * 3_600_000_000  # 24h credit window
ATTR_CREDIT = 1_000_000  # one conversion = 1e6 micro-credits


@query(
    "events_attribution",
    oracle=f"""
    WITH conv AS (
      SELECT event_id AS conv_id, user_id, {SQL_TS_US} AS conv_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT event_id AS touch_id, user_id, event_type,
             {SQL_TS_US} AS touch_ts
      FROM events WHERE event_type IN ('view', 'click')
    ),
    tc AS (
      SELECT c.conv_id, t.touch_id, t.event_type, t.touch_ts,
             row_number() OVER (PARTITION BY c.conv_id
                                ORDER BY t.touch_ts, t.touch_id) AS rn_f,
             row_number() OVER (PARTITION BY c.conv_id
                                ORDER BY t.touch_ts DESC, t.touch_id DESC)
               AS rn_l,
             count(*) OVER (PARTITION BY c.conv_id) AS n_t
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.touch_ts < c.conv_ts
       AND c.conv_ts - t.touch_ts <= {ATTR_LOOKBACK_US}
    )
    SELECT event_type,
           CAST(sum(CASE WHEN rn_f = 1 THEN {ATTR_CREDIT} ELSE 0 END)
                AS BIGINT) AS first_touch_micro,
           CAST(sum(CASE WHEN rn_l = 1 THEN {ATTR_CREDIT} ELSE 0 END)
                AS BIGINT) AS last_touch_micro,
           CAST(sum({ATTR_CREDIT} // n_t) AS BIGINT) AS linear_micro,
           CAST(count(*) AS BIGINT) AS n_touches
    FROM tc GROUP BY 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution under three standard credit
    models at once: first-touch, last-touch, and linear, over a 24h
    lookback — per touch channel (view/click), in integer micro-credits
    so the fractional linear split stays engine-exact (truncating
    division; the dust lost to flooring is deterministic and identical
    on both engines).

    Shape: one user-keyed equi join with a residual time-window
    predicate attaches candidate touches to each conversion; three
    window functions per conversion grain (bounded fan-in: a user's
    touches within 24h) rank them; the final aggregate is
    channel-bounded.  At 100 TB conversions and touches co-partition by
    user, and no global ordering exists anywhere."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        ts_us().alias("conv_ts"),
    )
    touch = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        F.col("user_id").alias("t_user"),
        "event_type",
        ts_us().alias("touch_ts"),
    )
    tc = conv.join(
        touch,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("touch_ts") < F.col("conv_ts"))
        & (F.col("conv_ts") - F.col("touch_ts") <= ATTR_LOOKBACK_US),
    )
    w_f = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    w_l = Window.partitionBy("conv_id").orderBy(
        F.col("touch_ts").desc(), F.col("touch_id").desc()
    )
    w_n = Window.partitionBy("conv_id")
    ranked = tc.select(
        "event_type",
        F.row_number().over(w_f).alias("rn_f"),
        F.row_number().over(w_l).alias("rn_l"),
        F.count("*").over(w_n).alias("n_t"),
    )
    return ranked.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("rn_f") == 1, ATTR_CREDIT).otherwise(0)
        ).alias("first_touch_micro"),
        F.sum(
            F.when(F.col("rn_l") == 1, ATTR_CREDIT).otherwise(0)
        ).alias("last_touch_micro"),
        F.sum(F.expr(f"{ATTR_CREDIT} div n_t")).alias("linear_micro"),
        F.count("*").alias("n_touches"),
    )


MARKOV_SCALE = 1_000_000  # probabilities and the iterate in micro-units
MARKOV_ITERS = 3


def _sql_markov_step(prev: str) -> str:
    return f"""
      SELECT p.to_type AS state,
             CAST(sum({prev}.pi * p.p_micro // {MARKOV_SCALE}) AS BIGINT)
               AS pi
      FROM {prev} JOIN p ON p.from_type = {prev}.state
      GROUP BY 1
    """


@query(
    "events_markov_stationary",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS next_type
      FROM events
    ),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    rowtot AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1
    ),
    p AS (
      SELECT c.from_type, c.to_type,
             c.n * {MARKOV_SCALE} // r.tot AS p_micro
      FROM c JOIN rowtot r ON r.from_type = c.from_type
    ),
    states AS (SELECT DISTINCT from_type AS state FROM c),
    pi0 AS (
      SELECT state,
             CAST({MARKOV_SCALE} // (SELECT count(*) FROM states)
                  AS BIGINT) AS pi
      FROM states
    ),
    pi1 AS ({_sql_markov_step('pi0')}),
    pi2 AS ({_sql_markov_step('pi1')}),
    pi3 AS ({_sql_markov_step('pi2')})
    SELECT state, pi AS pi_micro FROM pi3
    """,
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{MARKOV_ITERS} power-iteration steps toward the stationary
    distribution of the user-behavior Markov chain — "where do users
    spend their time in the long run" — built on
    events_transition_matrix's empirical transition counts.

    Transition probabilities are integer micro-units (n_ij * 1e6 //
    n_i), the iterate starts uniform, and each step is one 5-row
    broadcast join + aggregate — the pagerank_iter3 loop pattern at
    state-vocabulary grain, so the only corpus-scale work is the one
    lead() pass that counts transitions; everything after is bounded by
    |states|^2.  Truncating division loses < 1 micro-unit per term,
    identically on both engines (all operands positive)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", ts_us().alias("ts_us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    c = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").alias("n"))
    )
    rowtot = c.groupBy("from_type").agg(F.sum("n").alias("tot"))
    p = (
        c.join(rowtot, "from_type")
        .select(
            "from_type",
            "to_type",
            F.expr(f"n * {MARKOV_SCALE} div tot").alias("p_micro"),
        )
        .localCheckpoint(eager=True)  # the chain: built once, iterated on
    )
    states = p.select(F.col("from_type").alias("state")).distinct()
    n_states = states.count()  # |event types|: bounded driver scalar
    pi = states.select(
        "state", F.lit(MARKOV_SCALE // n_states).cast("long").alias("pi")
    ).localCheckpoint(eager=True)
    for _ in range(MARKOV_ITERS):
        pi = (
            F.broadcast(pi)
            .join(p, pi.state == p.from_type)
            .groupBy(F.col("to_type").alias("state"))
            .agg(
                F.sum(
                    F.expr(f"pi * p_micro div {MARKOV_SCALE}")
                ).alias("pi")
            )
            .localCheckpoint(eager=True)
        )
    return pi.select("state", F.col("pi").alias("pi_micro"))


@query(
    "events_variant_extract",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(max(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k
    FROM events GROUP BY 1
    """,
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 VARIANT path for semi-structured columns: props parses
    ONCE into a VARIANT (parse_json — a binary-encoded JSON tree, not a
    string), fields come out with variant_get, and the typed values
    aggregate normally.  Versus per-access get_json_object re-parsing
    (events_json_extract, kept as the F11 twin), VARIANT amortizes the
    parse across every extraction and is the storage form Spark shreds
    into parquet at scale — on a 100 TB event table with many accessed
    keys, parse-once is the difference between one JSON decode per row
    and one per row PER FIELD."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("pv")
    ).select(
        "event_type",
        F.try_variant_get("pv", "$.k", "long").alias("k_val"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k_val").alias("sum_k"),
        F.max("k_val").alias("max_k"),
    )


EWMA_LAGS = 8  # dyadic EWMA depth: weight of lag j is 2^-j (alpha = 1/2)


@query(
    "events_ewma_smooth",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, {SQL_TS_US} AS ts_us,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_c
      FROM events
    )
    SELECT event_id, user_id, value_c,
           {' + '.join(
               f"COALESCE(lag(value_c, {j}) OVER w, 0) // {1 << j}"
               for j in range(EWMA_LAGS))} AS ewma8_c
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    """,
)
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted smoothing with DYADIC weights (alpha = 1/2,
    truncated at {EWMA_LAGS} lags): ewma = sum_j value[t-j] div 2^j —
    every term an integer shift, so the smoothed series is bit-identical
    cross-engine with no float accumulation drift (the recursive EWMA
    form s_t = a*x + (1-a)*s_(t-1) is sequential and float-fragile; the
    truncated convolution is windowable, and 8 dyadic lags bound the
    tail error below one cent unit).

    One per-user window feeds all {EWMA_LAGS} lag() calls — a single
    sort/shuffle on user_id; at 100 TB this is the standard sensor/
    metric smoothing pass, partitioned by series key."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        ts_us().alias("ts_us"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("value_c"),
    )
    # all lags share one window spec, so Catalyst plans ONE WindowExec
    terms = [
        F.expr(f"coalesce(lag(value_c, {j}) OVER (PARTITION BY user_id"
               f" ORDER BY ts_us, event_id), 0) div {1 << j}")
        for j in range(EWMA_LAGS)
    ]
    ewma = terms[0]
    for t in terms[1:]:
        ewma = ewma + t
    return ev.select(
        "event_id", "user_id", "value_c", ewma.alias("ewma8_c")
    )


# Interval-overlap join output cap: the co-activity report keeps the
# top user pairs by total overlapped time (deterministic total order).
OVERLAP_TOP_K = 50
_HOUR_US = 3_600_000_000


@query(
    "events_interval_overlap",
    oracle=f"""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts)
                    - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1
                  WHEN lag(ts) OVER w IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    se AS (
      -- running sum ordered by the SAME (us, event_id) total order that
      -- computed new_session: duplicate per-user timestamps at a session
      -- boundary would otherwise make sid assignment engine-arbitrary
      SELECT user_id, us,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM g
    ),
    sess AS (
      SELECT user_id, sid, min(us) AS st, max(us) AS en
      FROM se GROUP BY 1, 2
    ),
    p AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             least(a.en, b.en) - greatest(a.st, b.st) AS ov
      FROM sess a JOIN sess b
        ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
    )
    SELECT user_a, user_b,
           CAST(count(*) AS BIGINT) AS n_overlaps,
           CAST(sum(ov) AS BIGINT) AS overlap_us
    FROM p GROUP BY 1, 2
    ORDER BY overlap_us DESC, user_a, user_b
    LIMIT {OVERLAP_TOP_K}
    """,
)
def events_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: which user pairs were in overlapping
    sessions, and for how long — the co-activity / concurrency report
    (fraud rings, shared-device detection, A/B interference audits).
    Sessions are the module's 30-min-gap sessionization; two sessions
    overlap when st_a <= en_b AND st_b <= en_a (touching endpoints
    count, overlap 0 µs).

    Scale shape: interval-interval joins have no native equi-key, so
    sessions are exploded onto the hour buckets they span (sessions are
    gap-bounded, so almost always 1-2 buckets) and the join runs as a
    bucket equi-join + overlap filter — never a cartesian; a session
    pair spanning several shared buckets is deduplicated by session id
    before aggregation.  A pathologically hot hour (everyone online) is
    the documented skew case: shrink the bucket to minutes or salt the
    bucket key — same plan, finer key.  The final top-{OVERLAP_TOP_K} is
    TakeOrdered on the bounded user-pair aggregate, ties broken by the
    pair itself."""
    ev = load_table(spark, sf_dir, "events")
    us = ts_us()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = us - F.lag(us).over(w)
    new_session = (
        F.when(gap > SESSION_GAP_US, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0)
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    se = ev.select(
        "user_id",
        us.alias("us"),
        F.sum(new_session).over(run).cast("long").alias("sid"),
    )
    sess = se.groupBy("user_id", "sid").agg(
        F.min("us").alias("st"), F.max("us").alias("en")
    )
    bucketed = sess.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"st div {_HOUR_US}"), F.expr(f"en div {_HOUR_US}")
            )
        ).alias("bkt"),
    )
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.st") <= F.col("b.en"))
            & (F.col("b.st") <= F.col("a.en")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.sid").alias("sid_a"),
            F.col("b.sid").alias("sid_b"),
            (
                F.least(F.col("a.en"), F.col("b.en"))
                - F.greatest(F.col("a.st"), F.col("b.st"))
            ).alias("ov"),
        )
        .distinct()  # a session pair can share several hour buckets
    )
    return (
        pairs.groupBy("user_a", "user_b")
        .agg(
            F.count("*").alias("n_overlaps"),
            F.sum("ov").cast("long").alias("overlap_us"),
        )
        .orderBy(F.col("overlap_us").desc(), "user_a", "user_b")
        .limit(OVERLAP_TOP_K)
    )


# Pattern-search knobs: window length, the fixed integer query pattern (a
# rise-and-fall bump in value cents), and the report's top-k.
PATTERN_W = 8
PATTERN_Q = [0, 100, 200, 300, 400, 300, 200, 100]
PATTERN_TOPK = 20


@query(
    "events_pattern_search",
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
    ),
    dist AS (
      SELECT user_id, event_id,
             {' + '.join(
                 f'(v{i} - {q}) * (v{i} - {q})'
                 for i, q in enumerate(PATTERN_Q))} AS d2
      FROM lagged WHERE v0 IS NOT NULL
    )
    SELECT user_id, event_id, d2
    FROM dist
    ORDER BY d2, user_id, event_id
    LIMIT {PATTERN_TOPK}
    """,
)
def events_pattern_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series subsequence search: the {PATTERN_TOPK} length-
    {PATTERN_W} windows of any user's value series closest (integer
    squared L2 on value cents) to a fixed query pattern — the
    distributed "find occurrences of this shape" primitive behind
    pattern-based alerting and motif mining.

    Each candidate window materializes IN-ROW as {PATTERN_W - 1} lag()
    columns over the per-user ordered window (one shuffle on user_id,
    same partitioning every per-user operator in this module reuses),
    the distance is one codegen'd int64 expression, and the global
    top-k is TakeOrdered with the (d2, user_id, event_id) total order.
    A query fleet generalizes to a broadcast pattern table + one
    distance column per pattern — same single pass."""
    ev = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [
        F.lag(vc, PATTERN_W - 1 - i).over(w).alias(f"v{i}")
        for i in range(PATTERN_W - 1)
    ] + [vc.alias(f"v{PATTERN_W - 1}")]
    lagged = ev.select("user_id", "event_id", *lags).filter(
        F.col("v0").isNotNull()
    )
    d2 = None
    for i, q in enumerate(PATTERN_Q):
        term = (F.col(f"v{i}") - F.lit(q)) * (F.col(f"v{i}") - F.lit(q))
        d2 = term if d2 is None else d2 + term
    return (
        lagged.select("user_id", "event_id", d2.alias("d2"))
        .orderBy("d2", "user_id", "event_id")
        .limit(PATTERN_TOPK)
    )
