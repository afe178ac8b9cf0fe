"""Analytic aggregates: exact percentiles, per-entity window analytics,
and the approximate-sketch scale path.

Extends the reference's aggregation surface (SURVEY.md §2.4 had only
count/groupBy-count/describe) with the analytics a 100 TB pipeline needs:

- exact interpolated percentiles (both engines implement the classic
  ``index = p * (n-1)`` linear interpolation, so results hash-match after
  4-decimal rounding);
- rank / lag / moving-average / running-sum window analytics per customer
  (one shuffle on the partition key, same shape as operators/events.py);
- approx_percentile (KLL-ish) + approx_count_distinct (HyperLogLog++) as
  the sketch-based scale path — sketch internals are engine-specific, so
  this query is declared WITHOUT an oracle (rows-only check) and its
  agreement with the exact query is asserted in tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.text import (
    round_half_up,
    sql_round_half_up,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import load_table

PCTS = (0.25, 0.5, 0.75, 0.95)


@query(
    "q24_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {', '.join(
               sql_round_half_up(f'quantile_cont(l_extendedprice, {p})', 4)
               + f' AS p{int(p * 100)}'
               for p in PCTS
           )},
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q24_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of extended price per return flag.

    All four percentiles come from ONE Percentile aggregate (array form) —
    four scalar calls would each build their own value-count map over the
    group; the array form shares one map and one sort."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(list(PCTS))).alias("ps"),
        F.count("*").alias("n"),
    )
    return pcts.select(
        "l_returnflag",
        *[
            round_half_up(F.col("ps")[i], 4).alias(f"p{int(p * 100)}")
            for i, p in enumerate(PCTS)
        ],
        "n",
    )


@query(
    "q25_window_analytics",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST(rank() OVER (
             PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS price_rank,
           lag(o_orderkey) OVER w AS prev_orderkey,
           {sql_round_half_up(
               'avg(o_totalprice) OVER ('
               'PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey '
               'ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)', 4)} AS mov_avg3,
           {sql_round_half_up(
               'sum(o_totalprice) OVER ('
               'PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey '
               'ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)', 4)}
             AS run_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q25_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order analytics: price rank, previous order, 3-order
    moving average, running spend. Both windows share one shuffle on
    o_custkey (Catalyst reuses the exchange; the two sort orders differ so
    there are two sorts, not two shuffles)."""
    o = load_table(spark, sf_dir, "orders")
    w_time = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    mov3 = w_time.rowsBetween(-2, Window.currentRow)
    run = w_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w_price).alias("price_rank"),
        F.lag("o_orderkey").over(w_time).alias("prev_orderkey"),
        round_half_up(F.avg("o_totalprice").over(mov3), 4).alias("mov_avg3"),
        round_half_up(F.sum("o_totalprice").over(run), 4).alias("run_sum"),
    )


@query(
    "q26_approx_sketches",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {', '.join(f'TRUE AS ap{int(p * 100)}_ok' for p in PCTS)},
           TRUE AS distinct_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q26_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-based scale path, shipped as its own accuracy audit:
    approx_percentile (bounded-error quantile sketch) and
    approx_count_distinct (HyperLogLog++, rsd 2%) per return flag. At
    100 TB these replace their exact twins (q24 / q23_distinct_counts):
    sketches merge map-side, so the shuffle carries O(sketch) bytes per
    group instead of O(rows).

    Sketch VALUES are engine-specific, so the cross-engine contract is
    the accuracy bound instead: the Spark side computes the sketch and
    the exact aggregate in one pass and emits per-group booleans
    (relative error <= 5% for quantiles, <= 10% for the HLL distinct
    count — deterministic for a fixed dataset, since both sketches are
    hash-seeded, not sampled), and the oracle states the expected
    invariant (all TRUE) alongside the exactly checkable group keys and
    counts. A sketch drifting out of tolerance flips a boolean and
    fails the hash match. In production the audit runs on snapshots;
    the serving path is the sketch aggregate alone."""
    li = load_table(spark, sf_dir, "lineitem")
    # Three separate one-pass aggregates joined on the 3-row group key:
    # mixing countDistinct with the two percentile aggregates in one agg
    # plans an Expand that duplicates every input row per aggregate path
    # and builds the percentile value maps over the expanded rows
    # (measured 12.3s vs ~1.5s split, sf0.1).  The distinct pair is its
    # own aggregate for the same reason.
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_percentile(
            "l_extendedprice", F.lit(list(PCTS)), F.lit(10_000)
        ).alias("approx_pcts"),
        F.count("*").alias("n"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(list(PCTS))).alias(
            "exact_pcts"
        ),
    )
    # exact distinct via two-level count (no Expand), HLL alongside
    parts = (
        li.groupBy("l_returnflag", "l_partkey")
        .agg(F.count("*").alias("_cnt"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("exact_parts"))
    )
    hll = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias(
            "approx_parts"
        ),
    )
    sketched = (
        sketches.join(exact, "l_returnflag")
        .join(parts, "l_returnflag")
        .join(hll, "l_returnflag")
    )
    within = [
        (
            F.abs(F.col("approx_pcts")[i] - F.col("exact_pcts")[i])
            <= 0.05 * F.col("exact_pcts")[i]
        ).alias(f"ap{int(p * 100)}_ok")
        for i, p in enumerate(PCTS)
    ]
    return sketched.select(
        "l_returnflag",
        "n",
        *within,
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= 0.10 * F.col("exact_parts")
        ).alias("distinct_ok"),
    )


@query(
    "q38_brand_price_spread",
    oracle="""
    WITH p AS (
      SELECT p_brand, p_size,
             CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_c
      FROM part
    )
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT p_size) AS BIGINT) AS n_sizes,
           CAST(min(price_c) AS BIGINT) AS min_price_c,
           quantile_cont(price_c, 0.5) AS med_price_c,
           CAST(max(price_c) AS BIGINT) AS max_price_c
    FROM p GROUP BY 1
    """,
)
def q38_brand_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price-spread profile over the part dimension: count,
    distinct sizes, and min/median/max retail price — the catalog-health
    describe() generalized to grouped exact percentiles.

    Prices quantize to integer cents first, so the median interpolation
    is dyadic-exact cross-engine; one map-side-combined aggregate, output
    bounded by the brand vocabulary."""
    part = load_table(spark, sf_dir, "part")
    price_c = F.floor(F.col("p_retailprice") * 100.0 + F.lit(0.5)).cast("long")
    return (
        part.select("p_brand", "p_size", price_c.alias("price_c"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.countDistinct("p_size").alias("n_sizes"),
            F.min("price_c").alias("min_price_c"),
            F.percentile("price_c", F.lit(0.5)).alias("med_price_c"),
            F.max("price_c").alias("max_price_c"),
        )
    )


@query(
    "events_abtest_ztest",
    oracle="""
    WITH assign AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant FROM events
      GROUP BY 1, 2
    ),
    conv AS (
      SELECT user_id, 1 AS converted FROM events
      WHERE event_type = 'purchase' GROUP BY 1
      HAVING count(*) >= 14
    ),
    per_v AS (
      SELECT a.variant,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(COALESCE(c.converted, 0)) AS BIGINT) AS n_conv
      FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
      GROUP BY 1
    ),
    wide AS (
      SELECT
        (SELECT n_users FROM per_v WHERE variant = 0) AS n_a,
        (SELECT n_conv FROM per_v WHERE variant = 0) AS conv_a,
        (SELECT n_users FROM per_v WHERE variant = 1) AS n_b,
        (SELECT n_conv FROM per_v WHERE variant = 1) AS conv_b
    )
    SELECT n_a, conv_a, n_b, conv_b,
           CAST(floor((CAST(conv_a AS DOUBLE) / n_a) * 10000.0 + 0.5) AS BIGINT) AS rate_a_bp,
           CAST(floor((CAST(conv_b AS DOUBLE) / n_b) * 10000.0 + 0.5) AS BIGINT) AS rate_b_bp,
           CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
             THEN 0.0
             ELSE floor(((CAST(conv_b AS DOUBLE) / n_b
                          - CAST(conv_a AS DOUBLE) / n_a)
               / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b))) * 10000.0 + 0.5)
               / 10000.0 END AS z_score
    FROM wide
    """,
)
def events_abtest_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: hash-assigned variants (user_id parity
    stands in for the assignment hash), per-variant conversion counts,
    rates in basis points, and the two-proportion pooled z-score —
    the statistical test every growth team runs on event logs.

    Determinism without integer-only math: every float enters as a ratio
    of exact int64 counts, and IEEE division/sqrt are correctly rounded,
    so both engines compute bit-identical doubles from identical
    integers; the export rounds half-up to 4 decimals as usual.  Shape:
    one distinct-user aggregate, one conversion semi-aggregate, a 2-row
    regroup — everything after the first shuffle is bounded by the
    variant count, and the assignment hash keeps the experiment
    join-free at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    assign = ev.select(
        "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).distinct()
    # conversion = a heavy purchaser (>= 14 purchase events): the uniform
    # synthetic data converts EVERY user on mere presence, which
    # degenerates p_pool to 1 and the z denominator to 0
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("np"))
        .filter(F.col("np") >= 14)
        .select("user_id", F.lit(1).alias("converted"))
    )
    per_v = (
        assign.join(conv, "user_id", "left")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(F.coalesce(F.col("converted"), F.lit(0))).alias("n_conv"),
        )
    )
    # One conditional global aggregate instead of filter+crossJoin: a
    # global agg always yields exactly 1 row (NULL side-columns when a
    # variant is empty), matching the oracle's scalar-subquery CTE — the
    # crossJoin form would yield 0 rows if either side were empty.
    wide = per_v.agg(
        F.sum(F.when(F.col("variant") == 0, F.col("n_users"))).alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("n_conv"))).alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("n_users"))).alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("n_conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    p_pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    degen = (F.col("conv_a") + F.col("conv_b") == 0) | (
        F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b")
    )
    z = F.when(degen, F.lit(0.0)).otherwise(
        round_half_up(
            (p_b - p_a)
            / F.sqrt(
                p_pool
                * (1.0 - p_pool)
                * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
            ),
            4,
        )
    )
    return wide.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.floor(p_a * 10000.0 + F.lit(0.5)).alias("rate_a_bp"),
        F.floor(p_b * 10000.0 + F.lit(0.5)).alias("rate_b_bp"),
        z.alias("z_score"),
    )


@query(
    "q58_window_extras",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(floor(percent_rank() OVER w * 10000.0 + 0.5) AS BIGINT)
             AS pct_rank_bp,
           CAST(floor(cume_dist() OVER w * 10000.0 + 0.5) AS BIGINT)
             AS cume_dist_bp,
           CAST(first_value(l_quantity) OVER w AS BIGINT) AS first_qty,
           CAST(nth_value(l_quantity, 2) OVER w AS BIGINT) AS second_qty,
           CAST(last_value(l_quantity) OVER (
             PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey,
               l_suppkey, l_quantity, l_extendedprice
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS last_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey,
                 l_suppkey, l_quantity, l_extendedprice)
    """,
)
def q58_window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The window-function tail the core queries don't exercise:
    percent_rank / cume_dist (in integer basis points), first_value /
    nth_value with the default running frame, and last_value with an
    explicit UNBOUNDED FOLLOWING frame (the classic default-frame trap:
    without it last_value is just the current row).

    Partitioned by ORDER — bounded few-row partitions, so no reducer
    ever sees more than one order's lines and the sort is per-partition;
    the high-cardinality partition key is exactly what makes ranked
    windows scale (contrast: an empty partitionBy would funnel the fact
    table through one task, the anti-pattern q41's de-skew removed)."""
    li = load_table(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data
    # (11k duplicate pairs at sf0.01), so the order key is widened to a
    # verified-unique composite — under ties, first/nth/last_value are
    # engine-arbitrary and the hash match would be luck
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice",
    )
    w_full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bp = lambda col: F.floor(col * 10000.0 + F.lit(0.5)).cast("long")  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        bp(F.percent_rank().over(w)).alias("pct_rank_bp"),
        bp(F.cume_dist().over(w)).alias("cume_dist_bp"),
        F.first("l_quantity").over(w).cast("long").alias("first_qty"),
        F.nth_value("l_quantity", 2).over(w).cast("long").alias("second_qty"),
        F.last("l_quantity").over(w_full).cast("long").alias("last_qty"),
    )
