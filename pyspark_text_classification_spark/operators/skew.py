"""Skew and co-location tools for 100 TB shuffles (SURVEY.md §7.2 layer 8).

Three mechanisms, each with a plan-level test contract:

- ``salted_aggregate``: two-phase aggregation for skewed group keys — add a
  ``pmod(hash(...), salt)`` sub-key, pre-aggregate (map-side + first
  shuffle spreads the hot key over ``salt`` reducers), then merge on the
  true key. Correct for algebraic aggregates (sum/count/min/max).
- ``salted_join``: replicate the SMALL side ``salt`` times (explode over
  the salt domain) and salt the big side's key, so one hot join key is
  served by ``salt`` reducers instead of one. For when the small side is
  too big to broadcast and AQE's skew splitting isn't available (e.g.
  bucketed inputs or non-AQE engines).
- ``write_bucketed`` / ``bucketed_join_ready``: persist both fact tables
  bucketed + sorted on the join key so repeated joins are exchange-free
  (SortMergeJoin with no Exchange on either side). This is the idiomatic
  Spark answer to "pre-partition the 100 TB fact table once, join it
  every day for free".

AQE (enabled by the engine session factory) already splits skewed
SORT-MERGE joins at runtime; salting remains the portable fallback and the
only lever for skewed AGGREGATES, so both live here as first-class ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, salt: int, salt_cols: Sequence[str] | None) -> Column:
    """pmod(hash(<data columns>), salt): retry-deterministic row salt.

    Derived from row CONTENT, never row position — a salt built on
    ``monotonically_increasing_id`` changes when a stage retry recomputes
    rows after a round-robin repartition, so two attempts of the same task
    could salt the same row differently. Content hashing is stable across
    retries; identical rows sharing a salt only costs a little spread."""
    cols = list(salt_cols) if salt_cols else df.columns
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(salt))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> "fn(input)" where fn is one of
    sum/count/min/max (algebraic: partials merge with the same fn, except
    count which merges with sum).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salt_col = _content_salt(df, salt, salt_cols).alias("__salt")
    partial = df.withColumn("__salt", salt_col).groupBy(*keys, "__salt")
    partial_aggs, final_aggs = [], []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")").strip()
        if fn not in merge_fn:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
        col = F.count(arg or "*") if fn == "count" else getattr(F, fn)(arg)
        partial_aggs.append(col.alias(f"__p_{out}"))
        final_aggs.append(
            getattr(F, merge_fn[fn])(f"__p_{out}").alias(out)
        )
    return (
        partial.agg(*partial_aggs)
        .groupBy(*keys)
        .agg(*final_aggs)
    )


_SALT_SAFE_JOINS = {"inner", "left", "leftouter", "left_outer", "left_semi",
                    "leftsemi", "semi"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``salt`` reducers.

    The small side is replicated ``salt`` times (explode over the salt
    domain — cost: |small| x salt rows through the shuffle), the big side
    gets a content-derived deterministic salt, and the join key becomes
    (key, salt). Result equals ``big.join(small, key, how)`` for the
    big-side-preserving joins only — right/full outer would emit each
    UNMATCHED small-side row once per replica (``salt`` null-padded
    duplicates), so those are rejected rather than silently wrong.
    """
    if how not in _SALT_SAFE_JOINS:
        raise ValueError(
            f"salted_join supports {sorted(_SALT_SAFE_JOINS)} joins; "
            f"{how!r} would duplicate unmatched replicated small-side rows"
        )
    salted_big = big.withColumn("__salt", _content_salt(big, salt, salt_cols))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and sorted) on ``key`` so future
    equi-joins and aggregations on ``key`` need no Exchange. Requires a
    session with a warehouse dir (saveAsTable - bucket metadata lives in
    the catalog, not plain parquet)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # an in-memory catalog forgets tables across sessions while their
    # warehouse directory persists -> LOCATION_ALREADY_EXISTS; clear it
    wh = spark.conf.get("spark.sql.warehouse.dir")
    jpath = spark._jvm.org.apache.hadoop.fs.Path(f"{wh}/{table}")  # noqa: SLF001
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    fs.delete(jpath, True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key: plans as
    SortMergeJoin with ZERO Exchange when bucket counts match. The merge
    hint pins the strategy — this op is for two FACT tables where a
    broadcast would be wrong anyway; at test scale the hint stops the
    planner broadcasting the small fixture and defeating the contract."""
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table).hint("merge"), key)
    )


# ---------------------------------------------------------------------------
# registered query surface: the salted operators held to plain-SQL oracles
# (salting must be RESULT-INVISIBLE — the oracle is the unsalted query)
# ---------------------------------------------------------------------------

from pyspark_text_classification_spark.functions.text import round_half_up  # noqa: E402
from pyspark_text_classification_spark.registry import query  # noqa: E402
from pyspark_text_classification_spark.sources.parquet import load_table  # noqa: E402


@query(
    "q30_salted_skew_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_fl,
           CAST(min(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS min_qty,
           CAST(max(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q30_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a low-cardinality (worst-case
    skew: 3 values over 600k+ rows) group key. The oracle is the PLAIN
    aggregate — salting must change the shuffle layout, never the result.
    Quantities are floored to BIGINT so partial sums are exact integers
    (algebraic merge is order-independent on both engines)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("qty_int"),
    )
    return salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={
            "n_rows": "count(*)",
            "sum_qty_fl": "sum(qty_int)",
            "min_qty": "min(qty_int)",
            "max_qty": "max(qty_int)",
        },
    )


@query(
    "q31_salted_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT)
             AS sum_price_fl
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q31_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join (dim replicated x16, fact keys spread over 16
    reducers) aggregated per market segment. Oracle is the unsalted join:
    salting is a pure execution-layout change. This is the portable skew
    lever for when the small side exceeds broadcast size and AQE skew
    splitting is unavailable."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.floor("o_totalprice").cast("long").alias("price_int")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, key="o_custkey", salt=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum("price_int").alias("sum_price_fl"),
    )


@query(
    "pipeline_skew_probe",
    oracle="""
    WITH c AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(max(cnt) AS BIGINT) AS max_cnt,
           quantile_cont(cnt, 0.5) AS p50_cnt,
           quantile_cont(cnt, 0.99) AS p99_cnt,
           floor((CAST(max(cnt) AS DOUBLE) / quantile_cont(cnt, 0.5))
                 * 10000.0 + 0.5) / 10000.0 AS skew_ratio
    FROM c
    """,
)
def pipeline_skew_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: the distribution of rows per key for a
    prospective join/aggregation key — the measurement that decides
    whether a key needs salting (salted_agg/salted_join) or AQE skew
    splitting before you burn a cluster discovering it.

    Exact percentiles run over the per-key COUNT table (|keys| rows, not
    |rows|), so the probe costs one map-side-combined aggregate plus a
    bounded percentile pass; counts are integers, so the interpolated
    percentiles are dyadic-exact on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_orderkey").agg(F.count("*").alias("cnt"))
    return c.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.percentile("cnt", F.lit(0.5)).alias("p50_cnt"),
        F.percentile("cnt", F.lit(0.99)).alias("p99_cnt"),
        round_half_up(
            F.max("cnt").cast("double") / F.percentile("cnt", F.lit(0.5)), 4
        ).alias("skew_ratio"),
    )
