"""Join / set-op / grouping-set surface (SURVEY.md §2.3, §2.5 SO1, §2.4 A6).

The reference performs no joins (pairs arrive pre-joined in one TSV row) —
but the engine's extension operators (LSH dedup, similarity search) and any
real workload need them, so they are declared first-class here with
explicit physical-strategy intent:

- dimension joins BROADCAST (customer->nation->region style): the small
  side ships to every executor, no shuffle of the fact table;
- fact-fact joins shuffle on the join key and rely on AQE for skew
  splitting at 100 TB;
- set ops and rollups are plain Catalyst; the rollup's partial aggregate
  happens map-side like any hash aggregate.
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


@query(
    "q19_broadcast_dim_join",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           CAST(count(*) AS BIGINT) AS n_customers,
           floor(sum(c.c_acctbal) * 100.0 + 0.5) / 100.0 AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def q19_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dimension join: customer -> nation -> region with both
    dims explicitly broadcast — zero shuffle of the fact side; the only
    shuffle is the final (nation, region) aggregate exchange."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            round_half_up(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "q20_fact_fact_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           {sql_round_half_up('sum(l.l_extendedprice * (1.0 - l.l_discount))', 2)}
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def q20_fact_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (lineitem x orders) with a selective filter
    pushed below the join: Catalyst pushes o_orderstatus='F' into the
    orders scan (PushedFilters), shrinking the shuffled build side by ~2/3
    before the exchange; AQE picks shuffled-hash/broadcast at runtime."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            round_half_up(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
    )


@query(
    "q21_setops",
    oracle="""
    SELECT 'union_all' AS op, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_totalprice > 100000
    )
    UNION ALL
    SELECT 'intersect', count(*) FROM (
      SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000
    )
    UNION ALL
    SELECT 'except', count(*) FROM (
      SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000
    )
    """,
)
def q21_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1 set operations: union/intersect/except cardinalities over the
    same key domain (intersect/except plan as hash semi/anti joins)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    big = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("k")
    )

    def count_row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("op"), "n"
        )

    return (
        count_row("union_all", building.unionAll(big))
        .unionByName(count_row("intersect", building.distinct().intersect(big.distinct())))
        .unionByName(count_row("except", building.distinct().subtract(big.distinct())))
    )


@query(
    "q22_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q22_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 grouping sets: ROLLUP over (returnflag, linestatus) — subtotal
    and grand-total rows carry NULL group keys on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt")
    )


@query(
    "q29_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty_fl,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q29_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 explicit GROUPING SETS through the SQL frontend (rollup's
    generalization — arbitrary set lists, not just prefixes), with
    grouping() flags distinguishing real NULL keys from subtotal rows.
    Catalyst plans one Expand + single hash aggregate, not one scan per
    set. Quantities are floored to BIGINT before summing so the subtotal
    sums are exact integer arithmetic on both engines."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                 AS sum_qty_fl,
               count(*) AS n_rows,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "q23_distinct_counts",
    oracle="""
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)  AS d_orders,
           CAST(count(DISTINCT l_partkey) AS BIGINT)   AS d_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)   AS d_supps
    FROM lineitem
    """,
)
def q23_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 exact distinct counts (multi-column: Catalyst plans an expand +
    two-phase aggregate). The approx_count_distinct variant exists for the
    100 TB path but is engine-specific HLL, hence not oracle-declared."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count_distinct("l_orderkey").alias("d_orders"),
        F.count_distinct("l_partkey").alias("d_parts"),
        F.count_distinct("l_suppkey").alias("d_supps"),
    )


@query(
    "q27_semi_anti_join",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) FILTER (EXISTS (
             SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           )) AS BIGINT) AS with_orders,
           CAST(count(*) FILTER (NOT EXISTS (
             SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
           )) AS BIGINT) AS without_orders
    FROM customer c
    GROUP BY 1
    """,
)
def q27_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit left-semi and left-anti joins (EXISTS / NOT EXISTS): per
    market segment, customers with and without orders. Both plan as hash
    joins carrying only the join key of the right side — no row
    multiplication, the correct shape for existence checks at any scale
    (a regular join + distinct would explode then dedupe)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_o = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("with_orders"))
    )
    without_o = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("without_orders"))
    )
    return (
        with_o.join(without_o, "c_mktsegment", "full")
        .select(
            "c_mktsegment",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
    )


@query(
    "q28_subquery_decorrelation",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey
    FROM orders o
    WHERE o.o_totalprice > 2 * (
      SELECT avg(o2.o_totalprice) FROM orders o2
      WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q28_subquery_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL frontend: orders costing
    more than twice their customer's average. Catalyst decorrelates the
    subquery into an aggregate + equi-join (SURVEY §4 'inherited free') —
    the plan contains no per-row subquery execution. Also the engine's
    demonstration that spark.sql() strings and the DataFrame API share one
    optimizer: every other declared query is API-built, this one is parsed.

    The 2x margin keeps the float comparison far from avg-summation-order
    boundaries, so both engines agree on every row."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey
        FROM v_orders o
        WHERE o.o_totalprice > 2 * (
          SELECT avg(o2.o_totalprice) FROM v_orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


STAR_REGION = "ASIA"


@query(
    "q32_star_join_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                               * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{STAR_REGION}' AND c.c_nationkey = s.s_nationkey
    GROUP BY 1
    """,
)
def q32_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table star join in the TPC-H Q5 shape: revenue per nation from
    lineitems whose customer and supplier share a nation, restricted to one
    region — the multi-join aggregation pattern that exercises Catalyst's
    join planning end to end.

    Physical intent at 100 TB: nation and region broadcast explicitly
    (constant-size dims — the region predicate prunes nations BEFORE any
    fact row moves); supplier and customer are left to AQE, which
    broadcast-converts them while they fit and shuffle-joins beyond that;
    the lineitem-orders fact-fact join shuffles on orderkey with AQE skew
    splitting. The same-nation predicate is an equi-condition between the
    two dimension paths and prunes in the join, not after.

    Per-row revenue is quantized to integer cents BEFORE the sum (sums of
    int64 are order-independent across any partitioning; double sums are
    not), so the aggregate is bit-stable at any cluster size."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == STAR_REGION
    )
    rev_cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
        + F.lit(0.5)
    ).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(rev_cents).alias("revenue_cents"),
        )
    )


# pricing-summary cutoff: 2000-01-01 UTC in epoch micros (integer, exact)
PRICING_CUTOFF_US = 946_684_800_000_000


@query(
    "q33_pricing_summary",
    oracle=f"""
    WITH f AS (
      SELECT l_returnflag, l_linestatus,
             CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT) AS qty_c,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_c,
             CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                  AS BIGINT) AS disc_c,
             CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                        * 100.0 + 0.5) AS BIGINT) AS charge_c,
             CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT) AS disc_bp
      FROM lineitem
      WHERE epoch_us(l_shipdate) <= {PRICING_CUTOFF_US}
    )
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS count_order,
           CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
           CAST(sum(price_c) AS BIGINT) AS sum_base_price_c,
           CAST(sum(disc_c) AS BIGINT) AS sum_disc_price_c,
           CAST(sum(charge_c) AS BIGINT) AS sum_charge_c,
           {sql_round_half_up(
               'CAST(sum(qty_c) AS DOUBLE) / (100.0 * count(*))', 4)}
             AS avg_qty,
           {sql_round_half_up(
               'CAST(sum(price_c) AS DOUBLE) / (100.0 * count(*))', 4)}
             AS avg_price,
           {sql_round_half_up(
               'CAST(sum(disc_bp) AS DOUBLE) / (10000.0 * count(*))', 4)}
             AS avg_disc
    FROM f GROUP BY 1, 2
    """,
)
def q33_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary in the TPC-H Q1 shape: per (returnflag, linestatus),
    order counts plus sum/avg of quantity, base price, discounted price,
    and charge, over lineitems shipped before a cutoff.

    The scan-side projection computes all derived measures and quantizes
    them to integer cents / basis points per row, so the wide aggregate
    sums int64 (order-independent at any partitioning — the multi-measure
    analogue of q32's revenue discipline) with map-side partials; the
    shipdate predicate is an NTZ-literal comparison (timezone-independent,
    equivalent to epoch_us <= cutoff) that reaches the parquet scan as a
    PushedFilter for row-group skipping. One shuffle, six rows out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.expr("l_shipdate <= TIMESTAMP_NTZ'2000-01-01 00:00:00'")
    )

    def cents(col: F.Column, scale: float = 100.0) -> F.Column:
        return F.floor(col * scale + F.lit(0.5)).cast("long")

    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    f = li.select(
        "l_returnflag",
        "l_linestatus",
        cents(F.col("l_quantity")).alias("qty_c"),
        cents(F.col("l_extendedprice")).alias("price_c"),
        cents(disc_price).alias("disc_c"),
        cents(disc_price * (F.lit(1.0) + F.col("l_tax"))).alias("charge_c"),
        cents(F.col("l_discount"), 10000.0).alias("disc_bp"),
    )
    cnt = F.count("*")
    return f.groupBy("l_returnflag", "l_linestatus").agg(
        cnt.alias("count_order"),
        F.sum("qty_c").alias("sum_qty_c"),
        F.sum("price_c").alias("sum_base_price_c"),
        F.sum("disc_c").alias("sum_disc_price_c"),
        F.sum("charge_c").alias("sum_charge_c"),
        round_half_up(F.sum("qty_c").cast("double") / (100.0 * cnt), 4).alias(
            "avg_qty"
        ),
        round_half_up(F.sum("price_c").cast("double") / (100.0 * cnt), 4).alias(
            "avg_price"
        ),
        round_half_up(F.sum("disc_bp").cast("double") / (10000.0 * cnt), 4).alias(
            "avg_disc"
        ),
    )


LARGE_ORDER_QTY_C = 250 * 100  # sum(l_quantity) > 250, in integer centi-units
LARGE_ORDER_TOPK = 20


@query(
    "q34_large_order_customers",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS qty_c
      FROM lineitem GROUP BY 1
      HAVING sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT))
             > {LARGE_ORDER_QTY_C}
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           epoch_us(o.o_orderdate) // 1000000 AS o_orderdate_s,
           CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
             AS totalprice_c,
           big.qty_c
    FROM big
    JOIN orders o ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY totalprice_c DESC, o.o_orderkey
    LIMIT {LARGE_ORDER_TOPK}
    """,
)
def q34_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): aggregate lineitem per
    order, keep orders whose total quantity clears a threshold, then join
    orders and customer for the top-k by order value.

    The HAVING filter runs BEFORE any join, collapsing the fact table to
    the rare heavy orders — at 100 TB the post-filter side is small enough
    that AQE broadcast-converts both subsequent joins, so the only full
    shuffle is the map-side-combined orderkey aggregate.  Quantities and
    prices are quantized to integer centi-units before summing/sorting
    (order-independent int64 sums; no double ties in the top-k), and the
    top-k itself is TakeOrdered — per-partition k then a k-sized merge,
    never a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    qty_c = F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty_c).alias("qty_c"))
        .filter(F.col("qty_c") > LARGE_ORDER_QTY_C)
    )
    date_s = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
        " o_orderdate) div 1000000"
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            date_s.alias("o_orderdate_s"),
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("totalprice_c"),
            "qty_c",
        )
        .orderBy(F.col("totalprice_c").desc(), "o_orderkey")
        .limit(LARGE_ORDER_TOPK)
    )


PROMO_TYPE = "ECONOMY"


@query(
    "q35_promo_revenue_share",
    oracle=f"""
    SELECT
      CAST(sum(CASE WHEN p.p_type = '{PROMO_TYPE}'
                    THEN CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                    * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS promo_revenue_c,
      CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                          * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        AS total_revenue_c,
      {sql_round_half_up(
          "100.0 * sum(CASE WHEN p.p_type = '" + PROMO_TYPE + "'"
          " THEN CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)"
          " * 100.0 + 0.5) AS BIGINT) ELSE 0 END)"
          " / sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)"
          " * 100.0 + 0.5) AS BIGINT))", 4)} AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def q35_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of total discounted
    revenue earned by one part type, computed as a conditional aggregate
    over the lineitem-part join.

    Scale shape: the join shuffles on partkey (part is fact-sized at
    100 TB, so no forced broadcast — AQE converts it while it fits); the
    CASE folds into the aggregate so a single pass produces both sums
    with map-side partials.  Revenue quantizes to integer cents BEFORE
    summing — the order-independent-sum rule every money aggregate in
    this engine follows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev_c = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
        + F.lit(0.5)
    ).cast("long")
    promo_c = F.when(F.col("p_type") == PROMO_TYPE, rev_c).otherwise(F.lit(0))
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        F.sum(promo_c).alias("promo_revenue_c"),
        F.sum(rev_c).alias("total_revenue_c"),
    ).select(
        "promo_revenue_c",
        "total_revenue_c",
        round_half_up(
            F.lit(100.0)
            * F.col("promo_revenue_c").cast("double")
            / F.col("total_revenue_c").cast("double"),
            4,
        ).alias("promo_pct"),
    )


_PRIORITY_SHARE_SQL = """
    WITH rev AS (
      SELECT o.o_orderpriority AS priority,
             CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                        * 100.0 + 0.5) AS BIGINT) AS rev_c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    agg AS (
      SELECT priority,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(sum(rev_c) AS BIGINT) AS revenue_c
      FROM rev GROUP BY priority
    )
    SELECT priority, n_lines, revenue_c,
           -- CASTs keep the arithmetic in DOUBLE on both engines (Spark
           -- parses bare decimal literals as DECIMAL and would propagate it)
           floor((CAST(100 AS DOUBLE) * CAST(revenue_c AS DOUBLE)
                  / CAST(sum(revenue_c) OVER () AS DOUBLE))
                 * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE))
           / CAST(10000 AS DOUBLE) AS revenue_pct
    FROM agg
"""


@query("q36_sql_frontend", oracle=_PRIORITY_SHARE_SQL)
def q36_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: the engine's tables exposed as views and a
    query submitted as ANSI SQL text via ``spark.sql`` — same Catalyst
    plan, pushdown, and AQE as the DataFrame API (the oracle IS the query
    string, run verbatim by DuckDB: one source of truth, two engines).

    The query itself exercises CTEs, a fact-fact join, a grouped
    aggregate, and a global-window share — revenue mix by order priority
    with integer-cent determinism."""
    from pyspark_text_classification_spark.sources.parquet import register_views

    register_views(spark, sf_dir, ("lineitem", "orders"))
    return spark.sql(_PRIORITY_SHARE_SQL)


TRADE_NATION_A = "NATION_1"
TRADE_NATION_B = "NATION_2"


@query(
    "q37_bination_trade",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                               * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS volume_c
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = '{TRADE_NATION_A}' AND cn.n_name = '{TRADE_NATION_B}')
       OR (sn.n_name = '{TRADE_NATION_B}' AND cn.n_name = '{TRADE_NATION_A}')
    GROUP BY 1, 2, 3
    """,
)
def q37_bination_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): discounted revenue flowing in
    each direction between two nations, per order year — the two-
    dimension-path join topology (supplier nation AND customer nation
    resolved independently) with a disjunctive cross-path predicate.

    Physical intent: both nation dims broadcast (the OR predicate prunes
    to two nations per path BEFORE any fact row moves); supplier/customer
    go to AQE; the one real shuffle is lineitem-orders on orderkey.
    ``year()`` on a TIMESTAMP_NTZ is calendar math on the naive value —
    identical in DuckDB over naive TIMESTAMP, no timezone in play.
    Revenue quantizes to integer cents pre-sum as always."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    vol_c = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
        + F.lit(0.5)
    ).cast("long")
    pair = (
        (F.col("supp_nation") == TRADE_NATION_A)
        & (F.col("cust_nation") == TRADE_NATION_B)
    ) | (
        (F.col("supp_nation") == TRADE_NATION_B)
        & (F.col("cust_nation") == TRADE_NATION_A)
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(vol_c).alias("volume_c"),
        )
    )


_Q19_ARMS_SQL = """
    (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
    OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
    OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@query(
    "q39_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                               * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_c
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {_Q19_ARMS_SQL}
    """,
)
def q39_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue for special handling): a
    three-arm OR of conjunctions mixing columns from BOTH join sides —
    the predicate structure that separates engines that can only push
    simple conjuncts from those that factor disjunctions.

    Catalyst extracts the per-side common denominators of the OR (brand
    and size membership for the part scan; the quantity envelope for the
    lineitem scan) and pushes them below the join, so both scans prune
    before any row shuffles; the exact mixed-side residual evaluates in
    the join. Declared as one SQL string evaluated verbatim by both
    engines (same trick as q36) to pin identical semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    li.createOrReplaceTempView("lineitem_q39")
    part.createOrReplaceTempView("part_q39")
    return spark.sql(
        f"""
        SELECT CAST(count(*) AS BIGINT) AS n_lines,
               CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                   * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_c
        FROM lineitem_q39 l JOIN part_q39 p ON l.l_partkey = p.p_partkey
        WHERE {_Q19_ARMS_SQL}
        """
    )


@query(
    "q40_monthly_revenue_trend",
    oracle=f"""
    WITH m AS (
      SELECT CAST(year(o.o_orderdate) * 100 + month(o.o_orderdate) AS BIGINT)
               AS ym,
             CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                 * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_c
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
    SELECT cur.ym, cur.revenue_c,
           prev.revenue_c AS revenue_prev_year_c,
           {sql_round_half_up(
               'CAST(100 AS DOUBLE) * (CAST(cur.revenue_c AS DOUBLE)'
               ' - CAST(prev.revenue_c AS DOUBLE))'
               ' / CAST(prev.revenue_c AS DOUBLE)', 4)} AS yoy_pct
    FROM m cur JOIN m prev ON cur.ym = prev.ym + 100
    """,
)
def q40_monthly_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth: the month-grain rollup
    self-joined against the same month one year earlier — the trend line
    every revenue dashboard opens with, and the calendar-function corner
    (year()/month() on TIMESTAMP_NTZ — naive calendar math, identical in
    both engines).

    One event-sized shuffle (the orderkey join feeding the ym rollup);
    the YoY self-join runs over the months-bounded rollup.  Integer-cent
    sums as always; the growth ratio is computed from exact int64 inputs
    with one rounded division."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    rev_c = F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100.0
        + F.lit(0.5)
    ).cast("long")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    m = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(ym.alias("ym"))
        .agg(F.sum(rev_c).alias("revenue_c"))
        .persist()
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    return cur.join(prev, F.col("cur.ym") == F.col("prev.ym") + 100).select(
        F.col("cur.ym").alias("ym"),
        F.col("cur.revenue_c").alias("revenue_c"),
        F.col("prev.revenue_c").alias("revenue_prev_year_c"),
        round_half_up(
            F.lit(100.0)
            * (
                F.col("cur.revenue_c").cast("double")
                - F.col("prev.revenue_c").cast("double")
            )
            / F.col("prev.revenue_c").cast("double"),
            4,
        ).alias("yoy_pct"),
    )


@query(
    "q41_customer_rfm",
    oracle="""
    WITH mx AS (SELECT max(epoch_us(o_orderdate)) AS t_max FROM orders),
    per_cust AS (
      SELECT o_custkey,
             CAST((mx.t_max - max(epoch_us(o_orderdate)))
                  // 86400000000 AS BIGINT) AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS monetary_c
      FROM orders, mx
      GROUP BY o_custkey, mx.t_max
    ),
    scored AS (
      SELECT o_custkey, monetary_c,
             ntile(4) OVER (ORDER BY recency_days, o_custkey) AS r,
             ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f,
             ntile(4) OVER (ORDER BY monetary_c DESC, o_custkey) AS m
      FROM per_cust
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(monetary_c) AS BIGINT) AS segment_monetary_c
    FROM scored GROUP BY 1, 2, 3
    """,
)
def q41_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score every customer on Recency,
    Frequency, and Monetary value, then count customers and revenue per
    (r, f, m) cell — the segmentation every CRM/retention analysis
    starts from.

    Shape: one per-customer aggregate (map-side combined) against a
    broadcast scalar max-date; then three RANGE-PARTITIONED total-order
    ranks (pipeline.total_order_rank — repartitionByRange + in-partition
    enumeration + driver-side prefix offsets) with ntile derived
    arithmetically from the rank (pipeline.ntile_from_rank), so there is
    NO single-reducer global sort anywhere in the plan — each ranking
    range-shuffles only a two-column customer-grain projection; bounded
    4x4x4 output.  Integer days / cents everywhere; every ranking
    carries the custkey tie-break, so quartile edges are deterministic
    and identical to the oracle's ntile windows."""
    orders = load_table(spark, sf_dir, "orders")
    date_us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00',"
        " o_orderdate)"
    )
    mx = orders.agg(F.max(date_us).alias("t_max"))
    per_cust = (
        orders.select(
            "o_custkey",
            date_us.alias("d_us"),
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("long")
            .alias("price_c"),
        )
        .crossJoin(F.broadcast(mx))
        .groupBy("o_custkey", "t_max")
        .agg(
            F.expr("(max(t_max) - max(d_us)) div 86400000000")
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum("price_c").alias("monetary_c"),
        )
    )
    from pyspark_text_classification_spark.operators.pipeline import (
        ntile_from_rank,
        total_order_rank,
    )

    # Materialize the customer-grain summary once (eager localCheckpoint:
    # three rankings read it, and no catalog-cache entry outlives the
    # query in a long multi-query session).
    pc = per_cust.select(
        "o_custkey", "recency_days", "frequency", "monetary_c"
    ).localCheckpoint(eager=True)
    specs = {
        "r": ("recency_days", False),
        "f": ("frequency", True),
        "m": ("monetary_c", True),
    }
    scored = pc
    for tile_col, (metric, desc) in specs.items():
        order = [
            F.col(metric).desc() if desc else F.col(metric).asc(),
            F.col("o_custkey").asc(),
        ]
        # rank only the (custkey, metric) projection: the range shuffle
        # carries two longs per customer, not the whole summary row
        ranked, n = total_order_rank(
            pc.select("o_custkey", metric), order, rank_col=f"rank_{tile_col}"
        )
        tiles = ranked.select(
            "o_custkey",
            ntile_from_rank(f"rank_{tile_col}", n).cast("long").alias(tile_col),
        )
        scored = scored.join(tiles, "o_custkey")
    return scored.groupBy("r", "f", "m").agg(
        F.count("*").alias("n_customers"),
        F.sum("monetary_c").alias("segment_monetary_c"),
    )


@query(
    "q60_cube_grouping",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
             AS sum_qty_fl,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q60_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 grouping sets, CUBE variant: all 2^2 grouping combinations in
    one pass — the missing sibling of q22's ROLLUP (prefixes) and q29's
    explicit GROUPING SETS.  grouping() flags disambiguate subtotal NULLs
    from real NULL keys.  Catalyst plans ONE Expand (4x row replication)
    feeding a single hash aggregate — at 100 TB the Expand multiplies
    map-side rows but every replica partial-aggregates before the one
    shuffle, so the cube costs one pass, not 2^dims scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.floor("l_quantity").cast("long")).alias("sum_qty_fl"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    )


PARAM_MIN_QTY = 45  # the bind value the parameterized frontend query uses


@query(
    "q61_parameterized_sql",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
             AS sum_qty_fl
    FROM lineitem
    WHERE l_quantity >= {PARAM_MIN_QTY}
    GROUP BY 1
    """,
)
def q61_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parameterized-SQL frontend (Spark 4 named-parameter markers):
    the bind value travels as a PARAMETER (:min_qty + args dict), never
    string-interpolated — the injection-safe form every SQL-frontend
    service should use.  Catalyst substitutes the literal before
    optimization, so the predicate still reaches the parquet scan as a
    PushedFilter exactly like q36's verbatim-SQL twin."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "v_li_param"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               count(*) AS n_rows,
               CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
                 AS sum_qty_fl
        FROM v_li_param
        WHERE l_quantity >= :min_qty
        GROUP BY 1
        """,
        args={"min_qty": PARAM_MIN_QTY},
    )
