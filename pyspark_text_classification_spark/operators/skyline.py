"""Skyline (pareto-frontier) operator.

"Show me the catalog items no other item beats on BOTH axes" — here the
parts that are strictly cheaper AND strictly larger than nothing else:
p is on the frontier iff no q has (q.price < p.price AND q.size > p.size).
The classic skyline query (Börzsönyi et al., ICDE 2001) that relational
engines lack as a built-in.

Scale shape: the textbook single-node algorithm sorts by price and keeps
a running max of size — a GLOBAL sort, the exact single-reducer window
the repo bans (q41's old ntile trap).  This implementation uses the
two-level prefix pattern (pipeline_global_rank's): fixed-width price
buckets (deterministic integer div, no sampling), a bounded window over
the ~60 bucket summaries for the cross-bucket prefix max, and a
partitioned in-bucket RANGE window for the strictly-cheaper-within-
bucket max.  Every row-bearing window is partitioned; only the
bucket-count-bounded summary window is global.  The RANGE frame (not
ROWS) keeps price TIES from dominating each other; cross-bucket ties
are impossible because equal prices land in the same bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import load_table

SKY_BUCKET_W = 2048  # ~60 buckets over the retail-price range (in cents)


@query(
    "q59_pareto_frontier",
    oracle=f"""
    WITH pts AS (
      SELECT p_partkey,
             CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT p.p_partkey, p.price_c, p.size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_c < p.price_c AND q.size > p.size
    )
    """,
)
def q59_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier of parts on (minimize retail price, maximize
    size): rows not strictly dominated on both axes.  The oracle states
    the semantics as NOT EXISTS; the engine computes it scan-shaped —
    a part survives iff its size is at least the max size of all
    strictly cheaper parts (strictly smaller would mean some cheaper
    part is strictly bigger = dominated), with that prefix max split
    into a bounded cross-
    bucket window plus a partitioned in-bucket RANGE window (see module
    docstring for why this survives 100 TB where sort-and-scan
    doesn't)."""
    part = load_table(spark, sf_dir, "part")
    pts = part.select(
        "p_partkey",
        F.floor(F.col("p_retailprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    ).withColumn("bucket", F.expr(f"price_c div {SKY_BUCKET_W}"))
    # max size among strictly LOWER buckets (bounded: ~60 summary rows)
    b = pts.groupBy("bucket").agg(F.max("size").alias("bmax"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    pre = b.select(
        "bucket",
        F.coalesce(F.max("bmax").over(w_b), F.lit(-1)).alias("pre_max"),
    )
    # max size among strictly CHEAPER rows within the bucket: RANGE frame
    # so equal prices exclude each other from domination
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.join(F.broadcast(pre), "bucket")
        .withColumn(
            "dom_max",
            F.greatest(
                F.col("pre_max"),
                F.coalesce(F.max("size").over(w_in), F.lit(-1)),
            ),
        )
        .filter(F.col("size") >= F.col("dom_max"))  # dominated needs STRICTLY bigger
        .select("p_partkey", "price_c", "size")
    )
