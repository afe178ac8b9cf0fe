"""Stream-static enrichment: a streaming fact joined to a static broadcast
dimension — the one Structured Streaming join shape the other twins don't
exercise (stream-stream interval join lives in streaming/joins.py).

Spark re-plans the STATIC side per micro-batch, so the dimension is read
(and broadcast) fresh each trigger — at 100 TB of streamed fact that is
exactly the wanted shape: the unbounded side never shuffles for the join
(broadcast hash join, no state store), and only the post-join aggregate
keeps state, keyed by the 25-value nation key.

Held to the batch oracle: the drained stream must equal the plain
customer⋈orders GROUP BY — same contract as every other streaming twin.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import load_table

ORDERS_STREAM_SCHEMA = (
    "o_orderkey LONG, o_custkey LONG, o_orderstatus STRING, "
    "o_totalprice DOUBLE, o_orderdate TIMESTAMP_NTZ, o_orderpriority STRING"
)
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def enrich_frame(src: DataFrame, dim: DataFrame) -> DataFrame:
    """The enrichment plan over any orders frame (streaming or batch):
    broadcast-join the customer dim, aggregate integer-cent revenue per
    nation.  Shared by the registered twin and the multi-batch test so
    both exercise the SAME join condition and quantization (a hand-copied
    twin in the test would keep passing after this code drifts)."""
    price_c = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
    return (
        src.join(F.broadcast(dim), src.o_custkey == dim.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(price_c).alias("revenue_c"),
        )
    )


def stream_enrich_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(orders) -> broadcast join static customer -> per-nation
    aggregate -> memory sink, drained with availableNow."""
    src = (
        spark.readStream.schema(ORDERS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "orders.parquet")
        .load(sf_dir)
    )
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    enriched = enrich_frame(src, dim)
    sink_name = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            enriched.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name)


query(
    "events_stream_enrich",
    oracle="""
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_c
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)(stream_enrich_orders)
