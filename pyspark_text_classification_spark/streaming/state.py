"""Session-conf scoping for streaming drains.

A Structured Streaming query pins its STATE partition count from
``spark.sql.shuffle.partitions`` at first start.  The fixture-scale
drains these twins run are dominated by per-task state-store overhead —
dozens of near-empty stores per stage per micro-batch — not by data: at
sf0.1 the stream-stream range join measured 6.7s warm at 32 partitions
vs 2.8s at 8, and a vanilla driver session (default 200 partitions)
pays proportionally more.  Scoping the conf around the drain bounds that
overhead and restores the caller's setting after; results are
partitioning-independent.  A 100 TB deployment sizes state partitions
to its executor fleet instead — this helper is fixture economics, not a
scale knob.

Three Python-stateful twins — funnel, pattern, CUSUM — are deliberately
NOT scoped: those three were MEASURED slightly faster at the wider
fan-out (their per-group pandas work dominates the state-store
overhead).  The other applyInPandasWithState twins (sessionize, convert,
scd2) are scoped like the JVM-stateful drains — their state-store
overhead dominated in the same measurement.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

STREAM_STATE_PARTITIONS = 8


@contextmanager
def scoped_state_partitions(
    spark: SparkSession, n: int = STREAM_STATE_PARTITIONS
):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
