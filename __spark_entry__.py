"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``pyspark_text_classification_spark`` — this module
only adapts the package's query registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Audit-pin fence (ADVICE r10 / VERDICT r10 #5): SPARK_GRAFT_QUERY_BATCH_CAP
# exists ONLY for the 10x scale audit (it pins the *_auto query batch to the
# same absolute ids at both scales).  It is correctness-affecting — plans AND
# oracles read it, so a pinned run still hash-matches itself while serving
# different rows than the recorded evidence.  Refuse to expose the driver
# contract under a pin so pinned hashes can never masquerade as correctness
# evidence; scale_audit.py imports the registry directly, not this module.
if os.environ.get("SPARK_GRAFT_QUERY_BATCH_CAP"):
    raise RuntimeError(
        "SPARK_GRAFT_QUERY_BATCH_CAP is set: this pin is for scale-audit "
        "runs only and silently changes batch-capped query outputs — unset "
        "it before driving the correctness/bench contract"
    )

from pyspark_text_classification_spark.all_queries import ORACLES, QUERIES  # noqa: E402

# The driver runs a VANILLA session: 200 shuffle partitions on a handful
# of local cores, and AQE's partition coalescing does NOT apply to
# persisted/cached subplans (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning
# defaults false), so every cached heavy query pays ~200 near-empty
# tasks per shuffle stage.  The engine's execution profile is 32 — the
# same value session.py configures — applied only while the session
# still carries the untouched default, so an explicitly configured
# session (tests scope to 8 for streaming state) is never overridden.
#
# SCOPED, not permanent (VERDICT r8 #7): shuffle-partition conf is read
# at EXECUTION time, so restoring it right after fn() returns a lazy
# plan would silently void the profile at the driver's collect().  The
# wrapper therefore materializes the (small, registry-contract) result
# eagerly via localCheckpoint WHILE the profile is in force, then
# restores the conf — the driver's collect reads checkpointed rows, the
# session is left exactly as found, and results are value-identical by
# construction.  Measured on a 10-query driver-replica block: 33.1s
# permanent-set vs 32.8s scoped — behavior preserved.
DRIVE_SHUFFLE_PARTITIONS = "32"


def _with_drive_profile(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        if spark.conf.get("spark.sql.shuffle.partitions") != "200":
            return fn(spark, sf_dir)
        spark.conf.set(
            "spark.sql.shuffle.partitions", DRIVE_SHUFFLE_PARTITIONS
        )
        try:
            return fn(spark, sf_dir).localCheckpoint(eager=True)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "200")

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core text
    pipeline — tokenize → stopword-filter → vocabulary with tf/df → IDF
    weights (SURVEY.md §7.2 minimum end-to-end slice)."""
    return _with_drive_profile(QUERIES["q15_idf"])(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return {n: _with_drive_profile(f) for n, f in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys absent here get the weaker rows-only check."""
    return dict(ORACLES)
