"""Custom Python Data Source (Spark 4 DataSource API): a deterministic
row generator, registered as ``format("lcg_rows")``.

Spark 4's python datasource API (SPARK-44076) lets pure-Python sources
plug into the scan planner: the source declares a schema and a PARTITION
LIST, and each partition's ``read`` runs on an executor — so generation
is embarrassingly parallel with zero driver data and zero files.  This
module uses it two ways:

- as the API-surface demonstration (a user of the engine can add a
  custom feed — a service API, a queue, a proprietary format — the same
  way); and
- as a VERIFIABLE source: rows are an affine-congruential function of
  the global row index, so a DuckDB ``range()`` expression regenerates
  them bit-for-bit and the registered query below is hash-checked like
  any relational operator.  Most custom sources are checked only by
  "did it read"; this one's full content is oracle-pinned.

Scale shape (100 TB): partition planning is the only driver work (a list
of index ranges); each executor generates its slice independently — the
pattern behind benchmark generators (dbgen), synthetic-load sources, and
backfill simulators.  ``n_parts`` maps 1:1 onto Spark tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from pyspark_text_classification_spark.registry import query

LCG_A = 1_103_515_245
LCG_B = 12_345
LCG_M = 2_147_483_647  # 2^31 - 1 (operands stay < 2^62: exact in int64)
GEN_TYPES = ("view", "click", "purchase", "signup", "error")
GEN_ROWS = 50_000
GEN_PARTS = 32


class _IndexRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class LCGRowsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", GEN_ROWS))
        self.n_parts = int(options.get("n_parts", GEN_PARTS))

    def partitions(self):
        step = -(-self.n_rows // self.n_parts)  # ceil div
        return [
            _IndexRange(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _IndexRange):
        for i in range(partition.start, partition.end):
            x = (LCG_A * i + LCG_B) % LCG_M
            yield (i, x % 1000, GEN_TYPES[x % 5], x % 10_000)


class LCGRowsDataSource(DataSource):
    """format("lcg_rows"): deterministic affine-congruential row stream."""

    @classmethod
    def name(cls) -> str:
        return "lcg_rows"

    def schema(self) -> str:
        return "row_id long, user_id long, event_type string, value_c long"

    def reader(self, schema) -> LCGRowsReader:
        return LCGRowsReader(self.options)


def read_lcg_rows(
    spark: SparkSession, n_rows: int = GEN_ROWS, n_parts: int = GEN_PARTS
) -> DataFrame:
    """Register (idempotently) and scan the generator source."""
    spark.dataSource.register(LCGRowsDataSource)
    return (
        spark.read.format("lcg_rows")
        .option("n_rows", n_rows)
        .option("n_parts", n_parts)
        .load()
    )


_SQL_X = f"(({LCG_A} * i + {LCG_B}) % {LCG_M})"
_SQL_TYPE = (
    "CASE " + " ".join(
        f"WHEN {_SQL_X} % 5 = {j} THEN '{t}'" for j, t in enumerate(GEN_TYPES)
    ) + " END"
)


@query(
    "source_python_datasource",
    oracle=f"""
    WITH r AS (SELECT range AS i FROM range(0, {GEN_ROWS}))
    SELECT {_SQL_TYPE} AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_SQL_X} % 10000) AS BIGINT) AS sum_value_c,
           CAST(count(DISTINCT {_SQL_X} % 1000) AS BIGINT) AS n_users
    FROM r GROUP BY 1
    """,
)
def source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python data source: per-type counts,
    value sums, and distinct users for {GEN_ROWS} generated rows across
    {GEN_PARTS} executor-side partitions.  The DuckDB oracle regenerates
    the identical rows from ``range()`` — the source's CONTENT, not just
    its row count, is hash-pinned.  (sf_dir is unused: the source is the
    table.)"""
    df = read_lcg_rows(spark)
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value_c").alias("sum_value_c"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --- streaming variant: the same generator as a micro-batch source ----------
STREAM_BATCH_ROWS = 5_000
STREAM_MAX_ROWS = GEN_ROWS  # stream ends (no new offsets) at the batch total


class LCGRowsStreamReader(SimpleDataSourceStreamReader):
    """Offset = next global row index; each micro-batch advances it by
    STREAM_BATCH_ROWS until STREAM_MAX_ROWS.  Offsets are plain dicts
    (JSON-checkpointable), rows are the SAME affine function of the row
    index as the batch reader — so a drained stream equals the batch
    scan row-for-row, and the registered aggregate below shares the
    batch query's DuckDB range() oracle."""

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        lo = start["i"]
        hi = min(lo + STREAM_BATCH_ROWS, STREAM_MAX_ROWS)
        rows = [
            (i, x % 1000, GEN_TYPES[x % 5], x % 10_000)
            for i in range(lo, hi)
            for x in ((LCG_A * i + LCG_B) % LCG_M,)
        ]
        return (iter(rows), {"i": hi})

    def readBetweenOffsets(self, start, end):
        # Replay honors the RECORDED offsets, not the fixed batch size:
        # regenerate exactly range(start, end) so a checkpoint replay of
        # a batch whose span differs from STREAM_BATCH_ROWS is faithful.
        lo, hi = start["i"], end["i"]
        return iter(
            (i, x % 1000, GEN_TYPES[x % 5], x % 10_000)
            for i in range(lo, hi)
            for x in ((LCG_A * i + LCG_B) % LCG_M,)
        )

    def commit(self, end):
        pass


class LCGRowsStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lcg_rows_stream"

    def schema(self) -> str:
        return "row_id long, user_id long, event_type string, value_c long"

    def simpleStreamReader(self, schema) -> LCGRowsStreamReader:
        return LCGRowsStreamReader()


@query(
    "source_python_stream",
    oracle=f"""
    WITH r AS (SELECT range AS i FROM range(0, {GEN_ROWS}))
    SELECT {_SQL_TYPE} AS event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum({_SQL_X} % 10000) AS BIGINT) AS sum_value_c
    FROM r GROUP BY 1
    """,
)
def source_python_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the custom PYTHON STREAMING source -> complete-mode
    per-type aggregate, drained until the generator's offset range is
    exhausted ({GEN_ROWS} rows in {GEN_ROWS // STREAM_BATCH_ROWS}
    micro-batches).  The drained state must equal the batch twin — same
    oracle family as every streaming twin, but here the SOURCE itself is
    the custom code under test.  (sf_dir unused: the source is the
    table.)"""
    import time as _time
    import uuid as _uuid

    spark.dataSource.register(LCGRowsStreamDataSource)
    src = spark.readStream.format("lcg_rows_stream").load()
    agg = src.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("value_c").alias("sum_value_c"),
    )
    sink_name = f"pygen_stream_{_uuid.uuid4().hex[:8]}"
    # NOT availableNow: for a SimpleDataSourceStreamReader that trigger
    # drains only the one prefetched batch.  Run the real micro-batch
    # cadence and stop once the complete-mode state covers every
    # generated row (the offset range is finite, so this converges).
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = _time.time() + 120
    while _time.time() < deadline:
        got = spark.table(sink_name).agg(F.sum("n")).first()[0]
        if got == GEN_ROWS:
            break
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    assert spark.table(sink_name).agg(F.sum("n")).first()[0] == GEN_ROWS
    return spark.table(sink_name)
