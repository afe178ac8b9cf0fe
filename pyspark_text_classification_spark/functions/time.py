"""Event-time derivation shared by the batch/streaming events surface.

The synthetic ``events.parquet`` carries a TIMESTAMP(MICROS) column that
Spark reads as TIMESTAMP_NTZ and DuckDB as naive TIMESTAMP. All engine
time arithmetic runs on ``ts_us`` — integer epoch microseconds — derived
timezone-independently on BOTH engines:

- Spark: ``timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01', ts)`` —
  an NTZ-NTZ difference, so the session timezone never participates (a
  cast to TIMESTAMP_LTZ + ``unix_micros`` would shift with
  ``spark.sql.session.timeZone``, and the grading driver runs a vanilla
  session whose timezone the engine doesn't control);
- DuckDB: ``epoch_us(ts)`` (naive timestamps are treated as UTC).

Integer microseconds also dodge float rounding in window/gap arithmetic:
every derived quantity (gaps, hour buckets, week indexes) is exact
integer math identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spark-side expression (use in expr()/selectExpr composition).
TS_US_EXPR = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"

# DuckDB oracle twin.
SQL_TS_US = "epoch_us(ts)"


def ts_us() -> Column:
    """Epoch-microsecond long for the events ``ts`` column (NTZ-safe)."""
    return F.expr(TS_US_EXPR)
