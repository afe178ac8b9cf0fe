"""t2-style correctness: every registered query with an oracle hash-matches
DuckDB on the local scale factor (driver runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from pyspark_text_classification_spark.all_queries import ORACLES, QUERIES
from tests.conftest import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, oracle_con, ORACLES[name], name=name)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_query_runs_rows_only(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    from tests.conftest import assert_no_decimal_outputs

    assert_no_decimal_outputs(df, name=name)
    assert df.count() >= 0
    assert len(df.columns) > 0


# ---------------------------------------------------------------------------
# Hasher-portability type gate.  Round 5's only two driver-red rows
# (q56_important_parts, ml_decision_stump) were the only two CHECKED queries
# whose oracle emitted a DuckDB HUGEINT output column (an uncast sum(BIGINT));
# HUGEINT survives our raw fetchall() replica as a Python int but converts to
# float64/object under pandas-style hashers, so the red was deterministic in
# the driver environment and invisible locally.  Lock the invariant: every
# oracle's output columns must be plain hashable SQL types, and no Spark query
# may return a DecimalType column (decimal.Decimal repr is also
# hasher-dependent — DECIMAL(38,0) belongs INSIDE sums, cast back to BIGINT
# in the final select).
# ---------------------------------------------------------------------------

_BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UINTEGER", "UBIGINT")


def test_oracle_output_types_are_hasher_portable(oracle_con):
    bad = []
    for name, sql in sorted(ORACLES.items()):
        rel = oracle_con.sql(sql)
        for col, typ in zip(rel.columns, (str(t) for t in rel.types)):
            if any(typ.startswith(b) for b in _BAD_ORACLE_TYPES):
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "oracle output columns with hasher-fragile DuckDB types "
        f"(cast to BIGINT in the final SELECT): {bad}"
    )


# The Spark-side twin of this gate (no DecimalType output columns) runs
# inside assert_matches_oracle / test_query_runs_rows_only so each query's
# DataFrame is built exactly once per suite run.
