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
    assert df.count() >= 0
    assert len(df.columns) > 0
