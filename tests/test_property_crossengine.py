"""Property-based cross-engine determinism: the primitives every oracle
rests on (polynomial hash, tokenizer, half-up rounding) must agree between
Spark, DuckDB, and a pure-Python reference on ARBITRARY inputs, not just
the synthetic corpus. Hypothesis drives the input space; each example
batch goes through one Spark job and one DuckDB query.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    HASH_MOD,
    HASH_MULT,
    char_poly_hash,
    sql_char_poly_hash,
)
from pyspark_text_classification_spark.functions.text import (
    round_half_up,
    sql_round_half_up,
    tokenize,
)


def py_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * HASH_MULT + ord(ch)) % HASH_MOD
    return h


def py_tokenize(s: str, min_len: int = 2) -> list[str]:
    # re.ASCII: Java regex and DuckDB's RE2 both treat \W as ASCII-only,
    # so the engine contract is ASCII word characters; Python's default
    # unicode-aware \w would keep e.g. superscript digits as word chars
    return [
        t
        for t in re.split(r"\W+", s.lower(), flags=re.ASCII)
        if len(t) >= min_len
    ]


# printable-ish unicode without surrogates; DuckDB string_split and Spark
# split both operate on codepoints here
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0xFFFF),
    max_size=60,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_poly_hash_three_way(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], schema="s string")
    got = [r.h for r in df.select(char_poly_hash("s").alias("h")).collect()]
    want = [py_poly_hash(t) for t in texts]
    assert got == want
    con = duckdb.connect()
    for t, w in zip(texts, want):
        (dh,) = con.execute(
            f"SELECT {sql_char_poly_hash('?')}", [t]
        ).fetchone()
        assert dh == w, f"duckdb hash mismatch for {t!r}"


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_tokenize_matches_python_reference(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], schema="text string")
    got = [
        r.toks
        for r in df.select(F.array_join(tokenize("text"), "\x00").alias("toks"))
        .collect()
    ]
    want = ["\x00".join(py_tokenize(t)) for t in texts]
    assert got == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    )
)
def test_round_half_up_matches_duckdb(spark, values):
    df = spark.createDataFrame([(v,) for v in values], schema="v double")
    got = [r.r for r in df.select(round_half_up(F.col("v"), 4).alias("r")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {sql_round_half_up('?', 4)}", [v]).fetchone()[0]
        for v in values
    ]
    assert got == pytest.approx(want, abs=0.0)
