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
from hypothesis import HealthCheck, given, settings, strategies as st

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
        for r in df.select(
            F.array_join(tokenize("text", 2), "\x00").alias("toks")
        ).collect()
    ]
    want = ["\x00".join(py_tokenize(t, min_len=2)) for t in texts]
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


def py_token_shingles(texts: str, k: int = 2) -> list[int]:
    from pyspark_text_classification_spark.functions.hashing import SHINGLE_MULT

    th = [py_poly_hash(t) for t in py_tokenize(texts)]
    def fold(hs):
        acc = 0
        for h in hs:
            acc = (acc * SHINGLE_MULT + h) % HASH_MOD
        return acc
    if len(th) < k:
        return sorted({fold(th)})
    return sorted({fold(th[i:i + k]) for i in range(len(th) - k + 1)})


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=20), st.sampled_from([2, 3]))
def test_token_shingle_hashes_three_way(spark, texts, k):
    """The token-hash shingle family (Spark expression, DuckDB twin, and a
    pure-Python reference) must agree on arbitrary text — this is the
    primitive every dedup oracle rests on."""
    from pyspark_text_classification_spark.functions.hashing import (
        sql_token_shingle_hashes,
        token_shingle_hashes_sql,
    )
    from pyspark_text_classification_spark.functions.text import (
        TOKEN_PATTERN,  # noqa: F401  (documents the shared pattern)
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    spark_toks = r"filter(split(lower(text), '\\W+'), t -> length(t) >= 2)"
    th = (
        f"transform({spark_toks}, "
        "t -> aggregate(transform(filter(split(t, ''), ch -> ch != ''), "
        f"ch -> ascii(ch)), CAST(0 AS BIGINT), "
        f"(acc, code) -> (acc * {HASH_MULT} + code) % {HASH_MOD}))"
    )
    got = {
        r.doc_id: sorted(set(r.hs))
        for r in df.selectExpr(
            "doc_id", f"{token_shingle_hashes_sql(th, k)} AS hs"
        ).collect()
    }
    want = {i: py_token_shingles(t, k) for i, t in rows}
    assert got == want

    con = duckdb.connect()
    duck_toks = r"list_filter(str_split_regex(lower(t.text), '\W+'), x -> length(x) >= 2)"
    duck_th = f"list_transform({duck_toks}, x -> {sql_char_poly_hash('x')})"
    for i, t in rows:
        (hs,) = con.execute(
            f"SELECT {sql_token_shingle_hashes(duck_th, k)} "
            "FROM (SELECT ? AS text) t", [t]
        ).fetchone()
        assert sorted(set(hs)) == want[i], f"duckdb shingles mismatch for {t!r}"


# ---------------------------------------------------------------------------
# Pure-arithmetic properties (no engine needed — the formulas ARE the spec)
# ---------------------------------------------------------------------------


def _py_interleave(u: int, h: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((u >> i) & 1) << (2 * i)
        z |= ((h >> i) & 1) << (2 * i + 1)
    return z


@given(
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=200, deadline=None)
def test_zorder_terms_equal_bit_interleave(u, h):
    """The div/mod z-value formula (portable across engines without bitwise
    operators) must equal the classic bit-interleave — and be invertible,
    so file ranges in z-space map back to rectangles in (dim1, dim2)."""
    from pyspark_text_classification_spark.operators.pipeline import (
        ZORDER_BITS,
        _z_terms,
    )

    got = eval(  # the generated expression IS python-evaluable with // as div
        _z_terms(str(u), str(h), "//")
    )
    assert got == _py_interleave(u, h, ZORDER_BITS)
    # invertibility: decode back
    du = sum(((got >> (2 * i)) & 1) << i for i in range(ZORDER_BITS))
    dh = sum(((got >> (2 * i + 1)) & 1) << i for i in range(ZORDER_BITS))
    assert (du, dh) == (u, h)


@given(
    st.lists(
        st.floats(
            min_value=-100.0, max_value=100.0,
            allow_nan=False, allow_infinity=False,
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=200, deadline=None)
def test_int8_quantization_error_bound(v):
    """Symmetric int8 quantization must satisfy the per-component error
    bound |x - q*scale| <= scale/2 (floor(x/s + 0.5) rounds to the nearest
    representable level), hence L2 error <= scale/2 * sqrt(dims)."""
    import math

    mx = max(abs(x) for x in v)
    # operator semantics: guard on the scale (mx/127 can underflow to 0.0
    # for subnormal maxima — then everything quantizes to 0)
    s = mx / 127
    scale = s if s > 0 else 1.0
    q = [math.floor(x / scale + 0.5) if s > 0 else 0 for x in v]
    assert all(abs(c) <= 127 for c in q)
    err = math.sqrt(sum((x - c * scale) ** 2 for x, c in zip(v, q)))
    assert err <= scale / 2 * math.sqrt(len(v)) + 1e-12


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**9),
            st.integers(min_value=1, max_value=10**9),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_quantized_ln_three_way(spark, pairs):
    """The micro-nat ln quantization (text_lm_logprob, text_zipf_fit,
    similarity_kmeans_step's mean discipline all rest on it) must agree
    between Spark, DuckDB, and Python on arbitrary (cnt <= total) pairs:
    floor(ln(cnt/total) * 1e6 + 0.5) — identical libm-double inputs, one
    exact scale-and-floor."""
    import math

    pairs = [(min(c, t), t) for c, t in pairs]
    df = spark.createDataFrame(pairs, schema="cnt long, total long")
    got = [
        r.q
        for r in df.select(
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
                * 1_000_000
                + 0.5
            )
            .cast("long")
            .alias("q")
        ).collect()
    ]
    want = [math.floor(math.log(c / t) * 1_000_000 + 0.5) for c, t in pairs]
    assert got == want
    con = duckdb.connect()
    for (c, t), w in zip(pairs, want):
        (dq,) = con.execute(
            "SELECT CAST(floor(ln(CAST(? AS DOUBLE) / CAST(? AS DOUBLE)) "
            "* 1000000.0 + 0.5) AS BIGINT)",
            [c, t],
        ).fetchone()
        assert dq == w, f"duckdb ln-quant mismatch for {c}/{t}"


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=2**40), TEXT),
        min_size=1,
        max_size=30,
    )
)
def test_xor_row_checksum_three_way(spark, rows):
    """The migration checksum's Horner row hash + XOR aggregate must agree
    between Spark, DuckDB, and a pure-Python fold on arbitrary rows."""
    from functools import reduce

    from pyspark_text_classification_spark.operators.pipeline import (
        _CK_MOD,
        _CK_MULT,
    )

    want_rows = [
        (doc_id * _CK_MULT + py_poly_hash(t)) % _CK_MOD for doc_id, t in rows
    ]
    want = reduce(lambda a, b: a ^ b, want_rows)

    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    h = (F.col("doc_id") * _CK_MULT + char_poly_hash("text")) % _CK_MOD
    got = df.select(h.alias("h")).agg(F.expr("bit_xor(h)")).first()[0]
    assert got == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    (dh,) = con.execute(
        f"SELECT bit_xor((doc_id * {_CK_MULT} + {sql_char_poly_hash('text')})"
        f" % {_CK_MOD}) FROM t"
    ).fetchone()
    assert dh == want


@settings(max_examples=4, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(17, 40))
def test_pq_assignment_is_true_argmin(spark, seed, n):
    """pq_assign's LEAST-over-integer-key argmin must equal a brute-force
    Python argmin under the identical float32 -> double -> floor(x * 2^20)
    quantization, with ties to the lowest code_id."""
    import math

    import numpy as np

    from pyspark_text_classification_spark.operators.pq import (
        PQ_K,
        PQ_M,
        PQ_SUB,
        pq_assign,
        pq_codebook,
    )
    from pyspark_text_classification_spark.operators.similarity import (
        QUANT_SCALE,
    )

    rng = np.random.RandomState(seed)
    vecs = (rng.uniform(-2.0, 2.0, size=(n, 64))).astype(np.float32)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = F.transform(
        F.transform("embedding", lambda x: x.cast("double")),
        lambda x: F.floor(x * QUANT_SCALE).cast("long"),
    )
    e = df.select("vec_id", qv.alias("qv"))
    got = {
        (r.vec_id, r.m): (r.code, r.d2)
        for r in pq_assign(e, pq_codebook(e)).collect()
    }

    q = [[math.floor(x * QUANT_SCALE) for x in v] for _, v in rows]
    # pq_codebook's modulo-spread rule: every (n div K)-th vec_id
    step = max(1, len(q) // PQ_K)
    seeds = [q[i] for i in range(0, len(q), step)][:PQ_K]
    for i, v in enumerate(q):
        for m in range(PQ_M):
            lo, hi = m * PQ_SUB, (m + 1) * PQ_SUB
            best = min(
                (
                    sum((v[d] - c[d]) ** 2 for d in range(lo, hi)),
                    code_id,
                )
                for code_id, c in enumerate(seeds)
            )
            assert got[(i, m)] == (best[1], best[0]), (i, m)


@settings(max_examples=3, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-(2**40), 2**40),  # component sums incl. negatives
            st.integers(1, 10_000),        # cluster sizes
        ),
        min_size=1,
        max_size=50,
    )
)
def test_floored_integer_mean_three_way(spark, pairs):
    """The positive-modulus floored mean ``(s - ((s % n) + n) % n) div n``
    (pq_codebook_refined's centroid update) must equal Python's floor
    division in BOTH engines — Spark's ``div`` truncates toward zero and
    DuckDB's ``//`` floors, so the identity is what makes the trained
    codebook bit-identical across engines for NEGATIVE sums."""
    rows = [(i, s, n) for i, (s, n) in enumerate(pairs)]
    want = [s // n for _, s, n in rows]

    df = spark.createDataFrame(rows, "id long, s long, n long")
    got_spark = [
        r.fm
        for r in df.select(
            "id", F.expr("(s - ((s % n) + n) % n) div n").alias("fm")
        )
        .orderBy("id")
        .collect()
    ]
    assert got_spark == want

    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, s BIGINT, n BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT (s - ((s % n) + n) % n) // n FROM t ORDER BY id"
        ).fetchall()
    ]
    assert got_duck == want


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                min_codepoint=32, max_codepoint=0x2FF
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rowwise_minhash_bands_equal_batch_path(spark, texts):
    """The streaming admission gate computes minhash band signatures
    IN-ROW (array_min folds over the in-row shingle set) while the batch
    index computes them as hash aggregates over the exploded shingle
    stream. The two paths must agree on ARBITRARY text, or the
    stream-static band join silently loses candidates."""
    from pyspark_text_classification_spark.operators.dedup import (
        minhash_band_signatures,
        shingle_hashes,
    )
    from pyspark_text_classification_spark.streaming.ingest import (
        _rowwise_bands_sql,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    batch = {
        (r.doc_id, r.band): r.sig
        for r in minhash_band_signatures(shingle_hashes(docs, 2)).collect()
    }
    from pyspark_text_classification_spark.functions.hashing import (
        MINHASH_PERMS,
    )

    sh_set, bands = _rowwise_bands_sql()
    mins = ", ".join(
        f"array_min(transform(sh, h -> ({a}L * h + {b}L) % {HASH_MOD}L))"
        for _p, a, b in MINHASH_PERMS
    )
    rowwise = {
        (r.doc_id, r.band): r.sig
        for r in docs.selectExpr("doc_id", f"{sh_set} AS sh")
        .selectExpr("doc_id", "sh", f"array({mins}) AS mins")
        .selectExpr("doc_id", f"{bands} AS bandsigs")
        .selectExpr("doc_id", "posexplode(bandsigs) AS (band, sig)")
        .collect()
    }
    assert rowwise == batch


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_pareto_bucketed_prefix_equals_brute_force(spark, pts):
    """The skyline's bucketed-prefix-max plan must equal the NOT EXISTS
    definition on ARBITRARY (price, size) point sets — including price
    ties, duplicate points, and single-bucket degenerate ranges."""
    from pyspark.sql import Window

    from pyspark_text_classification_spark.operators.skyline import (
        SKY_BUCKET_W,
    )

    rows = [(i, p, s) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "p_partkey LONG, price_c LONG, size LONG"
    ).withColumn("bucket", F.expr(f"price_c div {SKY_BUCKET_W}"))
    b = df.groupBy("bucket").agg(F.max("size").alias("bmax"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    pre = b.select(
        "bucket", F.coalesce(F.max("bmax").over(w_b), F.lit(-1)).alias("pre_max")
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    got = {
        (r.p_partkey, r.price_c, r.size)
        for r in (
            df.join(F.broadcast(pre), "bucket")
            .withColumn(
                "dom_max",
                F.greatest(
                    F.col("pre_max"),
                    F.coalesce(F.max("size").over(w_in), F.lit(-1)),
                ),
            )
            .filter(F.col("size") >= F.col("dom_max"))
            .select("p_partkey", "price_c", "size")
            .collect()
        )
    }
    brute = {
        (i, p, s)
        for i, p, s in rows
        if not any(q < p and t > s for _, q, t in rows)
    }
    assert got == brute


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),              # user
            st.sampled_from(["view", "click", "purchase", "error"]),
            st.integers(0, 1_000),          # ts (µs)
        ),
        min_size=1,
        max_size=50,
    )
)
def test_funnel_counts_match_reference_and_are_monotone(spark, evs):
    """events_funnel_steps' sequenced per-user min logic vs a pure-Python
    reference on arbitrary event soups (duplicate timestamps, missing
    steps, out-of-order users); funnel counts must also be monotone
    n1 >= n2 >= n3 by construction."""
    rows = [
        (i, u, t, ts) for i, (u, t, ts) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, ts_us LONG"
    )
    s1 = (
        df.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    s2 = (
        df.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts_us") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"))
    )
    s3 = (
        df.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts_us") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t3"))
    )
    n1, n2, n3 = s1.count(), s2.count(), s3.count()

    # pure-Python reference
    import collections

    by_user = collections.defaultdict(list)
    for _, u, t, ts in rows:
        by_user[u].append((t, ts))
    r1 = r2 = r3 = 0
    for u, es in by_user.items():
        views = [ts for t, ts in es if t == "view"]
        if not views:
            continue
        r1 += 1
        t1 = min(views)
        clicks = [ts for t, ts in es if t == "click" and ts >= t1]
        if not clicks:
            continue
        r2 += 1
        t2 = min(clicks)
        purchases = [ts for t, ts in es if t == "purchase" and ts >= t2]
        if purchases:
            r3 += 1
    assert (n1, n2, n3) == (r1, r2, r3)
    assert n1 >= n2 >= n3


def _lev(a: str, b: str) -> int:
    """Pure-Python Levenshtein (unit costs) — the reference recurrence."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@given(
    a=st.text(alphabet="abcde ", min_size=6, max_size=14),
    b=st.text(alphabet="abcde ", min_size=6, max_size=14),
)
@settings(max_examples=300, deadline=None)
def test_qgram_blocking_lossless_within_edit_distance(a, b):
    """The dedup_fuzzy_names blocking guarantee (Gravano et al. VLDB
    2001): any pair with levenshtein <= 2 and length >= 6 shares at
    least one 2-gram, so the gram equi-join loses no in-distance pair."""
    from pyspark_text_classification_spark.operators.dedup import (
        FUZZY_MAX_DIST,
        FUZZY_Q,
    )

    if _lev(a, b) > FUZZY_MAX_DIST:
        return
    grams = lambda s: {  # noqa: E731
        s[i : i + FUZZY_Q] for i in range(len(s) - FUZZY_Q + 1)
    }
    assert grams(a) & grams(b), (a, b)


@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="abc xyz", min_size=0, max_size=12),
            st.text(alphabet="abc xyz", min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_levenshtein_three_way(spark, pairs):
    """Spark's levenshtein == DuckDB's == the reference DP on arbitrary
    strings — the verify step of the fuzzy join is engine-stable."""
    py = [_lev(a, b) for a, b in pairs]
    sdf = spark.createDataFrame(pairs, "a STRING, b STRING")
    got_spark = [
        r.d
        for r in sdf.select(
            F.levenshtein("a", "b").alias("d")
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in pairs
    ]
    assert got_spark == py and got_duck == py


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000_000_000),  # doc_id (incl. sfbig offsets)
            st.integers(1, 500),             # tokens
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 3_000),                   # budget
)
def test_token_budget_two_level_prefix_equals_global_cumsum(spark, rows, budget):
    """pipeline_token_budget_sample's two-level prefix sum (bucket offsets
    + partitioned in-bucket cumsum) must equal the single global
    cumulative sum it replaces, on ARBITRARY id spaces and budgets —
    including ids past 2^31 (where the mod wraps and h can collide) and
    budgets that land exactly on a document boundary."""
    from pyspark_text_classification_spark.operators.pipeline import (
        BUDGET_MOD,
        BUDGET_MULT,
        two_level_budget_prefix,
        with_budget_keys,
    )

    t = with_budget_keys(spark.createDataFrame(rows, "doc_id LONG, tokens LONG"))
    got = {
        (r.doc_id, r.cum_tokens)
        for r in two_level_budget_prefix(t, budget).collect()
    }
    # brute force: one global cumulative sum over the (h, doc_id) order
    def h_of(doc_id: int) -> int:
        return ((doc_id % BUDGET_MOD) * BUDGET_MULT) % BUDGET_MOD

    cum, brute = 0, set()
    for doc_id, tokens in sorted(rows, key=lambda t: (h_of(t[0]), t[0])):
        cum += tokens
        if cum <= budget:
            brute.add((doc_id, cum))
    assert got == brute


def _trunc_div(a: int, b: int) -> int:
    """C-style integer division truncating toward zero — the semantics
    Spark's `div` and DuckDB's `//` share on integers (Python's // floors,
    which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(st.integers(0, 1_000), min_size=2, max_size=25),  # daily y
)
def test_theil_sen_lower_median_matches_reference_and_shift_invariant(
    spark, ys
):
    """events_theil_sen's windowed lower-median must equal the Python
    reference (sort all pairwise truncated slopes by (slope, da, db),
    take element (m+1) div 2) on ARBITRARY daily series, and adding a
    constant to every y must leave the slope unchanged (the estimator is
    shift-invariant by construction — slopes depend only on differences)."""
    from pyspark_text_classification_spark.operators.timeseries import (
        SEN_SCALE,
        sen_median_slopes,
    )

    def spark_sen(series):
        rows = [("t", d, y) for d, y in enumerate(series)]
        ds = spark.createDataFrame(rows, "event_type STRING, d LONG, y LONG")
        out = sen_median_slopes(ds).collect()
        assert len(out) == 1
        return out[0].slope_micro

    def py_sen(series):
        slopes = sorted(
            (_trunc_div((yj - yi) * SEN_SCALE, dj - di), di, dj)
            for di, yi in enumerate(series)
            for dj, yj in enumerate(series)
            if dj > di
        )
        return slopes[(len(slopes) + 1) // 2 - 1][0]

    base = spark_sen(ys)
    assert base == py_sen(ys)
    assert spark_sen([y + 137 for y in ys]) == base  # shift invariance


@given(
    st.one_of(
        st.integers(min_value=0, max_value=1 << 52),
        # adversarial band: k^2 +/- 1 near perfect squares, where a
        # double sqrt is most likely to round across the floor boundary
        st.integers(min_value=1, max_value=1 << 26).flatmap(
            lambda k: st.sampled_from(
                [k * k - 1, k * k, k * k + 1]
            )
        ),
    )
)
@settings(max_examples=300, deadline=None)
def test_auto_sizing_isqrt_matches_duckdb_floor_sqrt(n):
    """The shared coarse-sizing contract every *_auto operator rests on:
    Python's exact math.isqrt and DuckDB's floor(sqrt(double)) agree for
    every count below 2^52 — including the k^2-1 band where sqrt(k^2-1)
    sits within half an ulp of k (the divergence starts only at k >
    2^26, i.e. counts >= 2^52, far above any row count the engine will
    meet).  Checks the full derivation chain: cells = max(16,
    floor(sqrt(n))) and both nprobe rules, exactly as sql_auto_cells_cte
    / sql_auto_nprobe compute them."""
    import math

    from pyspark_text_classification_spark.operators.similarity import (
        IVF_AUTO_MIN_CELLS,
        IVF_AUTO_NPROBE_MIN,
        IVF_AUTO_NPROBE_MULT,
        IVFPQ_AUTO_NPROBE_MIN,
        IVFPQ_AUTO_NPROBE_MULT,
        auto_nprobe,
    )

    con = duckdb.connect()
    cells_py = max(IVF_AUTO_MIN_CELLS, math.isqrt(n))
    row = con.execute(
        f"""
        WITH cc AS (
          SELECT GREATEST({IVF_AUTO_MIN_CELLS},
                          CAST(floor(sqrt({n})) AS BIGINT)) AS c
        )
        SELECT c,
               GREATEST({IVF_AUTO_NPROBE_MIN}, {IVF_AUTO_NPROBE_MULT} *
                 CAST(floor(sqrt((SELECT c FROM cc))) AS BIGINT)),
               GREATEST({IVFPQ_AUTO_NPROBE_MIN}, {IVFPQ_AUTO_NPROBE_MULT} *
                 CAST(floor(sqrt((SELECT c FROM cc))) AS BIGINT))
        FROM cc
        """
    ).fetchone()
    assert row[0] == cells_py, (n, row)
    assert row[1] == auto_nprobe(cells_py), (n, row)
    assert row[2] == auto_nprobe(
        cells_py, IVFPQ_AUTO_NPROBE_MULT, IVFPQ_AUTO_NPROBE_MIN
    ), (n, row)


@given(st.integers(min_value=0, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_feed_stride_ceil_div_matches_duckdb(n):
    """The replay fixtures' stride rule — k = max(1, ceil(n/FEED_MAX)) —
    must agree between Python's negative-floor-div ceil and the oracle's
    (n + FEED_MAX - 1) // FEED_MAX integer form for ANY count, and the
    sampled-row bound must hold: a dense id range keeps ceil(n/k) rows,
    which stays within FEED_MAX + its own stride rounding."""
    import duckdb

    import pyspark_text_classification_spark.all_queries  # noqa: F401
    from pyspark_text_classification_spark.streaming.latedrop import (
        LATEDROP_FEED_MAX,
    )

    k_py = max(1, -(-n // LATEDROP_FEED_MAX))
    k_sql = duckdb.connect().execute(
        f"SELECT GREATEST(1, ({n} + {LATEDROP_FEED_MAX} - 1) "
        f"// {LATEDROP_FEED_MAX})"
    ).fetchone()[0]
    assert k_py == k_sql, (n, k_py, k_sql)
    # boundedness on a dense id range [0, n): kept = ceil(n / k)
    kept = -(-n // k_py) if n else 0
    assert kept <= LATEDROP_FEED_MAX + (1 if n > LATEDROP_FEED_MAX else 0), (
        n, k_py, kept,
    )


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # sparse/offset ids
            st.lists(
                st.floats(
                    min_value=-1.0,
                    max_value=1.0,
                    allow_nan=False,
                    allow_infinity=False,
                    width=32,
                ),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=5,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_two_level_ann_matches_oracle_on_arbitrary_corpora(
    spark, tmp_path_factory, rows
):
    """The round-9 two-level Lloyd-refined serving query must agree with
    its registered DuckDB oracle on ARBITRARY small corpora, not just the
    synthetic tables: random float32 vectors (duplicates allowed — they
    exercise the identical-centroid/forced-self-map ties), sparse
    non-dense ids (the lowest-ids-PRESENT seed rule), and corpus sizes
    straddling the IVF_AUTO_MIN_CELLS floor.  This is the full chain —
    count -> seeds -> stride sample -> Lloyd means -> supers -> two-level
    members -> batch probes -> candidate cosines -> rounded top-k —
    hash-compared end to end."""
    import duckdb as ddb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import ORACLES, QUERIES

    # a zero vector has nrm 0 -> NaN cosines (excluded corpus-wide, the
    # module-level contract) — force |v[0]| >= 0.5 so no vector can be
    # all-zero (a plain +0.5 nudge recreated zero at v[0] == -0.5)
    fixed = [
        (i, [v[0] + 0.5 if v[0] >= 0 else v[0] - 0.5] + v[1:])
        for i, v in rows
    ]
    d = tmp_path_factory.mktemp("prop_ann")
    tbl = pa.Table.from_pandas(
        pd.DataFrame(
            {
                "vec_id": [i for i, _ in fixed],
                "embedding": [v for _, v in fixed],
                "label": [i % 3 for i, _ in fixed],
            }
        ),
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int64()),
            ]
        ),
    )
    pq.write_table(tbl, str(d / "embeddings.parquet"))

    got = sorted(
        (r.vec_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in QUERIES["similarity_ann_ivf_auto"](spark, str(d)).collect()
    )
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    want = sorted(
        (int(v), int(n), float(c), int(rk))
        for v, n, c, rk in con.execute(
            ORACLES["similarity_ann_ivf_auto"]
        ).fetchall()
    )
    assert got == want, (
        f"two-level ANN diverged on a {len(fixed)}-row corpus:\n"
        f"spark-only={set(got) - set(want)}\n"
        f"oracle-only={set(want) - set(got)}"
    )


def test_two_level_zero_norm_refined_centroid_falls_back_to_seed(
    spark, tmp_path_factory
):
    """ADVICE r9: a cell whose sampled members' quantized per-dim means
    all round to 0 used to produce an ALL-ZERO refined centroid —
    cnrm=0, NaN (0/0) cosines, and a cross-engine fork (the in-row
    strict-'>' folds skip NaN, window/ORDER BY sort it first).  This
    corpus forces exactly that cell: seed 1 is outside the Lloyd stride
    sample, and the only two sampled vectors routing to it are
    near-opposed (tiny +dim1 component each, +-1 on a non-seed axis),
    so their quantized mean is the zero vector.  The guard must fall
    back to the seed vector in BOTH engines, pinned two ways: the
    refined centroid table keeps seed 1 verbatim with a nonzero norm,
    and the full registered serving query still hash-matches its
    DuckDB oracle on this corpus."""
    import math

    import duckdb as ddb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import ORACLES, QUERIES
    from pyspark_text_classification_spark.operators.similarity import (
        IVF_AUTO_MIN_CELLS,
        lloyd_stride,
        refined_centroids,
        with_norms,
    )

    n_rows, dims, delta = 600, 26, 4e-05
    cells = max(IVF_AUTO_MIN_CELLS, math.isqrt(n_rows))  # 24
    stride = lloyd_stride(n_rows, cells)
    assert stride > 1 and 1 % stride != 0  # seed 1 outside the sample
    special = [i for i in range(cells, n_rows) if i % stride == 0][:2]
    assert len(special) == 2

    def vec(i):
        v = [0.0] * dims
        v[i] = 1.0
        return v

    def opposed(sign):
        v = [0.0] * dims
        v[1] = delta          # argmax-routes to seed 1 (cos > 0, rest 0)
        v[dims - 1] = sign    # cancels pairwise on a non-seed axis
        return v

    rows = []
    for i in range(n_rows):
        if i < cells:
            rows.append((i, vec(i)))
        elif i == special[0]:
            rows.append((i, opposed(1.0)))
        elif i == special[1]:
            rows.append((i, opposed(-1.0)))
        else:
            rows.append((i, vec(2)))
    d = tmp_path_factory.mktemp("zero_norm_cell")
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": [i for i, _ in rows],
                    "embedding": [v for _, v in rows],
                    "label": [i % 3 for i, _ in rows],
                }
            ),
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int64()),
                ]
            ),
        ),
        str(d / "embeddings.parquet"),
    )

    # --- the guard fires: seed 1's cell refines to zero, keeps the seed
    e = with_norms(spark.read.parquet(str(d / "embeddings.parquet")))
    ref = {
        r.cent_id: (r.cv, r.cnrm)
        for r in refined_centroids(e, n_rows, cells).collect()
    }
    assert ref[1][0] == vec(1), ref[1]
    assert ref[1][1] == 1.0, ref[1]
    assert all(c[1] > 0 for c in ref.values())

    # --- and the registered query still matches its oracle end to end
    got = sorted(
        (r.vec_id, r.neighbor_id, r.cos_sim, r.rank)
        for r in QUERIES["similarity_ann_ivf_auto"](spark, str(d)).collect()
    )
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    want = sorted(
        (int(v), int(n), float(c), int(rk))
        for v, n, c, rk in con.execute(
            ORACLES["similarity_ann_ivf_auto"]
        ).fetchall()
    )
    assert got == want, (
        f"zero-norm-guard corpus diverged:\n"
        f"spark-only={set(got) - set(want)}\n"
        f"oracle-only={set(want) - set(got)}"
    )


@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # sparse/offset ids
            st.lists(
                st.floats(
                    min_value=-1.0,
                    max_value=1.0,
                    allow_nan=False,
                    allow_infinity=False,
                    width=32,
                ),
                min_size=4,
                max_size=4,
            ),
        ),
        min_size=5,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_ivf_delete_balance_matches_oracle_on_arbitrary_corpora(
    spark, tmp_path_factory, rows
):
    """The round-10 delete balance must agree with its oracle on
    ARBITRARY small corpora: sparse non-dense ids exercise the
    tombstone rule over offset id spaces (vec_id % 10 == 4 keeps or
    misses entire replicas depending on the offset), duplicates-free
    random vectors exercise arbitrary cell layouts, and corpora where
    NO id is tombstoned must still produce the full per-cell balance
    with n_deleted = 0 everywhere.  Full chain: two-level layout ->
    served members -> tombstone flag join -> per-cell arithmetic +
    compaction trigger, hash-compared end to end."""
    import duckdb as ddb
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_text_classification_spark.all_queries import ORACLES, QUERIES
    from pyspark_text_classification_spark.plans.shared import (
        clear_shared_intermediates,
    )

    fixed = [
        (i, [v[0] + 0.5 if v[0] >= 0 else v[0] - 0.5] + v[1:])
        for i, v in rows
    ]
    d = tmp_path_factory.mktemp("prop_del")
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": [i for i, _ in fixed],
                    "embedding": [v for _, v in fixed],
                    "label": [i % 3 for i, _ in fixed],
                }
            ),
            schema=pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("embedding", pa.list_(pa.float32())),
                    ("label", pa.int64()),
                ]
            ),
        ),
        str(d / "embeddings.parquet"),
    )
    # the layout slots are keyed by sf_dir, but hypothesis reuses tmp
    # paths across examples within a run on some platforms — clear to
    # be safe (values are deterministic either way)
    clear_shared_intermediates()

    got = sorted(
        (r.cell_id, r.n_members, r.n_deleted, r.n_remaining,
         r.needs_compaction)
        for r in QUERIES["similarity_ivf_delete"](spark, str(d)).collect()
    )
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    want = sorted(
        tuple(int(x) for x in row)
        for row in con.execute(ORACLES["similarity_ivf_delete"]).fetchall()
    )
    assert got == want, (
        f"delete balance diverged on a {len(fixed)}-row corpus:\n"
        f"spark-only={set(got) - set(want)}\n"
        f"oracle-only={set(want) - set(got)}"
    )
    # invariant: members conserved regardless of the layout
    assert sum(r[1] for r in got) == len(fixed)
