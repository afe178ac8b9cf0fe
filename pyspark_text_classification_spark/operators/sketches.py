"""Probabilistic sketches built from scratch as relational programs.

q26_approx_sketches exercises Spark's BUILT-IN sketch aggregates
(approx_count_distinct / approx_percentile), which have no cross-engine
twin and are therefore only rows-checked.  This module implements two
classic sketches (Cormode & Muthukrishnan's Count-Min, 2005; Flajolet et
al.'s HyperLogLog, 2007) directly as DataFrame programs whose every
intermediate is integer-exact, so the full sketch state AND the
estimates hash-match a DuckDB oracle — the sketches themselves become
verifiable operators instead of opaque aggregates.

Why this matters at 100 TB: both sketches are algebraic aggregates
(map-side combinable, mergeable across partitions) with O(1)-sized
state — the CMS table is depth x width cells, the HLL state is m
registers — so the full-corpus pass is one shuffle of bounded size no
matter the input scale, and sketches from different shards/days merge by
cell-wise sum (CMS) or register-wise max (HLL).

Determinism contract: item hashes are the repo's polynomial-rolling
family (functions/hashing.py) with the (a*h + b) mod p permutations
embedded as literals; CMS cells and HLL registers are pure int64; HLL's
2^-register harmonic sum is EXACT via left-shifts (Z_scaled =
sum(1 << (50 - rho)), rho <= 26 so every term is an integer); the only
floating-point op is the final single division by Z, whose numerator
alpha*m^2*2^50 is ONE Python-computed double literal shared by both
engines.  No engine-side transcendentals anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    HASH_MOD,
    char_poly_hash,
    sql_char_poly_hash,
    sql_token_shingle_hashes,
    token_shingle_hashes_sql,
)
from pyspark_text_classification_spark.functions.text import tokenize
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

# --- Count-Min sketch parameters -------------------------------------------
CMS_WIDTH = 512
CMS_DEPTH = 4
_rng = random.Random(20260814)
CMS_PARAMS: list[tuple[int, int, int]] = [
    (i, _rng.randrange(1, HASH_MOD), _rng.randrange(0, HASH_MOD))
    for i in range(CMS_DEPTH)
]
# heavy hitter = term carrying >= 1% of the token stream (scale-free)
CMS_HEAVY_PCT = 100

# --- HyperLogLog parameters -------------------------------------------------
HLL_P = 6                 # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.709         # alpha_64 (Flajolet et al. 2007, Fig. 3)
HLL_A, HLL_B = _rng.randrange(1, HASH_MOD), _rng.randrange(0, HASH_MOD)
# hashes are < 2^31; after dropping p bucket bits, w has 31 - p = 25
# significant bits, so rho = (25 - floor(log2(w))) + 1 = 26 - bitlen(w)
HLL_RHO_MAX = 32 - HLL_P  # 26
HLL_SHIFT = 50            # Z scaled by 2^50: max Z = m * 2^50 < 2^57
# the single double constant both engines divide by Z_scaled
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_SHIFT)

_SQL_TOKS = (
    r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"
)


def _cms_cell_sql(i: int) -> str:
    a, b = CMS_PARAMS[i][1], CMS_PARAMS[i][2]
    return f"(({a} * h + {b}) % {HASH_MOD}) % {CMS_WIDTH}"


@query(
    "sketch_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_SQL_TOKS}) AS term FROM documents
    ),
    tf AS (
      SELECT term, {sql_char_poly_hash('term')} AS h,
             CAST(count(*) AS BIGINT) AS cnt
      FROM toks GROUP BY 1
    ),
    tot AS (SELECT sum(cnt) AS total FROM tf),
    cells AS (
      {" UNION ALL ".join(
        f"SELECT {i} AS row_id, {_cms_cell_sql(i)} AS cell, cnt FROM tf"
        for i in range(CMS_DEPTH)
      )}
    ),
    sketch AS (
      SELECT row_id, cell, CAST(sum(cnt) AS BIGINT) AS cell_sum
      FROM cells GROUP BY 1, 2
    ),
    heavy AS (
      SELECT tf.term, tf.h, tf.cnt AS true_cnt
      FROM tf, tot WHERE tf.cnt * {CMS_HEAVY_PCT} >= tot.total
    ),
    probes AS (
      {" UNION ALL ".join(
        f"SELECT term, true_cnt, {i} AS row_id, "
        f"{_cms_cell_sql(i)} AS cell FROM heavy"
        for i in range(CMS_DEPTH)
      )}
    )
    SELECT p.term, p.true_cnt, min(s.cell_sum) AS est_cnt
    FROM probes p
    JOIN sketch s ON s.row_id = p.row_id AND s.cell = p.cell
    GROUP BY 1, 2
    """,
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch ({CMS_DEPTH} x {CMS_WIDTH}) over the token
    stream, probed for heavy hitters (terms carrying >= 1% of tokens),
    with the exact count as the audit column (CMS guarantees
    est_cnt >= true_cnt; the overestimate is the collision mass).

    CMS is LINEAR, so the sketch is built from the term-frequency table
    rather than the raw stream: cell(i, c) = sum of tf over terms
    hashing to c under row i's permutation — one term-grain aggregate
    (map-side combined over the corpus), then a {CMS_DEPTH * CMS_WIDTH}-
    cell regroup.  The heavy-candidate probe explodes each candidate to
    its {CMS_DEPTH} cells and joins the (tiny, broadcast) sketch, taking
    the min across rows.  At 100 TB the sketch size never grows; only
    the term-frequency aggregate scales."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(tokenize("text", 2)).alias("term"))
    tf = (
        toks.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", char_poly_hash("term"))
        .localCheckpoint(eager=True)  # feeds sketch, total, and probes
    )
    cells = None
    for i, a, b in CMS_PARAMS:
        part = tf.select(
            F.lit(i).alias("row_id"),
            (((a * F.col("h") + b) % HASH_MOD) % CMS_WIDTH).alias("cell"),
            "cnt",
        )
        cells = part if cells is None else cells.unionByName(part)
    sketch = cells.groupBy("row_id", "cell").agg(
        F.sum("cnt").alias("cell_sum")
    )
    tot = tf.agg(F.sum("cnt").alias("total"))
    heavy = (
        tf.crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") * CMS_HEAVY_PCT >= F.col("total"))
        .select("term", "h", F.col("cnt").alias("true_cnt"))
    )
    probes = None
    for i, a, b in CMS_PARAMS:
        part = heavy.select(
            "term",
            "true_cnt",
            F.lit(i).alias("row_id"),
            (((a * F.col("h") + b) % HASH_MOD) % CMS_WIDTH).alias("cell"),
        )
        probes = part if probes is None else probes.unionByName(part)
    return (
        probes.join(F.broadcast(sketch), ["row_id", "cell"])
        .groupBy("term", "true_cnt")
        .agg(F.min("cell_sum").alias("est_cnt"))
    )


_SQL_SHINGLES = f"""
      SELECT (({HLL_A} * sh + {HLL_B}) % {HASH_MOD}) AS hp
      FROM (
        SELECT unnest({sql_token_shingle_hashes('th', 2)}) AS sh
        FROM (
          SELECT list_transform({_SQL_TOKS},
                   t -> {sql_char_poly_hash('t')}) AS th
          FROM documents
        ) WHERE length(th) >= 1
      )
"""


@query(
    "sketch_hll_distinct",
    oracle=f"""
    WITH hp AS ({_SQL_SHINGLES}),
    regs AS (
      SELECT hp % {HLL_M} AS bucket,
             max(CASE WHEN hp // {HLL_M} = 0 THEN {HLL_RHO_MAX}
                 ELSE {HLL_RHO_MAX} - length(bin(hp // {HLL_M}))
                 END) AS rho
      FROM hp GROUP BY 1
    ),
    state AS (
      SELECT CAST(count(*) AS BIGINT) AS used,
             CAST(sum(CAST(1 AS BIGINT) << ({HLL_SHIFT} - rho))
                  AS BIGINT) AS z_used
      FROM regs
    ),
    truth AS (SELECT CAST(count(DISTINCT hp) AS BIGINT) AS true_distinct
              FROM hp)
    SELECT CAST({HLL_M} AS BIGINT) AS m, s.used,
           CAST(s.z_used + ({HLL_M} - s.used)
             * (CAST(1 AS BIGINT) << {HLL_SHIFT}) AS BIGINT) AS z_scaled,
           CAST(floor({HLL_NUMER!r} / CAST(s.z_used + ({HLL_M} - s.used)
             * (CAST(1 AS BIGINT) << {HLL_SHIFT}) AS DOUBLE)) AS BIGINT)
             AS est_distinct,
           t.true_distinct
    FROM state s, truth t
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog (m = {HLL_M} registers) distinct-count of the corpus's
    2-token shingles, with the exact distinct count as the audit column.

    Register update: bucket = h % m, rho = leading-zero count of the
    remaining bits + 1 (computed exactly via the binary-string length,
    identical on both engines) — one max-aggregate per bucket, the
    mergeable HLL state.  The harmonic sum is EXACT integer arithmetic
    (Z_scaled = sum over registers of 1 << (50 - rho), empty registers
    contributing 1 << 50), and the estimate is the raw HLL formula
    alpha * m^2 / Z as ONE double division by that integer — no
    small-range linear-counting correction, because that needs ln() at
    query time and the contract here is bit-identical cross-engine
    state + estimate, not estimator bias (the audit column carries the
    truth).  At 100 TB: one map-side-combined max-aggregate into {HLL_M}
    registers; shards merge by register-wise max."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(tokenize("text", 2).alias("toks")).filter(
        F.size("toks") >= 1
    )
    th_col = F.transform(F.col("toks"), lambda t: char_poly_hash(t))
    shingles = toks.select(th_col.alias("th")).select(
        F.explode(F.expr(token_shingle_hashes_sql("th", 2))).alias("sh")
    )
    hp = shingles.select(
        ((HLL_A * F.col("sh") + HLL_B) % HASH_MOD).alias("hp")
    )
    regs = (
        hp.select(
            (F.col("hp") % HLL_M).alias("bucket"),
            F.expr(
                f"CASE WHEN hp div {HLL_M} = 0 THEN {HLL_RHO_MAX} "
                f"ELSE {HLL_RHO_MAX} - length(bin(hp div {HLL_M})) END"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    state = regs.agg(
        F.count("*").alias("used"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - rho)")).alias(
            "z_used"
        ),
    )
    truth = hp.agg(F.count_distinct("hp").alias("true_distinct"))
    z_scaled = F.col("z_used") + (HLL_M - F.col("used")) * F.lit(
        1 << HLL_SHIFT
    ).cast("long")
    return (
        state.crossJoin(F.broadcast(truth))
        .select(
            F.lit(HLL_M).cast("long").alias("m"),
            "used",
            z_scaled.alias("z_scaled"),
            F.floor(F.lit(HLL_NUMER) / z_scaled.cast("double"))
            .cast("long")
            .alias("est_distinct"),
            "true_distinct",
        )
    )


# --- KMV (k-minimum-values) distinct / intersection sketch ------------------
# Bar-Yossef et al., "Counting distinct elements in a data stream"
# (RANDOM 2002); Beyer et al., "On synopses for distinct-value estimation
# under multiset operations" (SIGMOD 2007) for the union/Jaccard form.
KMV_K = 64
KMV_A = 1_203_248_327   # fixed permutation (a*u + b) mod p, literals shared
KMV_B = 730_482_109     # by both engines (drawn once, seed 20260815)
KMV_SET_A = "click"
KMV_SET_B = "purchase"
KMV_SALTS = 8  # level-1 fan-out of the two-level min-k (bounds reducer rows)

_SQL_KMV_UH = (
    f"((user_id % {HASH_MOD}) * {KMV_A} + {KMV_B}) % {HASH_MOD}"
)


@query(
    "sketch_kmv_intersection",
    oracle=f"""
    WITH sk AS (
      SELECT DISTINCT event_type AS t, {_SQL_KMV_UH} AS uh
      FROM events WHERE event_type IN ('{KMV_SET_A}', '{KMV_SET_B}')
    ),
    exact AS (
      SELECT event_type AS t,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events WHERE event_type IN ('{KMV_SET_A}', '{KMV_SET_B}')
      GROUP BY 1
    ),
    ranked AS (
      SELECT t, uh, row_number() OVER (PARTITION BY t ORDER BY uh) AS rn
      FROM sk
    ),
    kmv AS (SELECT t, uh, rn FROM ranked WHERE rn <= {KMV_K}),
    stats AS (
      SELECT s.t, c.n_h, e.n_exact,
             CASE WHEN c.n_h < {KMV_K} THEN c.n_h
                  ELSE {(KMV_K - 1) * HASH_MOD}
                       // max(CASE WHEN s.rn = {KMV_K} THEN s.uh END)
             END AS est
      FROM kmv s
      JOIN (SELECT t, CAST(count(*) AS BIGINT) AS n_h FROM sk GROUP BY 1) c
        ON c.t = s.t
      JOIN exact e ON e.t = s.t
      GROUP BY s.t, c.n_h, e.n_exact
    ),
    x AS (
      SELECT uh, row_number() OVER (ORDER BY uh) AS rn
      FROM (SELECT DISTINCT uh FROM kmv)
    ),
    xk AS (SELECT uh FROM x WHERE rn <= {KMV_K}),
    inter AS (
      SELECT CAST(count(*) AS BIGINT) AS inter_at_k
      FROM xk
      WHERE uh IN (SELECT uh FROM kmv WHERE t = '{KMV_SET_A}')
        AND uh IN (SELECT uh FROM kmv WHERE t = '{KMV_SET_B}')
    ),
    xn AS (SELECT CAST(count(*) AS BIGINT) AS union_k FROM xk)
    SELECT
      (SELECT n_exact FROM stats WHERE t = '{KMV_SET_A}') AS exact_a,
      (SELECT n_exact FROM stats WHERE t = '{KMV_SET_B}') AS exact_b,
      (SELECT CAST(est AS BIGINT) FROM stats WHERE t = '{KMV_SET_A}') AS est_a,
      (SELECT CAST(est AS BIGINT) FROM stats WHERE t = '{KMV_SET_B}') AS est_b,
      (SELECT union_k FROM xn) AS union_k,
      (SELECT inter_at_k FROM inter) AS inter_at_k,
      (SELECT inter_at_k FROM inter) * 1000000
        // (SELECT union_k FROM xn) AS jaccard_micro
    """,
)
def sketch_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch comparison of two behavioral populations ('{KMV_SET_A}'
    users vs '{KMV_SET_B}' users): per-set distinct estimates
    (k-1)*M/h_(k) plus the union-sketch Jaccard estimate
    |X ∩ A_k ∩ B_k| / |X| — the mergeable-synopsis way to answer
    "how much do two audiences overlap" without a distinct-join.

    Everything is integer-exact and oracle-checked: the permuted hash is
    the literal (a*u+b) mod p family, the k minima come from a TWO-LEVEL
    min-k (partial top-k per (set, salt) bucket, then final k over the
    SALTS*k survivors — never a full set through one reducer), and sets
    smaller than k fall back to their exact hash count (the KMV estimator
    is exact below k by construction).  At 100 TB each sketch is O(k)
    state mergeable across shards; the exact side-columns (a distinct
    aggregate) are there as ground truth for the accuracy contract."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(KMV_SET_A, KMV_SET_B))
        .select(F.col("event_type").alias("t"), "user_id")
    )
    exact = ev.groupBy("t").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    sk = ev.selectExpr("t", f"{_SQL_KMV_UH} AS uh").distinct()
    w1 = Window.partitionBy(
        "t", F.pmod(F.col("uh"), F.lit(KMV_SALTS))
    ).orderBy("uh")
    lvl1 = (
        sk.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= KMV_K)
        .drop("r1")
    )
    w2 = Window.partitionBy("t").orderBy("uh")
    kmv = (
        lvl1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KMV_K)
        .localCheckpoint(eager=True)  # feeds stats + union + 2 memberships
    )
    nh = sk.groupBy("t").agg(F.count("*").alias("n_h"))
    kth = kmv.filter(F.col("rn") == KMV_K).select(
        "t", F.col("uh").alias("kth")
    )
    stats = (
        nh.join(exact, "t")
        .join(kth, "t", "left")
        .select(
            "t",
            "n_exact",
            F.expr(
                f"CASE WHEN n_h < {KMV_K} THEN n_h "
                f"ELSE {(KMV_K - 1) * HASH_MOD} div kth END"
            ).alias("est"),
        )
    )
    wx = Window.partitionBy(F.lit(1)).orderBy("uh")  # <= 2k rows: bounded
    xk = (
        kmv.select("uh")
        .distinct()
        .withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= KMV_K)
        .select("uh")
    )
    in_a = kmv.filter(F.col("t") == KMV_SET_A).select("uh")
    in_b = kmv.filter(F.col("t") == KMV_SET_B).select("uh")
    inter = (
        xk.join(in_a, "uh", "left_semi")
        .join(in_b, "uh", "left_semi")
        .agg(F.count("*").alias("inter_at_k"))
    )
    xn = xk.agg(F.count("*").alias("union_k"))
    # Conditional global aggregate instead of filter+crossJoin: always
    # exactly 1 row with NULLs for an empty set, matching the oracle's
    # scalar subqueries (the crossJoin form yields 0 rows on empty side).
    wide = stats.agg(
        F.sum(F.when(F.col("t") == KMV_SET_A, F.col("n_exact"))).alias(
            "exact_a"
        ),
        F.sum(F.when(F.col("t") == KMV_SET_B, F.col("n_exact"))).alias(
            "exact_b"
        ),
        F.sum(F.when(F.col("t") == KMV_SET_A, F.col("est"))).alias("est_a"),
        F.sum(F.when(F.col("t") == KMV_SET_B, F.col("est"))).alias("est_b"),
    )
    return (
        wide.crossJoin(F.broadcast(xn))
        .crossJoin(F.broadcast(inter))
        .select(
            "exact_a",
            "exact_b",
            "est_a",
            "est_b",
            "union_k",
            "inter_at_k",
            F.expr("inter_at_k * 1000000 div union_k").alias("jaccard_micro"),
        )
    )


# --- AMS F2 sketch (Alon, Matias & Szegedy, STOC 1996) ----------------------
# Second frequency moment of the per-user event counts: F2 = sum f_u^2.
# R independent +-1 hash rows; each Z_r = sum f_u * s_r(u) and E[Z^2] = F2.
AMS_ROWS = 8
_ams_rng = random.Random(20260815)
AMS_PARAMS: list[tuple[int, int, int]] = [
    (r, _ams_rng.randrange(1, HASH_MOD), _ams_rng.randrange(0, HASH_MOD))
    for r in range(AMS_ROWS)
]


def _ams_sign_sql(a: int, b: int) -> str:
    # +-1 from the parity of the permuted user hash — literal params
    return f"(1 - 2 * ((({a} * (user_id % {HASH_MOD}) + {b})" \
           f" % {HASH_MOD}) % 2))"


@query(
    "sketch_ams_f2",
    oracle=f"""
    WITH f AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS f
      FROM events GROUP BY 1
    ),
    z AS (
      SELECT {', '.join(
          f'CAST(sum(f * {_ams_sign_sql(a, b)}) AS HUGEINT) AS z{r}'
          for r, a, b in AMS_PARAMS)},
             CAST(sum(CAST(f AS HUGEINT) * f) AS HUGEINT) AS exact_f2
      FROM f
    )
    SELECT CAST({AMS_ROWS} AS BIGINT) AS r_rows,
           CAST(({' + '.join(f'z{r} * z{r}' for r in range(AMS_ROWS))})
                // {AMS_ROWS} AS BIGINT) AS est_f2,
           CAST(exact_f2 AS BIGINT) AS exact_f2,
           CAST(abs(({' + '.join(f'z{r} * z{r}' for r in range(AMS_ROWS))})
                // {AMS_ROWS} - exact_f2) * 10000 // exact_f2 AS BIGINT)
             AS err_bp
    FROM z
    """,
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-frequency-moment sketch of the per-user event counts
    (F2 = sum of squared user activity — the self-join size / skew
    statistic a planner wants before hashing a key): {AMS_ROWS}
    independent +-1 rows with literal (a*h+b) mod p sign hashes, each
    Z_r accumulated in ONE integer aggregate, estimate = mean of Z_r^2,
    with the exact F2 as the audit column and the relative error in
    basis points.

    The sketch is a single map-side-combined aggregate over the
    (user, count) table — {AMS_ROWS} integer sums of bounded state, the
    textbook streamable/mergeable linear sketch (shards add their Z
    vectors).  Z_r^2 and F2 run in DECIMAL(38,0)/HUGEINT: Z is
    O(sqrt(F2)) in expectation but adversarially up to total row count,
    which breaks int64 squaring past ~3e9 rows."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("f"))
    aggs = [
        F.sum(F.expr(f"f * {_ams_sign_sql(a, b)}"))
        .cast("decimal(38,0)")
        .alias(f"z{r}")
        for r, a, b in AMS_PARAMS
    ] + [
        F.sum(F.expr("CAST(f AS DECIMAL(38,0)) * f")).alias("exact_f2")
    ]
    z = f.agg(*aggs)
    sq = " + ".join(f"z{r} * z{r}" for r in range(AMS_ROWS))
    return z.selectExpr(
        f"CAST({AMS_ROWS} AS BIGINT) AS r_rows",
        f"CAST(({sq}) div {AMS_ROWS} AS BIGINT) AS est_f2",
        "CAST(exact_f2 AS BIGINT) AS exact_f2",
        f"CAST(abs(({sq}) div {AMS_ROWS} - exact_f2) * 10000"
        " div exact_f2 AS BIGINT) AS err_bp",
    )


# --- HLL mergeability audit -------------------------------------------------
# Register-wise max of independently built per-shard states must equal the
# state built over all rows — the algebraic property that lets 100 TB of
# daily shards roll up to one cardinality estimate without rescanning.
HLLM_A, HLLM_B = _rng.randrange(1, HASH_MOD), _rng.randrange(0, HASH_MOD)
_SQL_HLLM_HASH = f"(({HLLM_A} * (user_id % {HASH_MOD}) + {HLLM_B}) % {HASH_MOD})"
_SQL_HLLM_RHO = (
    f"CASE WHEN hp // {HLL_M} = 0 THEN {HLL_RHO_MAX} "
    f"ELSE {HLL_RHO_MAX} - length(bin(hp // {HLL_M})) END"
)


@query(
    "sketch_hll_merge",
    oracle=f"""
    WITH hp AS (
      SELECT event_type, {_SQL_HLLM_HASH} AS hp FROM events
    ),
    parts AS (
      SELECT event_type, hp % {HLL_M} AS bucket,
             max({_SQL_HLLM_RHO}) AS rho
      FROM hp GROUP BY 1, 2
    ),
    merged AS (
      SELECT bucket, max(rho) AS rho FROM parts GROUP BY 1
    ),
    direct AS (
      SELECT hp % {HLL_M} AS bucket, max({_SQL_HLLM_RHO}) AS rho
      FROM hp GROUP BY 1
    ),
    mz AS (
      SELECT CAST(count(*) AS BIGINT) AS used,
             CAST(sum(CAST(1 AS BIGINT) << ({HLL_SHIFT} - rho)) AS BIGINT)
               AS z_used
      FROM merged
    ),
    dz AS (
      SELECT CAST(count(*) AS BIGINT) AS used,
             CAST(sum(CAST(1 AS BIGINT) << ({HLL_SHIFT} - rho)) AS BIGINT)
               AS z_used
      FROM direct
    ),
    diff AS (
      SELECT CAST(count(*) AS BIGINT) AS n_reg_diff
      FROM merged m FULL JOIN direct d USING (bucket)
      WHERE m.rho IS DISTINCT FROM d.rho
    ),
    np AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_parts
           FROM events)
    SELECT CAST({HLL_M} AS BIGINT) AS m, np.n_parts,
           CAST(floor({HLL_NUMER!r} / CAST(mz.z_used + ({HLL_M} - mz.used)
             * (CAST(1 AS BIGINT) << {HLL_SHIFT}) AS DOUBLE)) AS BIGINT)
             AS merged_est,
           CAST(floor({HLL_NUMER!r} / CAST(dz.z_used + ({HLL_M} - dz.used)
             * (CAST(1 AS BIGINT) << {HLL_SHIFT}) AS DOUBLE)) AS BIGINT)
             AS direct_est,
           diff.n_reg_diff
    FROM mz, dz, diff, np
    """,
)
def sketch_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability audit over distinct event users: build one
    {HLL_M}-register state PER event type independently, merge them by
    register-wise max, and compare against the state built over all
    rows — n_reg_diff MUST be 0 and the two estimates identical (the
    invariant this query hash-pins), because max is associative over
    any partition of the input.

    This is the operational sketch contract at 100 TB: shards/days
    build tiny states locally, a coordinator folds them with max, and
    nothing ever rescans.  Three bounded aggregates (per-part states are
    |parts| x m rows), a full outer self-comparison on the m-row
    states, and the module's exact shifted harmonic sum."""
    ev = load_table(spark, sf_dir, "events")
    hp = ev.select(
        "event_type", F.expr(_SQL_HLLM_HASH.replace("//", "div")).alias("hp")
    )
    rho = F.expr(_SQL_HLLM_RHO.replace("//", " div "))
    parts = (
        hp.select("event_type", (F.col("hp") % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    merged = parts.groupBy("bucket").agg(F.max("rho").alias("rho"))
    direct = (
        hp.select((F.col("hp") % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )
    def state(regs: DataFrame) -> DataFrame:
        return regs.agg(
            F.count("*").alias("used"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - rho)")
            ).alias("z_used"),
        )

    est = lambda: (  # noqa: E731 - tiny local formatter
        F.floor(
            F.lit(HLL_NUMER)
            / (
                F.col("z_used")
                + (HLL_M - F.col("used")) * F.lit(1 << HLL_SHIFT).cast("long")
            ).cast("double")
        ).cast("long")
    )
    diff = (
        merged.alias("m")
        .join(direct.alias("d"), "bucket", "full")
        .filter(~F.expr("m.rho <=> d.rho"))
        .agg(F.count("*").cast("long").alias("n_reg_diff"))
    )
    np_ = ev.agg(F.count_distinct("event_type").cast("long").alias("n_parts"))
    mz = state(merged).select(est().alias("merged_est"))
    dz = state(direct).select(est().alias("direct_est"))
    return (
        np_.crossJoin(F.broadcast(mz))
        .crossJoin(F.broadcast(dz))
        .crossJoin(F.broadcast(diff))
        .select(
            F.lit(HLL_M).cast("long").alias("m"),
            "n_parts",
            "merged_est",
            "direct_est",
            "n_reg_diff",
        )
    )


# --- Bloom filter with measured false-positive rate --------------------------
BLOOM_BITS = 1 << 15          # m = 32768 bits
BLOOM_WORDS = BLOOM_BITS // 32  # 32-bit words in BIGINT: shifts stay < 63 (DuckDB checks 1<<63)
BLOOM_K = 3                   # hash functions
BLOOM_PROBES = 5_000          # synthetic non-member probe universe
_brng = random.Random(20260815)
BLOOM_PARAMS: list[tuple[int, int]] = [
    (_brng.randrange(1, HASH_MOD), _brng.randrange(0, HASH_MOD))
    for _ in range(BLOOM_K)
]


def _bloom_pos_sql(j: int) -> str:
    a, b = BLOOM_PARAMS[j]
    return f"(({a} * h + {b}) % {HASH_MOD}) % {BLOOM_BITS}"


# In-row bigram keys over a token array column named ts.  The CASE guard
# (not greatest()) matters: Spark's sequence(1, 0) is the DESCENDING
# [1, 0] (step defaults to -1), which would index ts[-1] — an ANSI error
# on any doc under 2 tokens — while the oracle's range(1, len) is simply
# empty.  Unit-asserted on 0/1/2/3-token docs in test_operators_unit.
BIGRAM_KEYS_SQL = (
    "CASE WHEN size(ts) >= 2 THEN"
    " transform(sequence(1, size(ts) - 1),"
    " i -> concat(ts[i - 1], ' ', ts[i]))"
    " ELSE array() END"
)


@query(
    "sketch_bloom_fpp",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS ts FROM documents WHERE lang = 'en'
    ),
    members AS (
      SELECT DISTINCT unnest(list_transform(range(1, length(ts)),
        i -> ts[i] || ' ' || ts[i + 1])) AS key
      FROM toks
    ),
    mh AS (SELECT key, {sql_char_poly_hash('key')} AS h FROM members),
    mbits AS (
      {" UNION ALL ".join(
          f"SELECT {_bloom_pos_sql(j)} AS pos FROM mh"
          for j in range(BLOOM_K)
      )}
    ),
    sketch AS (
      SELECT pos // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS wval
      FROM mbits GROUP BY 1
    ),
    probes AS (
      SELECT 'pk_' || CAST(i AS VARCHAR) AS key
      FROM (SELECT unnest(range({BLOOM_PROBES})) AS i) ri
    ),
    neg AS (
      SELECT p.key, {sql_char_poly_hash('p.key')} AS h
      FROM probes p WHERE p.key NOT IN (SELECT key FROM members)
    ),
    pbits AS (
      {" UNION ALL ".join(
          f"SELECT key, {_bloom_pos_sql(j)} AS pos FROM neg"
          for j in range(BLOOM_K)
      )}
    ),
    hits AS (
      SELECT p.key,
             CASE WHEN s.wval IS NOT NULL
                   AND (s.wval & (CAST(1 AS BIGINT)
                                  << CAST(p.pos % 32 AS INT))) <> 0
                  THEN 1 ELSE 0 END AS hit
      FROM pbits p LEFT JOIN sketch s ON s.word = p.pos // 32
    ),
    fp AS (
      SELECT CAST(count(*) AS BIGINT) AS n_false_pos
      FROM (SELECT key FROM hits GROUP BY key
            HAVING sum(hit) = {BLOOM_K}) fq
    )
    SELECT
      (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
      (SELECT CAST(count(*) AS BIGINT) FROM neg) AS n_neg,
      (SELECT n_false_pos FROM fp) AS n_false_pos,
      (SELECT CAST(sum(bit_count(wval)) AS BIGINT) FROM sketch)
        AS n_bits_set,
      (SELECT n_false_pos FROM fp) * 1000000
        // (SELECT count(*) FROM neg) AS fpp_micro
    """,
)
def sketch_bloom_fpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (Bloom, CACM 1970) built as a relational program —
    m = {BLOOM_BITS} bits as {BLOOM_WORDS} int64 words via a bit_or
    aggregate, k = {BLOOM_K} poly-hash functions — with its
    false-positive rate MEASURED: insert the English bigram vocabulary
    (the corpus shares its unigram vocab across languages, so bigrams
    are the smallest key space with real structure), probe a
    deterministic {BLOOM_PROBES}-key universe disjoint from the member
    set (anti-join enforced, not assumed), and count probes whose
    {BLOOM_K} bits all land on set positions.  dedup_bloom_filter uses
    Spark's opaque built-in; here the sketch STATE itself is
    oracle-verified and the empirical FPP becomes a tracked number.

    Everything is integer bit arithmetic: positions from embedded
    (a*h + b) mod p permutations, words OR-combined (bit_or is
    algebraic — map-side combinable and mergeable across shards, the
    property that keeps a Bloom side-filter one broadcast no matter
    the corpus size), probes checked with AND masks, popcounts on
    identical two's-complement words.  The filter is {BLOOM_WORDS}
    longs regardless of input scale; the member scan is one
    map-side-combined distinct over in-row generated shingles."""
    docs = fan_out(
        load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    )
    ts = tokenize("text", 2)
    members = (
        docs.select(ts.alias("ts"))
        .select(
            F.explode(F.expr(BIGRAM_KEYS_SQL)).alias("key")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    mh = members.select("key", char_poly_hash("key").alias("h"))
    pos_exprs = [F.expr(_bloom_pos_sql(j)) for j in range(BLOOM_K)]
    mbits = mh.select(F.explode(F.array(*pos_exprs)).alias("pos"))
    sketch = (
        mbits.groupBy(F.expr("pos div 32").alias("word"))
        .agg(
            F.expr(
                "bit_or(shiftleft(CAST(1 AS BIGINT),"
                " CAST(pos % 32 AS INT)))"
            ).alias("wval")
        )
        .localCheckpoint(eager=True)
    )
    probes = spark.range(BLOOM_PROBES).select(
        F.concat(F.lit("pk_"), F.col("id").cast("string")).alias("key")
    )
    neg = probes.join(members, "key", "left_anti").select(
        "key", char_poly_hash("key").alias("h")
    )
    pbits = neg.select("key", F.explode(F.array(*pos_exprs)).alias("pos"))
    hits = pbits.join(
        F.broadcast(sketch), F.expr("pos div 32") == F.col("word"), "left"
    ).select(
        "key",
        F.expr(
            "CASE WHEN wval IS NOT NULL AND (wval &"
            " shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))) <> 0"
            " THEN 1 ELSE 0 END"
        ).alias("hit"),
    )
    fp = (
        hits.groupBy("key")
        .agg(F.sum("hit").alias("nh"))
        .filter(F.col("nh") == BLOOM_K)
        .agg(F.count("*").alias("n_false_pos"))
    )
    n_members = members.agg(F.count("*").alias("n_members"))
    n_neg_df = neg.agg(F.count("*").alias("n_neg"))
    n_bits = sketch.agg(F.sum(F.bit_count("wval")).alias("n_bits_set"))
    out = (
        n_members.crossJoin(F.broadcast(n_neg_df))
        .crossJoin(F.broadcast(fp))
        .crossJoin(F.broadcast(n_bits))
        .selectExpr(
            "CAST(n_members AS BIGINT) AS n_members",
            "CAST(n_neg AS BIGINT) AS n_neg",
            "CAST(n_false_pos AS BIGINT) AS n_false_pos",
            "CAST(n_bits_set AS BIGINT) AS n_bits_set",
            "CAST(n_false_pos * 1000000 div n_neg AS BIGINT) AS fpp_micro",
        )
    )
    out = out.localCheckpoint(eager=True)
    for c in (members, sketch):
        c.unpersist()
    return out
