"""Distributed, exactly-reproducible model metrics on the engine.

Two metric operators the reference computes driver-side with sklearn
(reference: model_evaluation in the GLUE scripts) re-expressed as
distributed relational programs with integer-exact cross-engine twins:

- ``ml_auc_rank``: exact ROC-AUC via the Mann-Whitney U statistic —
  concordant / tied pair counts from per-score-value positive/negative
  histograms.  The scale trap in rank-based AUC is the global sort; this
  implementation never ranks rows.  It aggregates to the DISTINCT-SCORE
  grain first (bounded by score resolution, here the 2^20 quantizer),
  then computes the strictly-below negative prefix with a two-level
  bucketed prefix sum: a bounded window over ~64 fixed-width score
  buckets plus a per-bucket window — the same range-partitioned prefix
  pattern as pipeline_global_rank, no single-reducer sort of the data.

- ``ml_linreg_normal_eq``: closed-form simple linear regression from
  sufficient statistics (n, Σx, Σy, Σxx, Σxy) — ONE map-side-combined
  aggregate over the fact table, then a driverless 1-row solve.  The
  cross products n·Σxy and Σx·Σy overflow int64 at bench scale, so the
  solve runs in DECIMAL(38,0) (exact integer arithmetic both engines).

Determinism: scores quantize floats to integers before any comparison
(floor(v * 2^20), the similarity-module quantizer); every division is
integer ``div``, which truncates toward zero in BOTH Spark and DuckDB
(verified: -7 div 2 = -3 = -7 // 2), so no float ever crosses engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import load_table

AUC_QUANT = 1 << 20  # score quantizer (matches similarity.QUANT_SCALE)
AUC_SHIFT = 1 << 20  # unit-norm components are in [-1, 1]: shift >= 0
AUC_BUCKET_W = 1 << 15  # ~64 prefix buckets over the shifted score range
AUC_POS_MAX_LABEL = 4  # labels 0-4 are the positive class (balanced)


@query(
    "ml_auc_rank",
    oracle=f"""
    WITH s AS (
      SELECT CAST(floor(CAST(embedding[1] AS DOUBLE) * {AUC_QUANT})
                  AS BIGINT) + {AUC_SHIFT} AS q,
             CASE WHEN label <= {AUC_POS_MAX_LABEL} THEN 1 ELSE 0 END AS pos
      FROM embeddings
    ),
    g AS (
      SELECT q,
             CAST(sum(pos) AS BIGINT) AS npos,
             CAST(sum(1 - pos) AS BIGINT) AS nneg
      FROM s GROUP BY 1
    ),
    c AS (
      SELECT npos, nneg,
             COALESCE(sum(nneg) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED
                      PRECEDING AND 1 PRECEDING), 0) AS cumneg
      FROM g
    ),
    t AS (
      SELECT sum(npos) AS np, sum(nneg) AS nn,
             sum(CAST(npos AS HUGEINT) * cumneg) AS conc,
             sum(CAST(npos AS HUGEINT) * nneg) AS tied
      FROM c
    )
    SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
           CAST(conc AS BIGINT) AS concordant,
           CAST(tied AS BIGINT) AS tied,
           CAST((2 * conc + tied) * 500000 // (np * nn) AS BIGINT)
             AS auc_micro
    FROM t
    """,
)
def ml_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the first embedding component as a score for the
    label<={AUC_POS_MAX_LABEL} class, via Mann-Whitney pair counting:
    AUC = (concordant + ties/2) / (n_pos * n_neg), reported in integer
    micro-units ((2C + T) * 500000 div (P*N)).

    Plan: one aggregate to the distinct-quantized-score grain, then the
    strictly-below negative count as bucket-prefix + in-bucket prefix
    (both windows bounded: ~64 buckets, and per-bucket partitions), then
    one global conditional aggregate.  No global row sort anywhere —
    at 100 TB this is the difference between AUC-in-one-shuffle and a
    single-reducer rank."""
    e = load_table(spark, sf_dir, "embeddings")
    s = e.select(
        (
            F.floor(F.col("embedding")[0].cast("double") * AUC_QUANT).cast(
                "long"
            )
            + AUC_SHIFT
        ).alias("q"),
        F.when(F.col("label") <= AUC_POS_MAX_LABEL, 1).otherwise(0).alias(
            "pos"
        ),
    )
    g = s.groupBy("q").agg(
        F.sum("pos").alias("npos"),
        F.sum(1 - F.col("pos")).alias("nneg"),
    ).withColumn("bucket", F.expr(f"q div {AUC_BUCKET_W}"))
    # negatives in strictly-lower BUCKETS (window over ~64 bucket rows)
    b = g.groupBy("bucket").agg(F.sum("nneg").alias("bneg"))
    w_b = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    pre = b.select(
        "bucket", F.coalesce(F.sum("bneg").over(w_b), F.lit(0)).alias("pre_neg")
    )
    # negatives in strictly-lower scores WITHIN the bucket (partitioned)
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("q")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = (
        g.join(F.broadcast(pre), "bucket")
        .withColumn(
            "cumneg",
            F.col("pre_neg")
            + F.coalesce(F.sum("nneg").over(w_in), F.lit(0)),
        )
    )
    # Exact accumulation: the per-row products npos*cumneg fit int64
    # comfortably only at small scale — cumneg grows to n_neg, so cast
    # each factor to DECIMAL(19,0) first (product -> DECIMAL(38,0)) and
    # accumulate the sums in DECIMAL(38,0), mirroring DuckDB's HUGEINT
    # promotion.  Headroom: at 1e14 rows np*nn ~ 2.5e27 and the numerator
    # (2C+T)*5e5 ~ 2.5e33 — both far inside DECIMAL(38,0)'s 1e38 bound,
    # so the mul-div below stays exact at any realistic scale.
    d19 = "decimal(19,0)"
    t = c.agg(
        F.sum(F.col("npos").cast("decimal(38,0)")).alias("np"),
        F.sum(F.col("nneg").cast("decimal(38,0)")).alias("nn"),
        F.sum(F.col("npos").cast(d19) * F.col("cumneg").cast(d19)).alias(
            "conc"
        ),
        F.sum(F.col("npos").cast(d19) * F.col("nneg").cast(d19)).alias(
            "tied"
        ),
    )
    return t.selectExpr(
        "CAST(np AS BIGINT) AS n_pos",
        "CAST(nn AS BIGINT) AS n_neg",
        "CAST(conc AS BIGINT) AS concordant",
        "CAST(tied AS BIGINT) AS tied",
        "CAST((2 * conc + tied) * 500000 div (np * nn) AS BIGINT)"
        " AS auc_micro",
    )


@query(
    "ml_linreg_normal_eq",
    oracle="""
    WITH pts AS (
      SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(x * y) AS HUGEINT) AS sxy
      FROM pts
    ),
    solve AS (
      SELECT n, sx, sy,
             (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
               AS slope_micro
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(slope_micro AS BIGINT) AS slope_micro,
           CAST((sy * 1000000 - slope_micro * sx) // n AS BIGINT)
             AS intercept_micro
    FROM solve
    """,
)
def ml_linreg_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple linear regression (extended price in cents vs quantity)
    solved in closed form from sufficient statistics — the normal
    equations for one feature: slope = (nΣxy - ΣxΣy)/(nΣxx - (Σx)²).

    The whole fit is ONE map-side-combined aggregate over the fact table
    (5 integer sums) and a 1-row solve; no iteration, no driver math, no
    collect.  The cross terms exceed int64 at scale, so the solve runs
    in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact integers, and
    integer ``div`` truncates identically in both engines, so slope and
    intercept (micro-cent units) are bit-reproducible."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    # Per-row products fit int64 (x ~ 50, y ~ 1e8 -> x*y ~ 5e9), but the
    # ACCUMULATION overflows int64 near 1.8e10 rows — so cast each
    # product/term to DECIMAL(38,0) before F.sum, making the aggregation
    # itself exact (DuckDB's sum already returns HUGEINT natively).
    s = pts.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    solve = s.selectExpr(
        "n",
        "sx",
        "sy",
        "(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)"
        " AS slope_micro",
    )
    return solve.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(slope_micro AS BIGINT) AS slope_micro",
        "CAST((sy * 1000000 - slope_micro * sx) div n AS BIGINT)"
        " AS intercept_micro",
    )


# --- Gini impurity feature ranking -------------------------------------------
GINI_CHARS_BUCKET = 256
GINI_WORDS_BUCKET = 32


@query(
    "ml_gini_feature_rank",
    oracle=f"""
    WITH base AS (
      SELECT lang,
             source AS f_source,
             CAST(n_chars // {GINI_CHARS_BUCKET} AS VARCHAR) AS f_chars,
             CAST((length(text) - length(replace(text, ' ', '')))
                  // {GINI_WORDS_BUCKET} AS VARCHAR) AS f_words
      FROM documents
    ),
    lf AS (
      SELECT 'source' AS feature, f_source AS val, lang FROM base
      UNION ALL SELECT 'chars_bucket', f_chars, lang FROM base
      UNION ALL SELECT 'words_bucket', f_words, lang FROM base
    ),
    vc AS (
      SELECT feature, val, lang, CAST(count(*) AS HUGEINT) AS n_vc
      FROM lf GROUP BY 1, 2, 3
    ),
    v AS (
      SELECT feature, val, sum(n_vc) AS n_v, sum(n_vc * n_vc) AS ss
      FROM vc GROUP BY 1, 2
    ),
    tot AS (SELECT feature, sum(n_v) AS n FROM v GROUP BY 1),
    pc AS (SELECT feature, lang, sum(n_vc) AS n_c FROM vc GROUP BY 1, 2),
    par AS (
      SELECT pc.feature,
             (t.n * t.n - sum(pc.n_c * pc.n_c)) * 1000000 // (t.n * t.n)
               AS parent_gini_micro
      FROM pc JOIN tot t ON t.feature = pc.feature
      GROUP BY pc.feature, t.n
    ),
    wg AS (
      SELECT v.feature, CAST(count(*) AS BIGINT) AS n_values,
             sum((v.n_v * v.n_v - v.ss) * 1000000 // (v.n_v * t.n))
               AS wgini_micro
      FROM v JOIN tot t ON t.feature = v.feature
      GROUP BY 1
    )
    SELECT w.feature, w.n_values,
           CAST(w.wgini_micro AS BIGINT) AS wgini_micro,
           CAST(p.parent_gini_micro AS BIGINT) AS parent_gini_micro,
           CAST(p.parent_gini_micro - w.wgini_micro AS BIGINT)
             AS reduction_micro
    FROM wg w JOIN par p ON p.feature = w.feature
    """,
)
def ml_gini_feature_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CART-style Gini impurity reduction (Breiman et al. 1984) of three
    candidate document features against the language label — the
    decision-tree split criterion beside ml_chi2_feature_select's
    chi-square and ml_decision_stump's single split: weighted child
    impurity sum_v (n_v^2 - sum_c n_vc^2)/(n_v * n) vs the parent's
    (n^2 - sum_c n_c^2)/n^2, both in integer micro-units.

    Every term is a count or a product of counts accumulated in
    DECIMAL(38,0) / HUGEINT (n_vc^2 reaches ~1e26 at 1e13 rows — far
    past int64), and each per-value division is a positive integer
    mul-div performed identically in both engines, so the ranking is
    bit-reproducible.  Scale shape: ONE pass builds the long-form
    (feature, value, label) counts (a stack + map-side-combined
    aggregate at the bounded feature-value x label grain); everything
    downstream operates on that dimension-sized table."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "lang",
        F.col("source").alias("f_source"),
        F.expr(f"CAST(n_chars div {GINI_CHARS_BUCKET} AS STRING)").alias(
            "f_chars"
        ),
        F.expr(
            "CAST((length(text) - length(replace(text, ' ', '')))"
            f" div {GINI_WORDS_BUCKET} AS STRING)"
        ).alias("f_words"),
    )
    lf = base.select(
        "lang",
        F.expr(
            "stack(3, 'source', f_source, 'chars_bucket', f_chars,"
            " 'words_bucket', f_words) AS (feature, val)"
        ),
    )
    d38 = "decimal(38,0)"
    vc = lf.groupBy("feature", "val", "lang").agg(
        F.count("*").cast(d38).alias("n_vc")
    )
    v = vc.groupBy("feature", "val").agg(
        F.sum("n_vc").alias("n_v"),
        F.sum(F.col("n_vc") * F.col("n_vc")).alias("ss"),
    )
    tot = v.groupBy("feature").agg(F.sum("n_v").alias("n"))
    pc = vc.groupBy("feature", "lang").agg(F.sum("n_vc").alias("n_c"))
    par = (
        pc.join(F.broadcast(tot), "feature")
        .groupBy("feature", "n")
        .agg(F.sum(F.col("n_c") * F.col("n_c")).alias("ssc"))
        .selectExpr(
            "feature",
            "(n * n - ssc) * 1000000 div (n * n) AS parent_gini_micro",
        )
    )
    wg = (
        v.join(F.broadcast(tot), "feature")
        .select(
            "feature",
            F.expr(
                "(n_v * n_v - ss) * 1000000 div (n_v * n)"
            ).alias("contrib"),
        )
        .groupBy("feature")
        .agg(
            F.count("*").alias("n_values"),
            F.sum("contrib").alias("wgini_micro"),
        )
    )
    return wg.join(par, "feature").selectExpr(
        "feature",
        "CAST(n_values AS BIGINT) AS n_values",
        "CAST(wgini_micro AS BIGINT) AS wgini_micro",
        "CAST(parent_gini_micro AS BIGINT) AS parent_gini_micro",
        "CAST(parent_gini_micro - wgini_micro AS BIGINT)"
        " AS reduction_micro",
    )


# --- Matthews correlation coefficient ------------------------------------------
MCC_CHARS_THRESHOLD = 1000  # stand-in predictor: n_chars >= this => 'en'


@query(
    "ml_mcc_eval",
    oracle=f"""
    WITH conf AS (
      SELECT
        CAST(sum(CASE WHEN pred = 1 AND act = 1 THEN 1 ELSE 0 END)
             AS HUGEINT) AS tp,
        CAST(sum(CASE WHEN pred = 1 AND act = 0 THEN 1 ELSE 0 END)
             AS HUGEINT) AS fp,
        CAST(sum(CASE WHEN pred = 0 AND act = 0 THEN 1 ELSE 0 END)
             AS HUGEINT) AS tn,
        CAST(sum(CASE WHEN pred = 0 AND act = 1 THEN 1 ELSE 0 END)
             AS HUGEINT) AS fn
      FROM (
        SELECT CASE WHEN n_chars >= {MCC_CHARS_THRESHOLD} THEN 1 ELSE 0
               END AS pred,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS act
        FROM documents
      ) px
    ),
    m AS (
      SELECT tp, fp, tn, fn,
             tp * tn - fp * fn AS num,
             (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) AS den
      FROM conf
    )
    SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(tn AS BIGINT) AS tn, CAST(fn AS BIGINT) AS fn,
           CAST(CASE WHEN den = 0 THEN 0
                     WHEN num < 0 THEN -((num * num * 1000000) // den)
                     ELSE (num * num * 1000000) // den
                END AS BIGINT) AS mcc2_signed_micro
    FROM m
    """,
)
def ml_mcc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation coefficient (Matthews 1975) of a binary
    classifier against the is-English label, reported sqrt-free as
    sign * MCC^2 in micro-units (the events_autocorr_lag convention):
    MCC^2 = (tp*tn - fp*fn)^2 / ((tp+fp)(tp+fn)(tn+fp)(tn+fn)), exact
    integers end to end — the chance-robust single-number evaluation
    that accuracy isn't on imbalanced corpora (ml_eval_confusion and
    the NB confusions report raw cells; this is the derived scalar).

    The predictor here is the fixed length-threshold stand-in
    (n_chars >= {MCC_CHARS_THRESHOLD}); any boolean prediction column
    drops in.  One map-side-combined aggregate builds the confusion
    (4 conditional sums, no shuffle beyond the 1-row combine), and the
    den product (~n^4) runs in DECIMAL(38,0)/HUGEINT — int64 would wrap
    at ~55k rows, DECIMAL holds to ~1e9 rows per evaluation shard
    (shard the eval and merge cells first at larger n)."""
    docs = load_table(spark, sf_dir, "documents")
    d38 = "decimal(38,0)"
    px = docs.select(
        F.expr(
            f"CASE WHEN n_chars >= {MCC_CHARS_THRESHOLD} THEN 1 ELSE 0 END"
        ).alias("pred"),
        F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("act"),
    )
    conf = px.agg(
        F.sum(F.expr("CASE WHEN pred = 1 AND act = 1 THEN 1 ELSE 0 END"))
        .cast(d38)
        .alias("tp"),
        F.sum(F.expr("CASE WHEN pred = 1 AND act = 0 THEN 1 ELSE 0 END"))
        .cast(d38)
        .alias("fp"),
        F.sum(F.expr("CASE WHEN pred = 0 AND act = 0 THEN 1 ELSE 0 END"))
        .cast(d38)
        .alias("tn"),
        F.sum(F.expr("CASE WHEN pred = 0 AND act = 1 THEN 1 ELSE 0 END"))
        .cast(d38)
        .alias("fn"),
    )
    m = conf.selectExpr(
        "tp",
        "fp",
        "tn",
        "fn",
        "tp * tn - fp * fn AS num",
        "(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn) AS den",
    )
    return m.selectExpr(
        "CAST(tp AS BIGINT) AS tp",
        "CAST(fp AS BIGINT) AS fp",
        "CAST(tn AS BIGINT) AS tn",
        "CAST(fn AS BIGINT) AS fn",
        "CAST(CASE WHEN den = 0 THEN 0"
        " WHEN num < 0 THEN -((num * num * 1000000) div den)"
        " ELSE (num * num * 1000000) div den END AS BIGINT)"
        " AS mcc2_signed_micro",
    )
