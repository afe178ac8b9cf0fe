"""Declared queries for the ML surface (SURVEY.md §2.7-2.8).

Deterministic pieces get full DuckDB oracles — including the mapInPandas
inference path, whose stub model is the same polynomial hash the SQL twin
computes, so the Arrow batch plumbing itself is value-verified. Iterative
estimators (LR fit) are declared rows-only and covered by metric-tolerance
tests instead (SURVEY §5 / §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    HASH_MOD,
    char_poly_hash,
    sql_char_poly_hash,
)
from pyspark_text_classification_spark.functions.text import (
    sql_round_half_up,
    tokenize,
)
from pyspark_text_classification_spark.ml.evaluate import (
    binary_metrics,
    confusion_matrix_df,
    top_k_coefficients,
)
from pyspark_text_classification_spark.ml.inference import batch_infer
from pyspark_text_classification_spark.ml.pipelines import fit_text_classifier
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table


def _labeled_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with a binary target: is the lang column 'en'."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "text", (F.col("lang") == "en").cast("double").alias("label")
    )


@query(
    "ml_eval_confusion",
    oracle="""
    SELECT CAST(lang = 'en' AS DOUBLE) AS label,
           CAST(length(text) > 250 AS DOUBLE) AS prediction,
           CAST(count(*) AS BIGINT) AS cnt
    FROM documents
    GROUP BY 1, 2
    """,
)
def ml_eval_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3-M5 evaluation surface with a deterministic rule classifier
    (prediction = length(text) > 250), so the confusion-matrix aggregate
    (qnli_test.py:183 pattern) is oracle-checkable end to end."""
    docs = load_table(spark, sf_dir, "documents")
    preds = docs.select(
        (F.col("lang") == "en").cast("double").alias("label"),
        (F.length("text") > 250).cast("double").alias("prediction"),
    )
    return confusion_matrix_df(preds)


@query(
    "ml_infer_batch",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {sql_char_poly_hash("substr(text, 1, 256)")} AS hh
      FROM documents
    )
    SELECT doc_id,
           CAST(hh % 2 AS INTEGER) AS predicted_label,
           0.5 + (hh % 1000) / 2000.0 AS confidence
    FROM h
    """,
)
def ml_infer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4/U6 batched inference via mapInPandas + per-worker model singleton.

    The stub model computes the engine's polynomial hash over the first 256
    chars, which the oracle recomputes in SQL — value-verifying the Arrow
    exchange, the schema contract, and the carried-through ``confidence``
    (reference defect #1 fixed; SURVEY §2.8)."""
    docs = load_table(spark, sf_dir, "documents")
    return batch_infer(docs, text_col="text", id_col="doc_id")


@query("ml_tfidf_lr_metrics")
def ml_tfidf_lr_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1/M2/M3/M4 end to end: the sst2 recipe (tokenize -> stopwords ->
    CountVectorizer -> IDF -> LR(maxIter=10)) trained on documents with
    label = (lang = 'en'), evaluated distributed. Rows-only check by
    design (the iterative L-BFGS fit is not oracle-hashable); the audit
    bound lives in tests/test_ml.py::test_sst2_recipe_learns_signal —
    the identical recipe on a deterministic 120-row lexical-signal
    fixture (no RNG: rows are index-constructed) must reach
    accuracy >= 0.95 AND auc >= 0.95, so a broken featurize/fit/metric
    stage fails the suite even though this query's values can't hash."""
    labeled = _labeled_documents(spark, sf_dir)
    model = fit_text_classifier(labeled, recipe="sst2")
    preds = model.transform(labeled)
    m = binary_metrics(preds)
    return spark.createDataFrame(
        [(m["accuracy"], m["f1"], m["auc"])],
        schema="accuracy DOUBLE, f1 DOUBLE, auc DOUBLE",
    )


@query("ml_topk_coefficients")
def ml_topk_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 distributed top-k LR coefficients with vocab terms (replaces the
    driver-side np.argsort at sst2_test2.py:148-161). Rows-only check by
    design (values depend on the fitted model); the audit bound lives in
    tests/test_ml.py::test_topk_coefficients_shape — exactly 2k rows, the
    positive-direction coefficients strictly sorted descending and the
    negative ones ascending, so ordering/sign/limit defects fail the
    suite even though the coefficient values can't hash."""
    labeled = _labeled_documents(spark, sf_dir)
    model = fit_text_classifier(labeled, recipe="sst2")
    vocab = model.stages[2].vocabulary
    return top_k_coefficients(spark, model.stages[-1], vocab, k=20)


_SQL_TOKENS = r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"
HASH_TF_BUCKETS = 2**16  # the reference's HashingTF numFeatures (qqp_test.py:76-80)


@query(
    "ml_hash_tf_buckets",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
    SELECT doc_id,
           CAST({sql_char_poly_hash('token')} % {HASH_TF_BUCKETS} AS INTEGER)
             AS bucket,
           CAST(count(*) AS BIGINT) AS tf
    FROM toks
    GROUP BY 1, 2
    """,
)
def ml_hash_tf_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 feature hashing, made oracle-checkable: MLlib's HashingTF uses
    JVM Murmur3 (never cross-engine hashable), so the engine exposes the
    same bucketed-term-frequency semantics over the deterministic
    polynomial hash — (doc, bucket, tf) sparse vector entries. One explode
    + one hash aggregate; identical shuffle shape to HashingTF's fit-free
    transform at any scale."""
    from pyspark_text_classification_spark.functions.hashing import (
        char_poly_hash,
    )
    from pyspark_text_classification_spark.functions.text import tokenize

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokenize("text", 2)).alias("token"))
    return toks.groupBy(
        "doc_id",
        (char_poly_hash("token") % HASH_TF_BUCKETS).cast("int").alias("bucket"),
    ).agg(F.count("*").alias("tf"))


@query(
    "ml_tfidf_matrix",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    total AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token,
           CAST(tf.tf AS BIGINT) AS tf,
           {sql_round_half_up(
               'tf.tf * CAST(floor(ln((n_docs + 1.0) / (dfreq.df + 1.0))'
               ' * 1000000.0 + 0.5) AS BIGINT) / 1000000.0', 6)}
             AS tfidf
    FROM tf JOIN dfreq ON tf.token = dfreq.token, total
    WHERE dfreq.df >= 5
    """,
)
def ml_tfidf_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TF-IDF doc-term matrix (T3+T5 applied, sparse COO form): term
    frequency per (doc, token) joined to the broadcast IDF vocabulary
    (df >= minDocFreq). The big tf side never shuffles for the join —
    vocabulary is bounded, so it broadcasts at any corpus size; only the
    two upstream aggregates shuffle.

    Determinism: the IDF weight is quantized to integer MICRO-NATS
    (floor(ln(ratio)*1e6 + 0.5)) before the tf multiply — ln() is not
    bit-identical across JVM and libm, and an unquantized last-ulp
    difference at a half-up rounding boundary could flip the 6-decimal
    tfidf (and hence text_keywords_topk's top-k membership). After
    quantization everything is exact integer math plus one IEEE division,
    identical on both engines (the text_lm_logprob pattern)."""
    from pyspark_text_classification_spark.functions.text import (
        round_half_up,
        tokenize,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokenize("text", 2)).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = (
        toks.groupBy("token")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= 5)
    )
    total = docs.agg(F.count("*").alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(
            F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("idf_unat"),
    )
    return tf.join(F.broadcast(idf), "token").select(
        "doc_id",
        "token",
        F.col("tf").cast("long").alias("tf"),
        round_half_up(
            F.col("tf") * F.col("idf_unat") / F.lit(1_000_000.0), 6
        ).alias("tfidf"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash doc embeddings (feature-hashing the embedding way)
# ---------------------------------------------------------------------------

EMB_DIMS = 8
_E_A = 1_103_515_245
_E_C = 12_345
_E_M = 2_147_483_648  # 2^31
_E_HALF = 1_073_741_824  # 2^30


def _tok_comp(th: str, d: int) -> str:
    """Component d of a token's pseudo-embedding, in [-1, 1): an LCG draw
    seeded by (token_hash, dim). ``th`` < 2^31 and the seed is reduced
    mod 2^31 BEFORE the multiply, so everything stays inside int64 —
    identical integer math on both engines, then one exact division by
    2^30 (a power of two: only the exponent changes)."""
    return (
        f"((((({th}) * {EMB_DIMS} + {d}) % {_E_M}) * {_E_A} + {_E_C})"
        f" % {_E_M} - {_E_HALF}) / {float(_E_HALF)}"
    )


@query(
    "ml_doc_embedding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(
               list_filter(str_split_regex(lower(text), '\\W+'),
                           t -> length(t) >= 2),
               t -> {sql_char_poly_hash('t')}) AS th
      FROM documents
    ),
    m AS (
      SELECT doc_id, CAST(length(th) AS BIGINT) AS n_tokens,
             {', '.join(
                 f"list_reduce(list_prepend(0.0, list_transform(th, "
                 f"h -> {_tok_comp('h', d)})), (acc, x) -> acc + x)"
                 f" / greatest(length(th), 1) AS e{d}"
                 for d in range(EMB_DIMS)
             )}
      FROM t
    )
    SELECT doc_id, n_tokens,
           {', '.join(
               sql_round_half_up(f'e{d}', 6) + f' AS e{d}'
               for d in range(4)
           )},
           {sql_round_half_up(
               'sqrt(' + ' + '.join(f'e{d} * e{d}' for d in range(EMB_DIMS)) + ')',
               6)} AS nrm
    FROM m
    """,
)
def ml_doc_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based document embeddings (mean-pooled token
    vectors): each token's pseudo-embedding is an LCG function of its
    content hash — the feature-hashing trick (Weinberger et al., ICML
    2009) shaped as a dense embedding, giving every pipeline stage that
    needs an `array<float>` column (ANN, near-dup, quantization) a
    model-free, reproducible source. Emits the first 4 dims + the L2 norm
    per doc.

    Entirely in-row: tokenize -> hash each token once -> 8 sequential
    folds per doc — no shuffle, no Python, no model download; at 100 TB
    the cost is one codegen scan. A trained encoder slots in through
    ml/inference.batch_infer with the same output schema."""
    from pyspark_text_classification_spark.functions.hashing import (
        _poly_hash_sql,
    )
    from pyspark_text_classification_spark.functions.text import round_half_up

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = "filter(split(lower(text), '\\\\W+'), t -> length(t) >= 2)"
    th = f"transform({toks}, t -> {_poly_hash_sql('t')})"
    t = docs.selectExpr("doc_id", f"{th} AS th")
    means = [
        F.expr(
            f"aggregate(th, CAST(0.0 AS DOUBLE), "
            f"(acc, h) -> acc + ({_tok_comp('h', d)}))"
            f" / greatest(size(th), 1)"
        ).alias(f"e{d}")
        for d in range(EMB_DIMS)
    ]
    m = t.select(
        "doc_id", F.size("th").cast("long").alias("n_tokens"), *means
    )
    nrm = F.sqrt(sum(F.col(f"e{d}") * F.col(f"e{d}") for d in range(EMB_DIMS)))
    return m.select(
        "doc_id",
        "n_tokens",
        *[round_half_up(F.col(f"e{d}"), 6).alias(f"e{d}") for d in range(4)],
        round_half_up(nrm, 6).alias("nrm"),
    )


CALIB_SCALE = 10_000  # confidence quantization for order-independent sums


@query(
    "ml_calibration_bins",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             {sql_char_poly_hash("substr(text, 1, 256)")} AS hh
      FROM documents
    ),
    p AS (
      SELECT CAST(lang = 'en' AS BIGINT) AS label,
             CAST(floor((0.5 + (hh % 1000) / 2000.0) * {CALIB_SCALE}.0 + 0.5)
                  AS BIGINT) AS cq
      FROM h
    )
    SELECT CAST(cq // 1000 AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round_half_up(
               f'CAST(sum(cq) AS DOUBLE) / ({CALIB_SCALE}.0 * count(*))', 4)}
             AS mean_conf,
           {sql_round_half_up(
               'CAST(sum(label) AS DOUBLE) / count(*)', 4)} AS pos_rate
    FROM p GROUP BY 1
    """,
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) bins over the inference surface: bucket
    predictions by confidence decile and compare mean claimed confidence
    against the empirical positive rate — the standard post-deployment
    check that a classifier's probabilities mean what they say.

    Runs through the REAL mapInPandas inference path (per-worker model
    singleton, Arrow batches) joined back to labels, then reduces to a
    handful of bins — so the whole pandas-exchange contract is value-
    verified by the oracle, not just the aggregate arithmetic.
    Confidences quantize to integer ten-thousandths before summing
    (order-independent); the bin index is integer division of the
    quantized value, avoiding any float-boundary disagreement."""
    from pyspark_text_classification_spark.functions.text import round_half_up

    docs = load_table(spark, sf_dir, "documents")
    preds = batch_infer(docs, text_col="text", id_col="doc_id")
    labels = docs.select(
        "doc_id", (F.col("lang") == "en").cast("long").alias("label")
    )
    p = preds.join(labels, "doc_id").select(
        "label",
        F.floor(F.col("confidence") * CALIB_SCALE + F.lit(0.5))
        .cast("long")
        .alias("cq"),
    )
    cnt = F.count("*")
    return p.groupBy(
        F.expr("cq div 1000").cast("int").alias("bin")
    ).agg(
        cnt.alias("n"),
        round_half_up(
            F.sum("cq").cast("double") / (F.lit(float(CALIB_SCALE)) * cnt), 4
        ).alias("mean_conf"),
        round_half_up(F.sum("label").cast("double") / cnt, 4).alias("pos_rate"),
    )


N_FOLDS = 5
_FOLD_SALT = "|fold"  # decouples fold assignment from the split/sample streams


@query(
    "ml_kfold_assign",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             CAST(lang = 'en' AS DOUBLE) AS label,
             {sql_char_poly_hash(f"text || '{_FOLD_SALT}'")} % {N_FOLDS} AS fold
      FROM documents
    )
    SELECT CAST(fold AS BIGINT) AS fold, label,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc_id
    FROM f GROUP BY 1, 2
    """,
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold id =
    salted content hash mod k, summarized as per-(fold, label) counts —
    the balance check run before distributed CV training.

    Content hashing (not rand(seed)) makes folds reproducible across
    engines, retries, and cluster sizes, AND sends exact-duplicate
    documents to the same fold — the leakage rule pipeline_hash_split
    enforces for train/test, applied per fold; the salt decouples fold
    geometry from the 80/10/10 split stream so the two partitions are
    independent.  Pure map-side expression + one bounded (k x labels)
    aggregate."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    fold = char_poly_hash(F.concat(F.col("text"), F.lit(_FOLD_SALT))) % N_FOLDS
    return docs.groupBy(
        fold.cast("long").alias("fold"),
        (F.col("lang") == "en").cast("double").alias("label"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("first_doc_id"),
    )


KEYWORDS_K = 3


@query(
    "text_keywords_topk",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    total AS (SELECT count(*) AS n_docs FROM documents),
    m AS (
      SELECT tf.doc_id, tf.token,
             {sql_round_half_up(
                 'tf.tf * CAST(floor(ln((n_docs + 1.0) / (dfreq.df + 1.0))'
                 ' * 1000000.0 + 0.5) AS BIGINT) / 1000000.0', 6)}
               AS tfidf
      FROM tf JOIN dfreq ON tf.token = dfreq.token, total
      WHERE dfreq.df >= 5
    )
    SELECT doc_id, token, tfidf, CAST(rnk AS INT) AS rank
    FROM (
      SELECT doc_id, token, tfidf,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, token
             ) AS rnk
      FROM m
    ) WHERE rnk <= {KEYWORDS_K}
    """,
)
def text_keywords_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction: the top-k TF-IDF terms per document — the
    classic summarize/tag/index op, expressed as a per-doc window over
    the sparse doc-term matrix (ml_tfidf_matrix).

    Ranking happens on the 6-decimal ROUNDED score with a token
    tie-break, so the top-k set is identical on both engines; the window
    partitions on doc_id — the matrix is already (doc, token)-keyed, so
    no new data-sized shuffle shape appears."""
    m = ml_tfidf_matrix(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        m.select("doc_id", "token", "tfidf")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KEYWORDS_K)
        .select("doc_id", "token", "tfidf", F.col("rank").cast("int").alias("rank"))
    )


@query("ml_infer_exported")
def ml_infer_exported(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full train → export → serve loop with a REAL trained model and
    no heavy-framework dependency: fit the sst2 recipe (MLlib LR over
    tf-idf), export vocab/idf/coefficients to plain data
    (ml/inference.export_lr_scorer), and serve it through the same
    mapInPandas worker-singleton lifecycle the stub queries exercise —
    the exported scorer reproduces model.transform() within an absolute
    confidence tolerance of 1e-9 per document, with predicted labels
    exactly equal whenever p1 is not within 1e-9 of the 0.5 decision
    boundary (tests/test_ml.py::test_exported_scorer_matches_mllib_transform,
    run over the full sf documents table).  Rows-only check by design
    (the iterative L-BFGS fit is not oracle-hashable); that test IS the
    audit bound for this query's serving path."""
    from pyspark_text_classification_spark.ml.inference import (
        ExportedScorerFactory,
        batch_infer,
        export_lr_scorer,
    )
    from pyspark_text_classification_spark.ml.pipelines import (
        fit_text_classifier,
    )

    labeled = _labeled_documents(spark, sf_dir)
    model = fit_text_classifier(labeled, recipe="sst2")
    docs = load_table(spark, sf_dir, "documents")
    served = batch_infer(
        docs, model_factory=ExportedScorerFactory(export_lr_scorer(model))
    )
    # quantize BEFORE summing (int64 sums are partition-order-free; a
    # floor over a double sum can flip on shuffle-arrival order)
    return served.groupBy("predicted_label").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.floor(F.col("confidence") * 10000.0).cast("long"))
        .alias("conf_x4_sum"),
    )


# --- fully on-engine Naive Bayes (closed-form, oracle-hashable) -------------
NB_SCALE = 1_000_000  # micro-nat quantization of every log term


@query(
    "ml_naive_bayes_confusion",
    oracle=f"""
    WITH labeled AS (
      SELECT doc_id, text,
             CAST(lang = 'en' AS INT) AS label
      FROM documents
    ),
    toks AS (
      SELECT doc_id, label, unnest({_SQL_TOKENS}) AS term FROM labeled
    ),
    tf AS (
      SELECT doc_id, label, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2, 3
    ),
    class_term AS (
      SELECT label, term, CAST(sum(tf) AS BIGINT) AS cnt
      FROM tf GROUP BY 1, 2
    ),
    class_tot AS (
      SELECT label, CAST(sum(cnt) AS BIGINT) AS tot
      FROM class_term GROUP BY 1
    ),
    vocab AS (
      SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM toks
    ),
    priors AS (
      SELECT
        CAST(floor(ln(CAST(sum(CASE WHEN label = 0 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*)) * {NB_SCALE} + 0.5) AS BIGINT) AS p0,
        CAST(floor(ln(CAST(sum(CASE WHEN label = 1 THEN 1 ELSE 0 END)
             AS DOUBLE) / count(*)) * {NB_SCALE} + 0.5) AS BIGINT) AS p1
      FROM labeled
    ),
    cond AS (
      SELECT t.term,
        CAST(floor(ln((COALESCE(c0.cnt, 0) + 1.0)
             / ((SELECT tot FROM class_tot WHERE label = 0) + v.v))
             * {NB_SCALE} + 0.5) AS BIGINT) AS lc0,
        CAST(floor(ln((COALESCE(c1.cnt, 0) + 1.0)
             / ((SELECT tot FROM class_tot WHERE label = 1) + v.v))
             * {NB_SCALE} + 0.5) AS BIGINT) AS lc1
      FROM (SELECT DISTINCT term FROM toks) t
      LEFT JOIN class_term c0 ON c0.term = t.term AND c0.label = 0
      LEFT JOIN class_term c1 ON c1.term = t.term AND c1.label = 1
      CROSS JOIN vocab v
    ),
    scores AS (
      SELECT f.doc_id, f.label,
             sum(f.tf * cond.lc0) AS s0, sum(f.tf * cond.lc1) AS s1
      FROM tf f JOIN cond ON cond.term = f.term
      GROUP BY 1, 2
    ),
    preds AS (
      SELECT label,
             CASE WHEN s1 + pr.p1 > s0 + pr.p0 THEN 1 ELSE 0 END AS pred
      FROM scores CROSS JOIN priors pr
    )
    SELECT CAST(label AS INT) AS label, CAST(pred AS INT) AS pred,
           CAST(count(*) AS BIGINT) AS n
    FROM preds GROUP BY 1, 2
    """,
)
def ml_naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A COMPLETE trained classifier whose training AND evaluation are
    hash-verified cross-engine: multinomial Naive Bayes with Laplace
    smoothing over the token counts, labels = (lang = 'en'), scored on
    the training corpus, reported as the confusion matrix.

    NB's fit is closed-form counting — class priors, per-(class, term)
    smoothed conditionals — so unlike the L-BFGS LR recipes (rows-only
    by necessity) every model parameter is a ratio of exact int64
    counts, quantized to micro-nats (the text_lm_logprob ln pattern),
    and the per-doc argmax is an integer comparison.  Relational shape:
    one corpus explode feeds tf / class-conditional / vocab aggregates;
    the conditional table is vocab-bounded and joins tf on term
    (hash-partitioned); scoring is one map-side-combined sum per
    (doc, class); the confusion output is 4 rows.  The same dataflow at
    100 TB is exactly how large-scale NB / language-ID models are
    actually trained."""
    labeled = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    toks = labeled.select(
        "doc_id", "label", F.explode(tokenize("text", 2)).alias("term")
    )
    # materialize the (doc, term) count grain, not the raw explode: tf is
    # the smaller artifact and every downstream aggregate (conditionals,
    # vocab, scoring) derives from it, so the explode runs exactly once
    tf = (
        toks.groupBy("doc_id", "label", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    class_term = tf.groupBy("label", "term").agg(F.sum("tf").alias("cnt"))
    class_tot = class_term.groupBy("label").agg(F.sum("cnt").alias("tot"))
    vocab = tf.agg(F.count_distinct("term").alias("v"))

    def micronat(x):
        return F.floor(F.log(x) * NB_SCALE + F.lit(0.5)).cast("long")

    priors = labeled.agg(
        micronat(
            F.sum((F.col("label") == 0).cast("long"))
            / F.count("*").cast("double")
        ).alias("p0"),
        micronat(
            F.sum((F.col("label") == 1).cast("long"))
            / F.count("*").cast("double")
        ).alias("p1"),
    )
    terms = tf.select("term").distinct()
    c0 = class_term.filter(F.col("label") == 0).select(
        "term", F.col("cnt").alias("cnt0")
    )
    c1 = class_term.filter(F.col("label") == 1).select(
        "term", F.col("cnt").alias("cnt1")
    )
    t0 = class_tot.filter(F.col("label") == 0).select(
        F.col("tot").alias("tot0")
    )
    t1 = class_tot.filter(F.col("label") == 1).select(
        F.col("tot").alias("tot1")
    )
    cond = (
        terms.join(c0, "term", "left")
        .join(c1, "term", "left")
        .crossJoin(F.broadcast(t0))
        .crossJoin(F.broadcast(t1))
        .crossJoin(F.broadcast(vocab))
        .select(
            "term",
            micronat(
                (F.coalesce(F.col("cnt0"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot0") + F.col("v"))
            ).alias("lc0"),
            micronat(
                (F.coalesce(F.col("cnt1"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot1") + F.col("v"))
            ).alias("lc1"),
        )
    )
    scores = (
        tf.join(cond, "term")
        .groupBy("doc_id", "label")
        .agg(
            F.sum(F.col("tf") * F.col("lc0")).alias("s0"),
            F.sum(F.col("tf") * F.col("lc1")).alias("s1"),
        )
    )
    preds = scores.crossJoin(F.broadcast(priors)).select(
        "label",
        F.when(
            F.col("s1") + F.col("p1") > F.col("s0") + F.col("p0"), 1
        )
        .otherwise(0)
        .alias("pred"),
    )
    return preds.groupBy("label", "pred").agg(F.count("*").alias("n"))


@query(
    "ml_nb_langid_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest({_SQL_TOKENS}) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2, 3
    ),
    langs AS (SELECT DISTINCT lang AS cl FROM documents),
    class_term AS (
      SELECT lang AS cl, term, CAST(sum(tf) AS BIGINT) AS cnt
      FROM tf GROUP BY 1, 2
    ),
    class_tot AS (
      SELECT cl, CAST(sum(cnt) AS BIGINT) AS tot FROM class_term GROUP BY 1
    ),
    vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM toks),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    priors AS (
      SELECT lang AS cl,
             CAST(floor(ln(CAST(count(*) AS DOUBLE) / nd.n)
                  * {NB_SCALE} + 0.5) AS BIGINT) AS prior
      FROM documents CROSS JOIN nd GROUP BY 1, nd.n
    ),
    cond AS (
      SELECT l.cl, t.term,
        CAST(floor(ln((COALESCE(ct.cnt, 0) + 1.0) / (tt.tot + v.v))
             * {NB_SCALE} + 0.5) AS BIGINT) AS lc
      FROM (SELECT DISTINCT term FROM toks) t
      CROSS JOIN langs l
      LEFT JOIN class_term ct ON ct.term = t.term AND ct.cl = l.cl
      JOIN class_tot tt ON tt.cl = l.cl
      CROSS JOIN vocab v
    ),
    scores AS (
      SELECT f.doc_id, f.lang, c.cl,
             sum(f.tf * c.lc) AS s
      FROM tf f JOIN cond c ON c.term = f.term
      GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT scores.lang, scores.cl AS pred,
             row_number() OVER (PARTITION BY scores.doc_id
                                ORDER BY scores.s + p.prior DESC,
                                         scores.cl) AS rn
      FROM scores JOIN priors p ON p.cl = scores.cl
    )
    SELECT lang AS true_lang, pred AS pred_lang,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked WHERE rn = 1 GROUP BY 1, 2
    """,
)
def ml_nb_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass Naive Bayes LANGUAGE IDENTIFICATION — the classic
    large-corpus NB application — trained and evaluated entirely
    on-engine with every parameter hash-verified (the
    ml_naive_bayes_confusion machinery generalized over the language
    dimension instead of two hardcoded classes).

    The conditional table is (vocab x |langs|) rows — built by a CROSS
    JOIN of the term dimension with the language dimension then a LEFT
    JOIN of observed counts, so unseen (term, lang) cells get the
    smoothed floor — and joins tf on term; per-doc argmax is a 5-row
    window with the (score desc, lang) deterministic tie-break.  The
    25-cell confusion matrix is the output.  At 100 TB this IS how
    corpus-scale language-ID models (e.g. fastText-style baselines'
    count layer) get trained: token-count aggregates + a bounded model
    table, no iterative fit."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(tokenize("text", 2)).alias("term")
    )
    # same artifact choice as ml_naive_bayes_confusion: checkpoint the
    # (doc, term) count grain and derive vocab/terms from it
    tf = (
        toks.groupBy("doc_id", "lang", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    langs = docs.select(F.col("lang").alias("cl")).distinct()
    class_term = tf.groupBy(F.col("lang").alias("cl"), "term").agg(
        F.sum("tf").alias("cnt")
    )
    class_tot = class_term.groupBy("cl").agg(F.sum("cnt").alias("tot"))
    vocab = tf.agg(F.count_distinct("term").alias("v"))
    nd = docs.agg(F.count("*").alias("n"))

    def micronat(x):
        return F.floor(F.log(x) * NB_SCALE + F.lit(0.5)).cast("long")

    priors = (
        docs.groupBy(F.col("lang").alias("cl"))
        .agg(F.count("*").alias("nc"))
        .crossJoin(F.broadcast(nd))
        .select(
            "cl",
            micronat(F.col("nc").cast("double") / F.col("n")).alias(
                "prior"
            ),
        )
    )
    terms = tf.select("term").distinct()
    cond = (
        terms.crossJoin(F.broadcast(langs))
        .join(class_term, ["term", "cl"], "left")
        .join(F.broadcast(class_tot), "cl")
        .crossJoin(F.broadcast(vocab))
        .select(
            "cl",
            "term",
            micronat(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1.0))
                / (F.col("tot") + F.col("v"))
            ).alias("lc"),
        )
    )
    scores = (
        tf.join(cond, "term")
        .groupBy("doc_id", "lang", "cl")
        .agg(F.sum(F.col("tf") * F.col("lc")).alias("s"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("s") + F.col("prior")).desc(), "cl"
    )
    ranked = (
        scores.join(F.broadcast(priors), "cl")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return ranked.groupBy(
        F.col("lang").alias("true_lang"), F.col("cl").alias("pred_lang")
    ).agg(F.count("*").alias("n"))


# Chi-squared feature selection knobs: minimum document frequency keeps
# noise tokens out of the ranking (and keeps every contingency margin
# well-defined); K is the per-class shortlist a downstream featurizer
# consumes.
CHI2_MIN_DF = 5
CHI2_TOP_K = 10
# Local top-k salting width for the per-class shortlist (two-level
# top-k): bounds every window partition at vocab/|salts| rows.
CHI2_SALTS = 64


@query(
    "ml_chi2_feature_select",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(
               str_split_regex(lower(text), '\W+'), t -> length(t) >= 2))
               AS toks
      FROM documents
    ),
    u AS (SELECT doc_id, lang, unnest(toks) AS token FROM t),
    n_tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
    lang_tot AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS nl FROM t GROUP BY 1
    ),
    tok_lang AS (
      SELECT token, lang, CAST(count(*) AS BIGINT) AS n11
      FROM u GROUP BY 1, 2
    ),
    tok_tot AS (
      SELECT token, CAST(count(*) AS BIGINT) AS df FROM u GROUP BY 1
    ),
    scored AS (
      SELECT tl.lang, tl.token, tl.n11,
             CAST((1000000::HUGEINT * n.n
                   * (tl.n11::HUGEINT * (n.n - lt.nl - (tt.df - tl.n11))
                      - (tt.df - tl.n11)::HUGEINT * (lt.nl - tl.n11))
                   * (tl.n11::HUGEINT * (n.n - lt.nl - (tt.df - tl.n11))
                      - (tt.df - tl.n11)::HUGEINT * (lt.nl - tl.n11)))
                  // (tt.df::HUGEINT * (n.n - tt.df)
                      * lt.nl * (n.n - lt.nl))
                  AS BIGINT) AS chi2_micro
      FROM tok_lang tl
      JOIN tok_tot tt ON tl.token = tt.token
      JOIN lang_tot lt ON tl.lang = lt.lang
      CROSS JOIN n_tot n
      WHERE tt.df >= {CHI2_MIN_DF} AND tt.df < n.n
    )
    SELECT lang, token, n11, chi2_micro, CAST(rnk AS INT) AS rank
    FROM (
      SELECT lang, token, n11, chi2_micro,
             row_number() OVER (
               PARTITION BY lang ORDER BY chi2_micro DESC, token
             ) AS rnk
      FROM scored
    ) WHERE rnk <= {CHI2_TOP_K}
    """,
)
def ml_chi2_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared feature selection: rank each class's most
    label-informative tokens by the chi2 statistic of the (token present,
    class) 2x2 contingency table — the classic pre-featurizer shortlist
    (sklearn's SelectKBest(chi2) / Manning IR ch.13) a training pipeline
    runs before fitting per-domain classifiers.

    Determinism: every margin is an int64 count; chi2 is computed as one
    DECIMAL(38,0) expression — micro-scaled, floored — so both engines
    produce identical integers (exact while 1e6 * N * (N^2/4)^2 fits 38
    digits, i.e. to corpora of ~1e6 docs per shard; beyond that, merge
    per-shard contingency counts first — the counts, not the scores, are
    the additive part).  Ranking ties break on token text.

    Scale shape: one shuffle at token grain builds df, one at (token,
    class) grain builds the contingency cell; class margins (|classes|
    rows) and the scalar N broadcast.  The per-class top-k is two-level:
    a salted local window bounds every partition at vocab/{CHI2_SALTS}
    rows, then the global window ranks |classes| x {CHI2_SALTS} x
    {CHI2_TOP_K} survivors — no single reducer ever sees the whole
    vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs).select(
        "doc_id",
        "lang",
        F.array_distinct(tokenize(F.col("text"), 2)).alias("toks"),
    )
    u = toks.select("doc_id", "lang", F.explode("toks").alias("token"))
    n_tot = toks.agg(F.count("*").cast("long").alias("n"))
    lang_tot = toks.groupBy("lang").agg(F.count("*").cast("long").alias("nl"))
    tok_lang = u.groupBy("token", "lang").agg(
        F.count("*").cast("long").alias("n11")
    )
    tok_tot = u.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    scored = (
        tok_lang.join(tok_tot, "token")
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(n_tot))
        .filter((F.col("df") >= CHI2_MIN_DF) & (F.col("df") < F.col("n")))
        .withColumn(
            "chi2_micro",
            F.expr(
                "CAST((CAST(1000000 AS DECIMAL(38,0)) * n"
                " * (CAST(n11 AS DECIMAL(38,0)) * (n - nl - (df - n11))"
                "    - CAST(df - n11 AS DECIMAL(38,0)) * (nl - n11))"
                " * (CAST(n11 AS DECIMAL(38,0)) * (n - nl - (df - n11))"
                "    - CAST(df - n11 AS DECIMAL(38,0)) * (nl - n11)))"
                " div (CAST(df AS DECIMAL(38,0)) * (n - df)"
                "      * nl * (n - nl)) AS BIGINT)"
            ),
        )
        .select("lang", "token", "n11", "chi2_micro")
    )
    # two-level top-k: salt by token hash so no reducer sees full vocab
    salt = F.pmod(F.xxhash64("token"), F.lit(CHI2_SALTS)).alias("salt")
    w_local = Window.partitionBy("lang", "salt").orderBy(
        F.col("chi2_micro").desc(), "token"
    )
    local = (
        scored.select("*", salt)
        .withColumn("lrk", F.row_number().over(w_local))
        .filter(F.col("lrk") <= CHI2_TOP_K)
    )
    w_global = Window.partitionBy("lang").orderBy(
        F.col("chi2_micro").desc(), "token"
    )
    return (
        local.select(
            "lang",
            "token",
            "n11",
            "chi2_micro",
            F.row_number().over(w_global).alias("rank"),
        )
        .filter(F.col("rank") <= CHI2_TOP_K)
    )


# --- decision stump: exact best single split in integer arithmetic ----------
STUMP_BUCKET_W = 50  # n_chars bucket width — bounds the candidate set


@query(
    "ml_decision_stump",
    oracle=f"""
    WITH b AS (
      SELECT n_chars // {STUMP_BUCKET_W} AS v,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS p,
             CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT)
               AS q
      FROM documents GROUP BY 1
    ),
    pre AS (
      SELECT v,
             sum(p) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS lp,
             sum(q) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS ln
      FROM b
    ),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS tp,
                   CAST(sum(q) AS BIGINT) AS tn FROM b),
    cand AS (
      SELECT v, lp, ln, tot.tp - lp AS rp, tot.tn - ln AS rn
      FROM pre, tot
      WHERE tot.tp - lp + tot.tn - ln > 0
    ),
    scored AS (
      SELECT v, lp, ln, rp, rn,
             (2 * lp * ln * 1000000) // (lp + ln)
               + (2 * rp * rn * 1000000) // (rp + rn) AS score
      FROM cand
    )
    SELECT CAST(v * {STUMP_BUCKET_W} AS BIGINT) AS threshold_chars,
           CAST(score AS BIGINT) AS gini_sum_micro,
           CAST(lp AS BIGINT) AS left_pos, CAST(ln AS BIGINT) AS left_neg,
           CAST(rp AS BIGINT) AS right_pos, CAST(rn AS BIGINT) AS right_neg
    FROM (
      SELECT *, row_number() OVER (ORDER BY score, v) AS rk FROM scored
    ) WHERE rk = 1
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact best decision stump (one-level tree) predicting lang='en'
    from document length: candidate thresholds are the {STUMP_BUCKET_W}-
    char buckets; for each, the split cost is the size-weighted Gini sum
    2*p*n/s per side in integer micro-units (cross-engine exact — the
    only division is one integer div per side), argmin with ties to the
    smallest threshold.

    The CART-primitive shape at 100 TB: ONE pass aggregates the corpus
    to the bounded (bucket, class) grain; the prefix sums, total join
    and argmin all run on that tiny aggregate (windows over ~a dozen
    rows), so split search cost is the scan, not the search — exactly
    how distributed tree learners (PLANET, XGBoost-on-Spark histograms)
    evaluate splits."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.groupBy(
        F.expr(f"n_chars div {STUMP_BUCKET_W}").alias("v")
    ).agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
        .cast("long")
        .alias("p"),
        F.sum(F.when(F.col("lang") == "en", 0).otherwise(1))
        .cast("long")
        .alias("q"),
    )
    w_pre = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pre = b.select(
        "v",
        F.sum("p").over(w_pre).alias("lp"),
        F.sum("q").over(w_pre).alias("ln"),
    )
    tot = b.agg(
        F.sum("p").cast("long").alias("tp"),
        F.sum("q").cast("long").alias("tn"),
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .select(
            "v",
            "lp",
            "ln",
            (F.col("tp") - F.col("lp")).alias("rp"),
            (F.col("tn") - F.col("ln")).alias("rn"),
        )
        .filter(F.col("rp") + F.col("rn") > 0)
    )
    scored = cand.withColumn(
        "score",
        # the numerators are accumulated in DECIMAL(38,0) (2*lp*ln*1e6
        # wraps int64 past ~2.1M docs per class) to mirror DuckDB's
        # HUGEINT promotion of the window sums — the ml_auc_rank /
        # ml_linreg_normal_eq convention; the QUOTIENT is bounded by
        # 2*min(lp,ln)*1e6 so the div's BIGINT result stays exact
        F.expr(
            "(CAST(2 AS DECIMAL(38,0)) * lp * ln * 1000000) div (lp + ln)"
            " + (CAST(2 AS DECIMAL(38,0)) * rp * rn * 1000000)"
            " div (rp + rn)"
        ),
    )
    w_min = Window.orderBy("score", "v")
    return (
        scored.withColumn("rk", F.row_number().over(w_min))
        .filter(F.col("rk") == 1)
        .select(
            (F.col("v") * STUMP_BUCKET_W).cast("long").alias("threshold_chars"),
            F.col("score").cast("long").alias("gini_sum_micro"),
            F.col("lp").alias("left_pos"),
            F.col("ln").alias("left_neg"),
            F.col("rp").alias("right_pos"),
            F.col("rn").alias("right_neg"),
        )
    )


# --- closed-form 2-feature ridge regression in exact decimals ---------------
RIDGE_LAMBDA = 10_000  # L2 penalty on the integer-unit features


@query(
    "ml_ridge_2feat",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x1,
             CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x1 * x1) AS HUGEINT) AS s11,
             CAST(sum(x1 * x2) AS HUGEINT) AS s12,
             CAST(sum(x2 * x2) AS HUGEINT) AS s22,
             CAST(sum(x1 * y) AS HUGEINT) AS s1y,
             CAST(sum(x2 * y) AS HUGEINT) AS s2y
      FROM pts
    ),
    solve AS (
      SELECT n, s1y, s2y,
             (s11 + {RIDGE_LAMBDA}) * (s22 + {RIDGE_LAMBDA}) - s12 * s12
               AS det,
             s1y * (s22 + {RIDGE_LAMBDA}) - s12 * s2y AS num1,
             (s11 + {RIDGE_LAMBDA}) * s2y - s12 * s1y AS num2
      FROM s
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(num1 * 1000000 // det AS BIGINT) AS beta1_micro,
           CAST(num2 * 1000000 // det AS BIGINT) AS beta2_micro
    FROM solve
    """,
)
def ml_ridge_2feat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (no intercept, lambda =
    {RIDGE_LAMBDA}) of price-in-cents on (quantity, discount-in-
    percent-points): beta = (X'X + lambda I)^-1 X'y solved by Cramer's
    rule on the 2x2 normal matrix.  Every sufficient statistic is a
    DECIMAL(38,0) (HUGEINT) sum — the per-row products fit int64 but
    their ACCUMULATION doesn't past ~1e10 rows — and the solve is three
    exact decimal products plus one integer div, so both coefficients
    are bit-reproducible.  Headroom: at 1e12 rows s1y ~ 5e20 and
    num1 ~ s1y*s22 ~ 5e36*1e6... the 1e6 scale is applied AFTER the
    subtraction, keeping the largest intermediate num1*1e6 ~ 3e28 at
    bench scale and < 1e37 at 1e12 rows — inside DECIMAL(38,0).

    The one-pass-fit shape at 100 TB: like ml_linreg_normal_eq, the
    whole regression is ONE map-side-combined aggregate (6 integer
    sums) and a 1-row solve — no iteration, no collect; d features
    generalize to d(d+3)/2 sums and a broadcast d x d solve."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("x2"),
        F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    s = pts.agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum((F.col("x1") * F.col("x1")).cast("decimal(38,0)")).alias("s11"),
        F.sum((F.col("x1") * F.col("x2")).cast("decimal(38,0)")).alias("s12"),
        F.sum((F.col("x2") * F.col("x2")).cast("decimal(38,0)")).alias("s22"),
        F.sum((F.col("x1") * F.col("y")).cast("decimal(38,0)")).alias("s1y"),
        F.sum((F.col("x2") * F.col("y")).cast("decimal(38,0)")).alias("s2y"),
    )
    solve = s.selectExpr(
        "n",
        f"(s11 + {RIDGE_LAMBDA}) * (s22 + {RIDGE_LAMBDA}) - s12 * s12"
        " AS det",
        f"s1y * (s22 + {RIDGE_LAMBDA}) - s12 * s2y AS num1",
        f"(s11 + {RIDGE_LAMBDA}) * s2y - s12 * s1y AS num2",
    )
    return solve.selectExpr(
        "CAST(n AS BIGINT) AS n",
        "CAST(num1 * 1000000 div det AS BIGINT) AS beta1_micro",
        "CAST(num2 * 1000000 div det AS BIGINT) AS beta2_micro",
    )
