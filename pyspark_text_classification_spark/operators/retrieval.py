"""Lexical retrieval over the documents table: inverted-index BM25 top-k.

A training-data pipeline needs retrieval for contamination lookups,
hard-negative mining against a lexical baseline, and dataset search.
BM25 (Robertson & Sparck Jones probabilistic relevance framework; the
Okapi BM25 formulation with k1=1.2, b=0.75) is the standard lexical
scorer, and it maps cleanly onto Spark's relational algebra:

- the POSTINGS table (term, doc_id, tf) is one explode + hash aggregate
  over the tokenized corpus — the inverted index as a DataFrame;
- the query set is tiny and BROADCASTS into the postings scan, so at
  100 TB only postings of the query's terms ever leave the mappers
  (a broadcast hash semi-probe is the relational form of "look up the
  posting lists for these terms");
- document lengths and the corpus totals (N docs, L total tokens) come
  from the same tokenized pass — two aggregates, one of them a 1-row
  broadcast;
- top-k per query is the repo's salted TWO-LEVEL pattern (partial top-k
  per (query, salt) bucket, then final top-k over survivors), never a
  single per-query window funneling a hot query's full candidate set
  through one reducer.

Cross-engine determinism: BM25's tf-normalization is RATIONAL once
avgdl is written as L/N — with k1 = 6/5 and b = 3/4,

    tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)
  = 22*tf*L / (10*L*tf + 3*L + 9*N*dl)        (multiply through by 10*L/N)

so the per-term score is idf_micro * 22*tf*L // (10*L*tf + 3*L + 9*N*dl)
in pure int64 (all operands positive, where floor == truncate — both engines'
integer division truncates toward zero anyway); idf is quantized to integer micro-nats
(floor(ln(.)*1e6+0.5), the text_lm_logprob pattern) before the multiply.
int64 bound: idf_micro(<=~2e7) * 22 * tf * L stays under 2^63 while
tf*L < ~2e10 — comfortable at bundled scale factors; at 100 TB shard the
corpus (per-shard L) or move the numerator to double scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.text import tokenize
from pyspark_text_classification_spark.plans.shared import shared_intermediate
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

# Fixed public query set over the synthetic vocabulary; externally
# supplied query batches would arrive the same way (a tiny broadcast).
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "spark"), (0, "join"), (0, "filter"),
    (1, "hash"), (1, "merge"), (1, "sort"),
    (2, "stream"), (2, "window"), (2, "agg"),
    (3, "customer"), (3, "order"), (3, "value"),
]
BM25_TOPK = 10
BM25_SALTS = 8  # fan-out of the first-level top-k (bounds reducer rows)

_SQL_Q_VALUES = ", ".join(f"({qid}, '{t}')" for qid, t in BM25_QUERIES)
_SQL_TOKS = (
    r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"
)


# Shared BM25 CTE chain (query VALUES -> per-query-per-doc score), reused
# verbatim by the top-k and the pseudo-relevance-feedback oracles so both
# rank against the identical scoring definition.
_SQL_BM25_CTES = f"""
    q(query_id, term) AS (VALUES {_SQL_Q_VALUES}),
    toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    postings AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM toks GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS l_tot,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM toks),
    tdf AS (
      SELECT p.term, CAST(count(*) AS BIGINT) AS df
      FROM postings p
      WHERE p.term IN (SELECT DISTINCT term FROM q)
      GROUP BY 1
    ),
    scored AS (
      SELECT q.query_id, p.doc_id,
        CAST(floor(ln((tot.n_docs - tdf.df + 0.5) / (tdf.df + 0.5) + 1.0)
                   * 1000000.0 + 0.5) AS BIGINT)
          * (22 * p.tf * tot.l_tot)
          // (10 * tot.l_tot * p.tf + 3 * tot.l_tot
              + 9 * tot.n_docs * dl.dl) AS contrib
      FROM q
      JOIN postings p ON p.term = q.term
      JOIN tdf ON tdf.term = q.term
      JOIN dl ON dl.doc_id = p.doc_id
      CROSS JOIN tot
    ),
    per_doc AS (SELECT query_id, doc_id, sum(contrib) AS score_micro
                FROM scored GROUP BY 1, 2),
    topk AS (
      SELECT query_id, doc_id, score_micro, rnk
      FROM (
        SELECT query_id, doc_id, score_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score_micro DESC, doc_id) AS rnk
        FROM per_doc
      ) WHERE rnk <= {BM25_TOPK}
    )
"""


@query(
    "retrieval_bm25_topk",
    oracle=f"""
    WITH {_SQL_BM25_CTES}
    SELECT query_id, doc_id, CAST(score_micro AS BIGINT) AS score_micro,
           CAST(rnk AS INT) AS rank
    FROM topk
    """,
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-{BM25_TOPK} documents per query
    over an inverted-index postings DataFrame, scored in pure int64.

    See the module docstring for the rational-arithmetic derivation and
    the 100 TB plan shape (broadcast query probe into postings; salted
    two-level top-k)."""
    postings, qterms, tot, per_doc = _bm25_scored(spark, sf_dir)
    return _bm25_topk(per_doc).select(
        "query_id",
        "doc_id",
        "score_micro",
        F.col("rank").cast("int").alias("rank"),
    )


def _postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, tf): the inverted-index postings table, built ONCE
    per session and shared by every retrieval-family operator (BM25,
    tf-idf cosine, feedback expansion, NDCG, RRF) — seven queries used
    to rebuild this identically; an index is a build-once-serve-many
    artifact, so the session slot is the honest production shape.

    Size note vs the plans.shared "provably small" contract: postings
    is |distinct (term, doc)| — bounded by vocab x docs, NOT by input
    tokens (the explode is never stored).  At true corpus scale this
    slot graduates from a session checkpoint to a persisted/bucketed
    index table; the query-side plans are unchanged either way."""
    def build() -> DataFrame:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        toks = docs.select(
            "doc_id", F.explode(tokenize("text", 2)).alias("term")
        )
        return toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))

    return shared_intermediate(spark, sf_dir, "retrieval_postings", build)


def _positions_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, term) positional postings PRE-PRUNED to the phrase
    probe terms — the shared input of phrase_match and proximity.
    Provably small: positions of <= 8 fixed probe terms only."""
    def build() -> DataFrame:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        pos = docs.select(
            "doc_id",
            F.posexplode(tokenize("text", 2)).alias("pos0", "term"),
        ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
        q = spark.createDataFrame(
            PHRASE_QUERIES, "query_id INT, t1 STRING, t2 STRING"
        )
        terms = q.select(F.col("t1").alias("term")).unionByName(
            q.select(F.col("t2").alias("term"))
        ).distinct()
        return pos.join(F.broadcast(terms), "term")

    return shared_intermediate(spark, sf_dir, "retrieval_positions", build)


def _bm25_scored(spark: SparkSession, sf_dir: str):
    """Shared BM25 build: (postings, qterms, tot, per_doc) — the Spark
    twin of the _SQL_BM25_CTES chain up to ``per_doc``."""
    postings = _postings(spark, sf_dir)
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = postings.agg(
        F.sum("tf").alias("l_tot"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    qterms = spark.createDataFrame(BM25_QUERIES, "query_id INT, term STRING")
    # inverted-index probe: only postings of query terms survive the scan
    post_q = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    tdf = post_q.groupBy("term").agg(F.count("*").alias("df"))
    idf_micro = F.floor(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * 1_000_000.0
        + F.lit(0.5)
    ).cast("long")
    scored = (
        post_q.join(F.broadcast(tdf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(qterms), "term")
        .withColumn("idf_micro", idf_micro)
        .withColumn("num", F.col("idf_micro") * (22 * F.col("tf") * F.col("l_tot")))
        .withColumn(
            "den",
            10 * F.col("l_tot") * F.col("tf")
            + 3 * F.col("l_tot")
            + 9 * F.col("n_docs") * F.col("dl"),
        )
        .withColumn("contrib", F.expr("num div den"))
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score_micro")
    )
    return postings, qterms, tot, per_doc


def _bm25_topk_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session slot: the BM25 ranker's top-{BM25_TOPK} lists
    (query_id, doc_id, score_micro, rank) — PROVABLY SMALL
    (|queries| x {BM25_TOPK} rows by the top-k constant), deterministic,
    and value-identical to re-running the registered
    ``retrieval_bm25_topk`` chain (same builder).  The downstream
    combiner/evaluator queries (RRF fusion, NDCG, PRF expansion) consume
    ranker OUTPUT lists — in production they read the ranker's served
    answers, they do not re-run retrieval per dashboard refresh — so
    they share one build per (session, sf).  The registered ranking
    queries themselves deliberately do NOT read this slot: they keep
    pricing the full ranker build in the bench (the served-members
    discipline from plans.shared)."""
    def build() -> DataFrame:
        _, _, _, per_doc = _bm25_scored(spark, sf_dir)
        return _bm25_topk(per_doc).select(
            "query_id", "doc_id", "score_micro", "rank"
        )

    return shared_intermediate(spark, sf_dir, "retrieval_bm25_topk_list", build)


def _tfidf_topk_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session slot: the tf-idf-cosine ranker's top-{COS_TOPK} lists
    (query_id, doc_id, cos_bp, rank) — same bounded-output/slot
    discipline as _bm25_topk_list; consumed by RRF fusion."""
    def build() -> DataFrame:
        return retrieval_tfidf_cosine(spark, sf_dir)

    return shared_intermediate(
        spark, sf_dir, "retrieval_tfidf_topk_list", build
    )


def _bm25_topk(per_doc: DataFrame) -> DataFrame:
    """Salted two-level top-{BM25_TOPK} per query over per-doc scores:
    (query_id, doc_id, score_micro, rank)."""
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.col("doc_id"), F.lit(BM25_SALTS))
    ).orderBy(F.col("score_micro").desc(), "doc_id")
    survivors = (
        per_doc.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= BM25_TOPK)
        .drop("r1")
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), "doc_id"
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= BM25_TOPK)
    )


# --- positional-index phrase match ------------------------------------------
PHRASE_QUERIES: list[tuple[int, str, str]] = [
    (0, "hash", "join"),
    (1, "merge", "sort"),
    (2, "table", "scan"),
    (3, "stream", "window"),
]
PHRASE_TOPK = 10

_SQL_P_VALUES = ", ".join(
    f"({qid}, '{t1}', '{t2}')" for qid, t1, t2 in PHRASE_QUERIES
)


@query(
    "retrieval_phrase_match",
    oracle=f"""
    WITH q(query_id, t1, t2) AS (VALUES {_SQL_P_VALUES}),
    pos AS (
      SELECT doc_id, unnest(toks) AS term,
             generate_subscripts(toks, 1) AS pos
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    ),
    m AS (
      SELECT q.query_id, p1.doc_id,
             CAST(count(*) AS BIGINT) AS n_matches
      FROM q
      JOIN pos p1 ON p1.term = q.t1
      JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
                 AND p2.term = q.t2
      GROUP BY 1, 2
    )
    SELECT query_id, doc_id, n_matches, CAST(rnk AS INT) AS rank
    FROM (
      SELECT query_id, doc_id, n_matches,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY n_matches DESC, doc_id) AS rnk
      FROM m
    ) WHERE rnk <= {PHRASE_TOPK}
    """,
)
def retrieval_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase retrieval over a POSITIONAL inverted index: top-{PHRASE_TOPK}
    documents per bigram phrase query, ranked by phrase-occurrence count.

    The positional postings table (doc_id, pos, term) is one posexplode
    over the tokenized corpus — the data structure behind phrase and
    proximity operators in every lexical engine.  A phrase match is a
    SELF-JOIN of the postings on (same doc, adjacent positions, the two
    phrase terms): relationally, adjacency is just an equi-join key
    (doc_id, pos+1).  The broadcast query probe prunes the postings scan
    to the phrase's terms before the join, so at 100 TB only those
    posting lists shuffle — and they are joined on doc_id, their natural
    partitioning.  Positions index the FILTERED token sequence (tokens
    >= 2 chars), identically in both engines.  Unlike BM25's scored
    union, phrase candidates are only the documents containing both
    terms adjacently, so the final per-query top-k window sees a small
    bounded set (no salted two-level needed)."""
    q = spark.createDataFrame(
        PHRASE_QUERIES, "query_id INT, t1 STRING, t2 STRING"
    )
    # probe: only postings of phrase terms survive the scan (shared,
    # session-cached probed positional index)
    pq = _positions_probed(spark, sf_dir)
    p1 = pq.alias("p1").join(F.broadcast(q), F.col("p1.term") == F.col("t1"))
    p2 = pq.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("pos2"),
        F.col("term").alias("term2"),
    )
    m = (
        p1.join(
            p2,
            (F.col("p1.doc_id") == F.col("d2"))
            & (F.col("pos2") == F.col("p1.pos") + 1)
            & (F.col("term2") == F.col("t2")),
        )
        .groupBy("query_id", F.col("p1.doc_id").alias("doc_id"))
        .agg(F.count("*").alias("n_matches"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_matches").desc(), "doc_id"
    )
    return (
        m.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PHRASE_TOPK)
        .select(
            "query_id",
            "doc_id",
            "n_matches",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- pseudo-relevance-feedback query expansion --------------------------------
EXP_TOPK = 8  # expansion terms per query


@query(
    "retrieval_query_expansion",
    oracle=f"""
    WITH {_SQL_BM25_CTES},
    fb AS (SELECT query_id, doc_id FROM topk),
    cand AS (
      SELECT f.query_id, p.term, CAST(count(*) AS BIGINT) AS df_fb
      FROM fb f
      JOIN postings p ON p.doc_id = f.doc_id
      LEFT JOIN q qx ON qx.query_id = f.query_id AND qx.term = p.term
      WHERE qx.term IS NULL
      GROUP BY 1, 2
    ),
    cdf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df
      FROM postings WHERE term IN (SELECT DISTINCT term FROM cand)
      GROUP BY 1
    ),
    exp AS (
      SELECT c.query_id, c.term, c.df_fb,
             c.df_fb
               * CAST(floor(ln((tot.n_docs - cdf.df + 0.5) / (cdf.df + 0.5)
                              + 1.0) * 1000000.0 + 0.5) AS BIGINT)
               AS score_micro
      FROM cand c JOIN cdf ON cdf.term = c.term CROSS JOIN tot
    )
    SELECT query_id, term, df_fb, score_micro, CAST(rnk AS INT) AS rank
    FROM (
      SELECT query_id, term, df_fb, score_micro,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, term) AS rnk
      FROM exp
    ) WHERE rnk <= {EXP_TOPK}
    """,
)
def retrieval_query_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback (RM1-style) query expansion: run BM25,
    take each query's top-{BM25_TOPK} feedback documents, and propose the
    {EXP_TOPK} terms that best characterize that feedback set — scored
    df_in_feedback x corpus idf (integer micro-nats), original query
    terms excluded.  The classic automatic-query-reformulation loop
    (Rocchio/RM models) as three relational stages on the SAME postings
    DataFrame the BM25 stage built.

    Scale shape: the feedback set is queries x {BM25_TOPK} rows (tiny,
    broadcast into the postings probe); candidate terms are bounded by
    feedback-doc lengths, so the idf lookup is a broadcast semi-probe of
    postings and the final per-query ranking window sees a bounded
    candidate set."""
    # the feedback set is the ranker's session-cached top-k list (the
    # PRF loop reads the first-pass ranking's OUTPUT; value-identical to
    # rebuilding it — see _bm25_topk_list)
    postings = _postings(spark, sf_dir)
    qterms = spark.createDataFrame(BM25_QUERIES, "query_id INT, term STRING")
    tot = postings.agg(
        F.sum("tf").alias("l_tot"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    fb = _bm25_topk_list(spark, sf_dir).select("query_id", "doc_id")
    cand = (
        postings.join(F.broadcast(fb), "doc_id")
        .join(F.broadcast(qterms), ["query_id", "term"], "left_anti")
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("df_fb"))
    )
    cterms = cand.select("term").distinct()
    cdf = postings.join(F.broadcast(cterms), "term").groupBy("term").agg(
        F.count("*").alias("df")
    )
    idf_micro = F.floor(
        F.log(
            (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
            + F.lit(1.0)
        )
        * 1_000_000.0
        + F.lit(0.5)
    ).cast("long")
    exp = (
        cand.join(F.broadcast(cdf), "term")
        .crossJoin(F.broadcast(tot))
        .withColumn("score_micro", F.col("df_fb") * idf_micro)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), "term"
    )
    return (
        exp.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= EXP_TOPK)
        .select(
            "query_id",
            "term",
            "df_fb",
            "score_micro",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- tf-idf cosine retrieval --------------------------------------------------
# idf quantized to MILLI-nats (not the repo's usual micro): weights enter
# SQUARED norm sums, and tf*idf_micro squared would pass int64 at a few
# terms — milli keeps w <= ~1e6, w^2 <= ~1e12, and per-doc norm sums
# < 2^52 (so the double sqrt below is exact-input) up to ~4e3 terms/doc.
COS_SCALE = 10_000  # cosine reported in basis points
COS_TOPK = 10


@query(
    "retrieval_tfidf_cosine",
    oracle=f"""
    WITH q(query_id, term) AS (VALUES {_SQL_Q_VALUES}),
    toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    postings AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM postings),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
              FROM postings GROUP BY 1),
    idf AS (
      SELECT term,
             CAST(floor(ln((tot.n_docs + 1.0) / (df + 1.0)) * 1000.0 + 0.5)
                  AS BIGINT) AS idf_milli
      FROM dfreq, tot
    ),
    w AS (
      SELECT p.doc_id, p.term, p.tf * i.idf_milli AS wt
      FROM postings p JOIN idf i ON p.term = i.term
    ),
    dnorm AS (
      SELECT doc_id,
             CAST(floor(sqrt(CAST(sum(wt * wt) AS DOUBLE))) AS BIGINT) AS dn
      FROM w GROUP BY 1
    ),
    qw AS (
      SELECT q.query_id, q.term, i.idf_milli AS wt
      FROM q JOIN idf i ON q.term = i.term
    ),
    qnorm AS (
      SELECT query_id,
             CAST(floor(sqrt(CAST(sum(wt * wt) AS DOUBLE))) AS BIGINT) AS qn
      FROM qw GROUP BY 1
    ),
    dots AS (
      SELECT qw.query_id, w.doc_id, CAST(sum(qw.wt * w.wt) AS BIGINT) AS dot
      FROM qw JOIN w ON w.term = qw.term
      GROUP BY 1, 2
    ),
    cos AS (
      SELECT d.query_id, d.doc_id,
             d.dot * {COS_SCALE} // (qn.qn * dn.dn) AS cos_bp
      FROM dots d
      JOIN qnorm qn ON qn.query_id = d.query_id
      JOIN dnorm dn ON dn.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, cos_bp, CAST(rnk AS INT) AS rank
    FROM (
      SELECT query_id, doc_id, cos_bp,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_bp DESC, doc_id) AS rnk
      FROM cos
    ) WHERE rnk <= {COS_TOPK}
    """,
)
def retrieval_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-space retrieval: cosine of tf-idf weight vectors between
    each query and its candidate documents (docs sharing >= 1 query
    term), reported in integer basis points — the classic VSM ranking
    (Salton 1975) beside BM25, sharing the same inverted-index probe.

    Determinism: weights are integer (tf x milli-nat idf); the two
    norms are floor(sqrt(exact-int64 sum)) — IEEE sqrt on an exactly-
    representable input is correctly rounded identically in both
    engines (norm sums stay < 2^52, see COS_SCALE comment) — and the
    final cosine is one integer mul-div.  Scale shape: the per-doc norm
    is a postings aggregate computed once (index-build side, like dl in
    BM25); query-time work is the broadcast probe, one dot-product
    aggregate over the probed postings, and a bounded per-query top-k."""
    postings = _postings(spark, sf_dir)
    tot = postings.agg(F.count_distinct("doc_id").alias("n_docs"))
    dfreq = postings.groupBy("term").agg(F.count("*").alias("df"))
    idf = dfreq.crossJoin(F.broadcast(tot)).select(
        "term",
        F.floor(
            F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) * 1000.0
            + F.lit(0.5)
        )
        .cast("long")
        .alias("idf_milli"),
    )
    w = postings.join(idf, "term").select(
        "doc_id", "term", (F.col("tf") * F.col("idf_milli")).alias("wt")
    )
    dnorm = w.groupBy("doc_id").agg(
        F.floor(F.sqrt(F.sum(F.col("wt") * F.col("wt")).cast("double")))
        .cast("long")
        .alias("dn")
    )
    qterms = spark.createDataFrame(BM25_QUERIES, "query_id INT, term STRING")
    qw = qterms.join(idf, "term").select(
        "query_id", "term", F.col("idf_milli").alias("qwt")
    )
    qnorm = qw.groupBy("query_id").agg(
        F.floor(F.sqrt(F.sum(F.col("qwt") * F.col("qwt")).cast("double")))
        .cast("long")
        .alias("qn")
    )
    dots = (
        w.join(F.broadcast(qw), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qwt") * F.col("wt")).alias("dot"))
    )
    cos = (
        dots.join(F.broadcast(qnorm), "query_id")
        .join(dnorm, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.expr(f"dot * {COS_SCALE} div (qn * dn)").alias("cos_bp"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_bp").desc(), "doc_id"
    )
    return (
        cos.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= COS_TOPK)
        .select(
            "query_id", "doc_id", "cos_bp",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- proximity retrieval ------------------------------------------------------
PROX_TOPK = 10


@query(
    "retrieval_proximity",
    oracle=f"""
    WITH q(query_id, t1, t2) AS (VALUES {_SQL_P_VALUES}),
    pos AS (
      SELECT doc_id, unnest(toks) AS term,
             generate_subscripts(toks, 1) AS pos
      FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
    ),
    m AS (
      SELECT q.query_id, p1.doc_id,
             CAST(min(abs(p1.pos - p2.pos)) AS BIGINT) AS min_dist,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM q
      JOIN pos p1 ON p1.term = q.t1
      JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.term = q.t2
      GROUP BY 1, 2
    )
    SELECT query_id, doc_id, min_dist, n_pairs, CAST(rnk AS INT) AS rank
    FROM (
      SELECT query_id, doc_id, min_dist, n_pairs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY min_dist, doc_id) AS rnk
      FROM m
    ) WHERE rnk <= {PROX_TOPK}
    """,
)
def retrieval_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval over the positional index: for each two-term
    query, rank documents containing BOTH terms by the minimum token
    distance between any occurrence pair (1 = adjacent — the relaxation
    of retrieval_phrase_match's exact-adjacency join, the "terms near
    each other" operator behind NEAR/k and passage windows).

    Same scale shape as the phrase operator: the broadcast probe prunes
    the positional postings to the query terms before any join, the
    per-doc occurrence-pair join is bounded by tf1 x tf2 within a doc
    (cap the per-doc tf of probe terms at ingest if an adversarial doc
    repeats a term thousands of times), and candidates are only docs
    containing both terms, so the final top-k window is small."""
    q = spark.createDataFrame(
        PHRASE_QUERIES, "query_id INT, t1 STRING, t2 STRING"
    )
    pq = _positions_probed(spark, sf_dir)
    p1 = pq.alias("p1").join(F.broadcast(q), F.col("p1.term") == F.col("t1"))
    p2 = pq.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("pos2"),
        F.col("term").alias("term2"),
    )
    m = (
        p1.join(
            p2,
            (F.col("p1.doc_id") == F.col("d2"))
            & (F.col("term2") == F.col("t2")),
        )
        .groupBy("query_id", F.col("p1.doc_id").alias("doc_id"))
        .agg(
            F.min(F.abs(F.col("p1.pos") - F.col("pos2")))
            .cast("long")
            .alias("min_dist"),
            F.count("*").cast("long").alias("n_pairs"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("min_dist", "doc_id")
    return (
        m.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PROX_TOPK)
        .select(
            "query_id", "doc_id", "min_dist", "n_pairs",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- reciprocal-rank fusion + NDCG evaluation --------------------------------
RRF_K = 60  # the standard smoothing constant (Cormack et al., SIGIR 2009)
NDCG_K = 10
# 1/log2(rank+1) discounts in integer micro-units for ranks 1..NDCG_K,
# precomputed HERE (the graph module's AA_WEIGHTS pattern) so neither
# engine runs a runtime log2 whose last ulp could differ.
import math as _math  # noqa: E402  (module-local, mirrors graph.py)

NDCG_DISC: list[tuple[int, int]] = [
    (r, int(_math.floor(1_000_000.0 / _math.log2(r + 1) + 0.5)))
    for r in range(1, NDCG_K + 1)
]
_SQL_DISC_VALUES = ", ".join(f"({r}, {d})" for r, d in NDCG_DISC)


# The fusion oracle embeds the two registered ranking oracles VERBATIM
# as parenthesized WITH-subqueries, so the fused lists are by
# construction the exact rankings the standalone queries verify.
from pyspark_text_classification_spark.registry import (  # noqa: E402
    ORACLES as _ORACLES,
)

_SQL_RRF = f"""
    WITH fused AS (
      SELECT COALESCE(b.query_id, c.query_id) AS query_id,
             COALESCE(b.doc_id, c.doc_id) AS doc_id,
             COALESCE(1000000 // ({RRF_K} + b.rank), 0)
               + COALESCE(1000000 // ({RRF_K} + c.rank), 0) AS rrf_micro
      FROM ({_ORACLES["retrieval_bm25_topk"]}) b
      FULL JOIN ({_ORACLES["retrieval_tfidf_cosine"]}) c
        ON b.query_id = c.query_id AND b.doc_id = c.doc_id
    )
    SELECT query_id, doc_id, rrf_micro, CAST(rnk AS INT) AS fused_rank
    FROM (
      SELECT query_id, doc_id, rrf_micro,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_micro DESC, doc_id) AS rnk
      FROM fused
    )
    """


@query("retrieval_rrf_fusion", oracle=_SQL_RRF)
def retrieval_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of the BM25 and tf-idf-cosine top-{BM25_TOPK} lists: score(d) =
    sum over lists of 1/(k + rank_d), k = {RRF_K}, in integer
    micro-units (1e6 // (k + rank) — exact, positive, identical
    truncation both engines) — the standard hybrid-retrieval combiner
    a RAG/training-data stack runs over lexical + vector rankers.

    Both input rankings are the registered rankers' session-cached
    top-k lists (value-identical by construction to re-invoking the
    registered queries — same builder, same tiebreaks; see
    _bm25_topk_list); the fusion itself is one full-outer join on
    (query_id, doc_id) of two <= {BM25_TOPK}-row-per-query lists and a
    bounded per-query re-rank — negligible atop the underlying
    retrieval cost at any scale, since fusion only ever sees the top-k
    survivors, never the corpus."""
    bm = _bm25_topk_list(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("b_rank")
    )
    cs = _tfidf_topk_list(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("c_rank")
    )
    fused = bm.join(cs, ["query_id", "doc_id"], "full").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(
                F.expr(f"1000000 div ({RRF_K} + b_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"1000000 div ({RRF_K} + c_rank)"), F.lit(0)
            )
        ).alias("rrf_micro"),
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), "doc_id"
    )
    return fused.select(
        "query_id",
        "doc_id",
        "rrf_micro",
        F.row_number().over(wr).cast("int").alias("fused_rank"),
    )


@query(
    "retrieval_ndcg_eval",
    oracle=f"""
    WITH {_SQL_BM25_CTES},
    disc(rnk, dm) AS (VALUES {_SQL_DISC_VALUES}),
    grades AS (
      SELECT q.query_id, p.doc_id,
             CAST(count(DISTINCT q.term) AS BIGINT) AS grade
      FROM q JOIN postings p ON p.term = q.term
      GROUP BY 1, 2
    ),
    dcg AS (
      SELECT t.query_id, CAST(sum(g.grade * d.dm) AS BIGINT) AS dcg_micro
      FROM topk t
      JOIN grades g ON g.query_id = t.query_id AND g.doc_id = t.doc_id
      JOIN disc d ON d.rnk = t.rnk
      GROUP BY 1
    ),
    ideal AS (
      SELECT query_id, grade,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY grade DESC, doc_id) AS irk
      FROM grades
    ),
    idcg AS (
      SELECT query_id, CAST(sum(grade * d.dm) AS BIGINT) AS idcg_micro
      FROM ideal JOIN disc d ON d.rnk = ideal.irk
      WHERE irk <= {NDCG_K}
      GROUP BY 1
    )
    SELECT dcg.query_id, dcg.dcg_micro, idcg.idcg_micro,
           dcg.dcg_micro * 1000000 // idcg.idcg_micro AS ndcg_micro
    FROM dcg JOIN idcg ON idcg.query_id = dcg.query_id
    """,
)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{NDCG_K} (Jarvelin & Kekalainen, TOIS 2002) of the BM25
    ranking against graded pseudo-relevance: grade(q, d) = number of
    distinct query terms present in d (0..3) — the self-contained
    judgment a pipeline uses to regression-test its ranker when no
    human qrels exist.

    The 1/log2(rank+1) discounts are a {NDCG_K}-row literal table
    precomputed in Python (micro-units) so no engine-side log2 ever
    runs; DCG joins the discount table to the ranking, IDCG to the
    ideal (grade desc) ordering — ties in grade don't affect the IDCG
    sum, so the doc_id tiebreak is purely for determinism of the
    intermediate.  All sums/divisions integer.  Scale: grades are a
    broadcast-probe aggregate (only postings of query terms), both DCG
    terms are <= {NDCG_K} rows per query.  The ranking under evaluation
    is the BM25 ranker's session-cached top-k list (_bm25_topk_list) —
    an evaluator reads the ranker's served answers, it does not re-run
    retrieval; rows are value-identical to the rebuilt chain."""
    postings = _postings(spark, sf_dir)
    qterms = spark.createDataFrame(BM25_QUERIES, "query_id INT, term STRING")
    topk = _bm25_topk_list(spark, sf_dir).select(
        "query_id", "doc_id", "rank"
    )
    grades = (
        postings.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").alias("grade"))
    )
    disc = spark.createDataFrame(NDCG_DISC, "rnk INT, dm BIGINT")
    dcg = (
        topk.join(grades, ["query_id", "doc_id"])
        .join(F.broadcast(disc), topk.rank == disc.rnk)
        .groupBy("query_id")
        .agg(F.sum(F.col("grade") * F.col("dm")).alias("dcg_micro"))
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.col("grade").desc(), "doc_id"
    )
    ideal = grades.withColumn("irk", F.row_number().over(wi)).filter(
        F.col("irk") <= NDCG_K
    )
    idcg = (
        ideal.join(F.broadcast(disc), ideal.irk == disc.rnk)
        .groupBy("query_id")
        .agg(F.sum(F.col("grade") * F.col("dm")).alias("idcg_micro"))
    )
    return (
        dcg.join(idcg, "query_id")
        .selectExpr(
            "query_id",
            "CAST(dcg_micro AS BIGINT) AS dcg_micro",
            "CAST(idcg_micro AS BIGINT) AS idcg_micro",
            "CAST(dcg_micro * 1000000 div idcg_micro AS BIGINT)"
            " AS ndcg_micro",
        )
    )
