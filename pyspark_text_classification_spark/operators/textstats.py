"""Text-analysis operators: quality scoring, language ID, token counting,
document fingerprinting (extension surface, SURVEY.md §7.2 layer 7 —
generalizing the reference's lone text statistic, the describe() at
qnli_test.py:117-118).

All four are single-pass, zero-join, zero-UDF column programs: they scan the
documents table once, stay inside whole-stage codegen, and aggregate at most
by doc_id — the shape that scales linearly to 100 TB with no shuffle other
than the (doc_id-local) explode/groupBy of the fingerprint.
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
    ENGLISH_STOPWORDS,
    round_half_up,
    sql_round_half_up,
    sql_string_list,
    tokenize,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

_SQL_TOKENS = r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"
_STOPWORD_SQL = sql_string_list(ENGLISH_STOPWORDS)

# tiny per-language function-word lists for the n-gram/stopword-hit
# language heuristic (deterministic, embedded on both engines)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "eine", "mit", "von"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "es": ["el", "la", "los", "las", "que", "de", "un", "una", "es", "por"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
}


# shared with the streaming twin (streaming/quality.py), which wraps it in
# a WHERE on the score
QUALITY_ORACLE_SQL = f"""
    WITH t AS (
      SELECT doc_id, length(text) AS n_chars_obs, {_SQL_TOKENS} AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_chars_obs,
             CAST(length(toks) AS BIGINT) AS n_tokens,
             CAST(length(list_filter(toks, x -> x IN ({_STOPWORD_SQL})))
                  AS BIGINT) AS n_stop,
             CAST(list_sum(list_prepend(0, list_transform(toks, x -> length(x))))
                  AS BIGINT) AS tok_chars
      FROM t
    )
    SELECT doc_id, n_tokens,
           {sql_round_half_up('CASE WHEN n_tokens > 0 THEN tok_chars / n_tokens ELSE 0.0 END', 4)} AS avg_token_len,
           {sql_round_half_up('CASE WHEN n_tokens > 0 THEN n_stop / n_tokens ELSE 0.0 END', 4)} AS stopword_ratio,
           {sql_round_half_up(
               'CASE WHEN n_tokens >= 100 THEN 1.0 ELSE n_tokens / 100.0 END'
               ' * (CASE WHEN n_tokens > 0 THEN 1.0 - n_stop / n_tokens ELSE 0.0 END)', 4)} AS quality_score
    FROM s
    """


@query("text_quality", oracle=QUALITY_ORACLE_SQL)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality heuristics: token count, mean token length,
    stopword ratio, and a composite score (length saturation x content
    ratio) — the length/punct/stopword family of pre-training filters."""
    return quality_stats(fan_out(load_table(spark, sf_dir, "documents")))


def quality_stats(docs: DataFrame) -> DataFrame:
    """The text_quality column program as a reusable (batch OR streaming —
    it is stateless) transformation over a (doc_id, text) frame."""
    toks = tokenize("text", 2)
    t = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        # IN-set lookup (Catalyst OptimizeIn -> InSet hash set), not
        # array_contains against a literal array — see remove_stopwords
        F.size(F.filter(toks, lambda x: x.isin(*ENGLISH_STOPWORDS)))
        .cast("long")
        .alias("n_stop"),
        F.aggregate(
            F.transform(toks, F.length), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("tok_chars"),
    )
    nt, ns = F.col("n_tokens"), F.col("n_stop")
    content = F.when(nt > 0, 1.0 - ns / nt).otherwise(0.0)
    length_sat = F.when(nt >= 100, 1.0).otherwise(nt / F.lit(100.0))
    return t.select(
        "doc_id",
        "n_tokens",
        round_half_up(F.when(nt > 0, F.col("tok_chars") / nt).otherwise(0.0), 4).alias(
            "avg_token_len"
        ),
        round_half_up(F.when(nt > 0, ns / nt).otherwise(0.0), 4).alias(
            "stopword_ratio"
        ),
        round_half_up(length_sat * content, 4).alias("quality_score"),
    )


def _lang_hits_sql(lang: str) -> str:
    return (
        f"length(list_filter(list_distinct({_SQL_TOKENS}), "
        f"x -> x IN ({sql_string_list(LANG_MARKERS[lang])})))"
    )


@query(
    "text_langid",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             {_lang_hits_sql('de')} AS h_de,
             {_lang_hits_sql('en')} AS h_en,
             {_lang_hits_sql('es')} AS h_es,
             {_lang_hits_sql('fr')} AS h_fr,
             regexp_matches(text, '[\\x{{4e00}}-\\x{{9fff}}]') AS has_cjk
      FROM documents
    )
    SELECT doc_id,
           CASE
             WHEN has_cjk THEN 'zh'
             WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
             WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
             WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
             WHEN h_es >= h_fr THEN 'es'
             ELSE 'fr'
           END AS pred_lang
    FROM h
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-word-hit language heuristic (de/en/es/fr + CJK-script zh,
    'und' when no marker hits). Ties resolve alphabetically via the
    ordered CASE — identical on both engines."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.array_distinct(tokenize("text", 2))

    def hits(lang: str):
        return F.size(F.filter(toks, lambda x: x.isin(*LANG_MARKERS[lang])))

    h = docs.select(
        "doc_id",
        hits("de").alias("h_de"),
        hits("en").alias("h_en"),
        hits("es").alias("h_es"),
        hits("fr").alias("h_fr"),
        (F.regexp_count("text", F.lit(r"[一-鿿]")) > 0).alias("has_cjk"),
    )
    de, en, es, fr = (F.col(c) for c in ["h_de", "h_en", "h_es", "h_fr"])
    return h.select(
        "doc_id",
        F.when(F.col("has_cjk"), "zh")
        .when((de == 0) & (en == 0) & (es == 0) & (fr == 0), "und")
        .when((de >= en) & (de >= es) & (de >= fr), "de")
        .when((en >= es) & (en >= fr), "en")
        .when(es >= fr, "es")
        .otherwise("fr")
        .alias("pred_lang"),
    )


@query(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
           CAST(length(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish pre-token
    regex (letter runs | digit runs | single punctuation) — the standard
    cheap proxy pair for LLM token budgeting."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"\S+")).cast("long").alias("ws_tokens"),
        F.regexp_count(F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


_FP_P1 = 1_000_003  # position-coupling prime


@query(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(toks) + 1),
               i -> ((i * {_FP_P1}) % {HASH_MOD})
                    * {sql_char_poly_hash('toks[i]')} % {HASH_MOD})))
             % {HASH_MOD} AS BIGINT) AS fingerprint
    FROM t
    WHERE length(toks) > 0
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint:
    sum_i ((i * P1 mod p) * h(tok_i) mod p) mod p over 1-based positions —
    a rolling-hash-style signature where swapping two tokens changes the
    value, unlike a bag-of-words hash. Pure 64-bit int arithmetic ->
    bit-exact across engines."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(tokenize("text", 2)).alias("pos", "token")
    )
    contrib = (
        ((F.col("pos") + 1) * _FP_P1) % HASH_MOD * char_poly_hash("token")
    ) % HASH_MOD
    return (
        toks.groupBy("doc_id")
        .agg((F.sum(contrib) % HASH_MOD).cast("long").alias("fingerprint"))
    )


@query(
    "text_readability",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id,
             {_SQL_TOKENS} AS toks,
             greatest(length(list_filter(str_split_regex(text, '[.!?]+'),
                                         s -> trim(s) != '')), 1) AS n_sent
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_sent,
             greatest(length(toks), 1) AS n_words,
             greatest(list_sum(list_prepend(CAST(0 AS BIGINT),
               list_transform(toks, w -> CAST(greatest(
                 length(regexp_extract_all(w, '[aeiouy]+')), 1) AS BIGINT)))),
               1) AS n_syll
      FROM t
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sent AS BIGINT) AS n_sentences,
           CAST(n_syll AS BIGINT) AS n_syllables,
           {sql_round_half_up(
               '206.835 - 1.015 * (n_words / n_sent)'
               ' - 84.6 * (n_syll / n_words)', 4)} AS flesch
    FROM s
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a deterministic
    vowel-run syllable heuristic (min 1 per word) — the classic cheap
    readability filter for pre-training corpora. Sentences = non-empty
    [.!?] segments (min 1). Pure expressions, one pass, no shuffle."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = tokenize("text", 2)
    n_sent = F.greatest(
        F.size(
            F.filter(
                F.split("text", r"[.!?]+"), lambda s: F.trim(s) != ""
            )
        ),
        F.lit(1),
    )
    syll = F.aggregate(
        F.transform(
            toks,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    t = docs.select(
        "doc_id",
        F.greatest(F.size(toks), F.lit(1)).cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        F.greatest(syll, F.lit(1)).cast("long").alias("n_syllables"),
    )
    return t.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        round_half_up(
            F.lit(206.835)
            - F.lit(1.015) * (F.col("n_words") / F.col("n_sentences"))
            - F.lit(84.6) * (F.col("n_syllables") / F.col("n_words")),
            4,
        ).alias("flesch"),
    )


@query(
    "text_entropy",
    oracle=f"""
    WITH chars AS (
      SELECT doc_id, unnest(string_split(text, '')) AS ch
      FROM documents WHERE length(text) > 0
    ),
    counts AS (
      SELECT doc_id, ch, count(*) AS n FROM chars GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(sum(n) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS nd,
             list(n ORDER BY n) AS ns
      FROM counts GROUP BY doc_id
    )
    SELECT doc_id,
           total AS n_chars_total,
           nd AS n_distinct_chars,
           {sql_round_half_up(
               '-list_reduce(list_prepend(0.0, list_transform('
               'ns, n -> (n / total) * log2(n / total))), '
               '(acc, x) -> acc + x)', 4)} AS entropy
    FROM per_doc
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap randomness
    signal that flags binary junk (high) and boilerplate/repetition (low)
    in pre-training corpora.

    Two hash aggregates, no join: (doc, char) counts (whose map-side
    partial aggregation already shrinks the shuffle to one row per
    DISTINCT char per doc — each doc's exploded chars never leave their
    partition), then one per-doc aggregate collecting the ~O(alphabet)
    count list. The entropy sum is a sequential fold over the SORTED
    count list on both engines — equal counts contribute identical
    terms, so the fold order is fully deterministic and the doubles are
    bit-equal before rounding (no reliance on rounding to absorb
    float-associativity noise)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    chars = docs.filter(F.length("text") > 0).select(
        "doc_id",
        F.explode(F.filter(F.split("text", ""), lambda c: c != "")).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("n"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("n").alias("total"),
        F.count("*").alias("nd"),
        F.sort_array(F.collect_list("n")).alias("ns"),
    )
    p_term = lambda n: (n / F.col("total")) * F.log2(n / F.col("total"))  # noqa: E731
    ent = -F.aggregate(
        F.col("ns"), F.lit(0.0), lambda acc, n: acc + p_term(n)
    )
    return per_doc.select(
        "doc_id",
        F.col("total").cast("long").alias("n_chars_total"),
        F.col("nd").cast("long").alias("n_distinct_chars"),
        round_half_up(ent, 4).alias("entropy"),
    )


MIN_PAIR_COUNT = 5  # collocation min support


@query(
    "text_collocations_pmi",
    oracle=f"""
    WITH t AS (SELECT {_SQL_TOKENS} AS toks FROM documents),
    uni AS (
      SELECT w, count(*) AS n_w
      FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w
    ),
    bg AS (
      SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS n_pair
      FROM (SELECT unnest(list_transform(range(1, length(toks)),
                   i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS bg
            FROM t WHERE length(toks) >= 2)
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT CAST((SELECT sum(n_w) FROM uni) AS DOUBLE) AS n1,
             CAST((SELECT sum(n_pair) FROM bg) AS DOUBLE) AS n2
    )
    SELECT b.w1, b.w2, CAST(b.n_pair AS BIGINT) AS n_pair,
           {sql_round_half_up(
               'log2((b.n_pair / t.n2) / ((a.n_w / t.n1) * (c.n_w / t.n1)))', 4
           )} AS pmi
    FROM bg b
    JOIN uni a ON a.w = b.w1
    JOIN uni c ON c.w = b.w2
    CROSS JOIN tot t
    WHERE b.n_pair >= {MIN_PAIR_COUNT}
    """,
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram collocations scored by pointwise mutual
    information: PMI(w1,w2) = log2(p(w1,w2) / (p(w1) p(w2))) (Church &
    Hanks 1990), with min support to kill noise pairs.

    Scale shape: unigram and bigram counts are vocabulary-bounded hash
    aggregates with map-side partials; the scoring joins broadcast the
    unigram table (bounded by vocabulary, not corpus) and the two scalar
    totals, so nothing re-shuffles the corpus. The bigram stream comes
    from an in-row zip of each token array with its own tail — no
    self-join on position. PMI itself is a pure scalar expression over
    exactly-representable integer counts, so both engines compute
    bit-identical doubles before rounding."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = docs.select(tokenize("text", 2).alias("toks"))
    uni = (
        t.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n_w"))
    )
    bg = (
        t.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(toks, 1, size(toks) - 1), "
                    "slice(toks, 2, size(toks) - 1), "
                    "(a, b) -> named_struct('w1', a, 'w2', b))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= MIN_PAIR_COUNT)
    )
    tot = uni.agg(F.sum("n_w").cast("double").alias("n1")).crossJoin(
        t.filter(F.size("toks") >= 2)
        .select((F.size("toks") - 1).alias("k"))
        .agg(F.sum("k").cast("double").alias("n2"))
    )
    a = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a"))
    c = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_c"))
    pmi = F.log2(
        (F.col("n_pair") / F.col("n2"))
        / ((F.col("n_a") / F.col("n1")) * (F.col("n_c") / F.col("n1")))
    )
    return (
        bg.join(F.broadcast(a), "w1")
        .join(F.broadcast(c), "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "n_pair", round_half_up(pmi, 4).alias("pmi"))
    )


@query(
    "text_repetition",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ),
    g AS (
      SELECT doc_id, CAST(length(toks) AS BIGINT) AS n_tokens,
             CASE WHEN length(toks) >= 3 THEN
               list_transform(range(1, length(toks) - 1),
                 i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])
             ELSE CAST([] AS VARCHAR[]) END AS tri
      FROM t
    )
    SELECT doc_id, n_tokens,
           CAST(length(tri) AS BIGINT) AS n_trigrams,
           {sql_round_half_up(
               'CASE WHEN length(tri) > 0 THEN '
               '(length(tri) - length(list_distinct(tri))) / length(tri) '
               'ELSE 0.0 END', 4)} AS dup_trigram_ratio
    FROM g
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signal: fraction of word 3-grams that
    are duplicates of an earlier 3-gram in the SAME document — the
    standard boilerplate/degenerate-text filter for pre-training corpora
    (repeated headers, chorus-like loops, template spam score high).

    Entirely in-row (tokenize -> trigram build -> distinct-count inside
    one projection): zero joins, zero shuffles, zero Python — the scan
    stays inside whole-stage codegen and scales embarrassingly to 100 TB.
    Contrast with dedup_ngram_jaccard (operators/dedup.py), which
    compares n-grams ACROSS documents and must shuffle."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = docs.select("doc_id", tokenize("text", 2).alias("toks"))
    n = F.size("toks")
    tri = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
                F.element_at(F.col("toks"), i + 3),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = t.select("doc_id", n.cast("long").alias("n_tokens"), tri.alias("tri"))
    n_tri = F.size("tri")
    ratio = F.when(
        n_tri > 0,
        (n_tri - F.size(F.array_distinct("tri"))) / n_tri.cast("double"),
    ).otherwise(F.lit(0.0))
    return g.select(
        "doc_id",
        "n_tokens",
        n_tri.cast("long").alias("n_trigrams"),
        round_half_up(ratio, 4).alias("dup_trigram_ratio"),
    )


LP_SCALE = 1_000_000  # micro-nat quantization for order-independent sums


@query(
    "text_lm_logprob",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY token
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c
    ),
    lp AS (
      SELECT token,
             CAST(floor(ln(CAST(cnt AS DOUBLE) / t.total) * {LP_SCALE}.0 + 0.5)
                  AS BIGINT) AS lp_q
      FROM c CROSS JOIN tot t
    ),
    d AS (
      SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(lp.lp_q) AS BIGINT) AS sum_q
      FROM ex e JOIN lp USING (token) GROUP BY e.doc_id
    )
    SELECT doc_id, n_tokens,
           {sql_round_half_up(
               f'CAST(sum_q AS DOUBLE) / ({LP_SCALE}.0 * n_tokens)', 4)}
             AS mean_logprob,
           {sql_round_half_up(
               f'exp(-(CAST(sum_q AS DOUBLE) / ({LP_SCALE}.0 * n_tokens)))', 4)}
             AS perplexity
    FROM d
    """,
)
def text_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: fit token log-probabilities on
    the corpus itself, then score each document by its mean token log-prob
    (and the equivalent unigram perplexity).  This is the cheap end of the
    perplexity-filter family used for pre-training data curation (CCNet /
    Wenzek 2020 score documents with a KenLM n-gram model; the unigram
    case needs no external model and is fully relational).

    Scale shape: the token-count "model fit" is a vocabulary-bounded hash
    aggregate with map-side partials; the scalar corpus total broadcasts;
    scoring re-joins log-probs onto the exploded corpus via a BROADCAST
    hash join (the model table is vocabulary-sized, never corpus-sized),
    so the only data-sized shuffle is the final per-doc aggregate.

    Determinism: per-token log-probs are quantized to integer micro-nats
    BEFORE the per-doc sum, so the double summation order (which differs
    between Spark hash aggregates and DuckDB) cannot perturb the result —
    the same int64-quantization discipline as the LSH plane dots
    (operators/similarity.py) and the entropy fold.

    Docs with zero tokens after the min-length-2 tokenizer have no rows to
    score and are absent from the output on both engines."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ex = docs.select("doc_id", F.explode(tokenize("text", 2)).alias("token"))
    c = ex.groupBy("token").agg(F.count("*").alias("cnt"))
    tot = c.agg(F.sum("cnt").cast("double").alias("total"))
    lp = c.crossJoin(F.broadcast(tot)).select(
        "token",
        F.floor(F.log(F.col("cnt").cast("double") / F.col("total")) * LP_SCALE + 0.5)
        .cast("long")
        .alias("lp_q"),
    )
    d = (
        ex.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("lp_q").cast("long").alias("sum_q"),
        )
    )
    mean_lp = F.col("sum_q").cast("double") / (F.lit(float(LP_SCALE)) * F.col("n_tokens"))
    return d.select(
        "doc_id",
        "n_tokens",
        round_half_up(mean_lp, 4).alias("mean_logprob"),
        round_half_up(F.exp(-mean_lp), 4).alias("perplexity"),
    )


TOP_TOKENS_K = 10


@query(
    "text_top_tokens_by_lang",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    counts AS (
      SELECT lang, token, CAST(count(*) AS BIGINT) AS n
      FROM toks GROUP BY 1, 2
    )
    SELECT lang, token, n, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT lang, token, n,
             row_number() OVER (
               PARTITION BY lang ORDER BY n DESC, token) AS rnk
      FROM counts
    ) WHERE rnk <= {TOP_TOKENS_K}
    """,
)
def text_top_tokens_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k heavy hitters: the {TOP_TOKENS_K} most frequent
    tokens per language (corpus-drift / vocabulary dashboards).

    Two-stage shape that survives skewed groups: the (lang, token) count
    aggregate does the heavy lifting WITH map-side partial aggregation —
    the shuffle carries one row per distinct (lang, token), not per token
    occurrence — and the top-k window then runs over that vocabulary-
    bounded table (O(langs x vocab) rows), where the tiny lang partition
    count no longer matters. Ties break on the token string so the rank
    is total and oracle-checkable."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    counts = (
        docs.select("lang", F.explode(tokenize("text", 2)).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "token")
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_TOKENS_K)
        .select("lang", "token", "n", "rnk")
    )


ZIPF_SCALE = 1_000  # milli-nat quantization: x*y products stay in int64
                    # for vocabularies up to ~10^8 distinct tokens


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
      GROUP BY token
    ),
    r AS (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      FROM c
    ),
    q AS (
      SELECT CAST(floor(ln(CAST(rnk AS DOUBLE)) * {ZIPF_SCALE}.0 + 0.5)
                  AS BIGINT) AS x,
             CAST(floor(ln(CAST(cnt AS DOUBLE)) * {ZIPF_SCALE}.0 + 0.5)
                  AS BIGINT) AS y
      FROM r
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(x * y) AS DOUBLE) AS sxy,
             CAST(sum(x * x) AS DOUBLE) AS sxx
      FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_vocab,
           {sql_round_half_up(
               '(n * sxy - sx * sy) / (n * sxx - sx * sx)', 4)} AS zipf_slope,
           {sql_round_half_up(
               '(sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)'
               f' / (n * {ZIPF_SCALE}.0)', 4)} AS zipf_intercept
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: least-squares slope and
    intercept of ln(frequency) against ln(rank).  Natural text sits near
    slope -1 (Zipf 1949); large deviations flag template spam, scraped
    boilerplate, or tokenizer failure — a one-row corpus health check.

    The regression is pure aggregation — no driver-side math: the token
    count is the usual vocabulary-bounded hash aggregate, the rank is one
    window over the vocabulary table (vocabulary-sized, NOT corpus-sized;
    the corpus itself never re-shuffles), and the five regression moments
    (n, Σx, Σy, Σxy, Σx²) reduce in one pass.  ln values are quantized to
    integer milli-nats before the moment sums so the sums are order-
    independent; the closed-form slope then runs on exactly-representable
    integers cast to double — the identical IEEE op sequence on both
    engines.  The slope is scale-invariant in the quantization; the
    intercept divides it back out."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    c = (
        docs.select(F.explode(tokenize("text", 2)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), "token")
    r = c.withColumn("rnk", F.row_number().over(w))
    q = r.select(
        F.floor(F.log(F.col("rnk").cast("double")) * ZIPF_SCALE + 0.5)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * ZIPF_SCALE + 0.5)
        .cast("long")
        .alias("y"),
    )
    # Moment accumulation convention (ml_auc_rank pattern): factors cast
    # to DECIMAL(19,0) so the x*y product is DECIMAL(38,0) and the sum is
    # exact at any vocabulary size (int64 sums of ~1.7e9 products wrap
    # near 5e9 vocab terms); DuckDB's sum promotes to HUGEINT natively.
    # The final double cast rounds the same exact integer on both engines.
    d19 = "decimal(19,0)"
    s = q.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast(d19)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d19)).cast("double").alias("sy"),
        F.sum(F.col("x").cast(d19) * F.col("y").cast(d19))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("x").cast(d19) * F.col("x").cast(d19))
        .cast("double")
        .alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("long").alias("n_vocab"),
        round_half_up(slope, 4).alias("zipf_slope"),
        round_half_up((sy - slope * sx) / (n * F.lit(float(ZIPF_SCALE))), 4).alias(
            "zipf_intercept"
        ),
    )


KL_SCALE = 1_000_000  # micro-nat quantization of per-token KL terms


@query(
    "text_kl_drift",
    oracle=f"""
    WITH ex AS (
      SELECT source, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    sc AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS cnt_s
      FROM ex GROUP BY 1, 2
    ),
    st AS (
      SELECT source, CAST(sum(cnt_s) AS DOUBLE) AS tot_s FROM sc GROUP BY 1
    ),
    c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY 1
    ),
    t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM c),
    terms AS (
      SELECT sc.source,
             CAST(floor(
               (CAST(cnt_s AS DOUBLE) / st.tot_s)
               * ln((CAST(cnt_s AS DOUBLE) / st.tot_s)
                    / (CAST(cnt AS DOUBLE) / t.tot))
               * {KL_SCALE}.0 + 0.5) AS BIGINT) AS kq
      FROM sc
      JOIN st USING (source)
      JOIN c USING (token)
      CROSS JOIN t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_distinct_tokens,
           {sql_round_half_up(
               f'CAST(sum(kq) AS DOUBLE) / {KL_SCALE}.0', 4)} AS kl_nats
    FROM terms GROUP BY source
    """,
)
def text_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per source, the KL divergence between
    that source's token distribution and the whole-corpus distribution —
    the statistic drift dashboards alarm on when a feed's content shifts
    (KL ~ 0: the source looks like the corpus; large: it diverged).

    Scale shape: the corpus explodes ONCE into two vocabulary-bounded
    hash aggregates (per-source counts: sources x vocab rows; global
    counts: vocab rows); every downstream join is over those bounded
    tables — the global count table and the scalar total BROADCAST onto
    the per-source table, and the corpus never re-shuffles. Per-token KL
    terms quantize to integer micro-nats before the per-source sum (the
    order-independence discipline shared with text_lm_logprob); the term
    expression is written with identical parenthesization on both
    engines, so the pre-quantization doubles are bit-equal."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ex = docs.select("source", F.explode(tokenize("text", 2)).alias("token"))
    sc = ex.groupBy("source", "token").agg(F.count("*").alias("cnt_s"))
    return kl_from_source_token_counts(sc)


def kl_from_source_token_counts(sc: DataFrame) -> DataFrame:
    """KL finisher over a (source, token, cnt_s) count table — shared by
    the batch query above and the streaming twin
    (streaming/drift.py), whose complete-mode aggregate drains to exactly
    this table. Everything here is vocabulary-bounded: the corpus-sized
    explode already happened upstream."""
    st = sc.groupBy("source").agg(F.sum("cnt_s").cast("double").alias("tot_s"))
    c = sc.groupBy("token").agg(F.sum("cnt_s").alias("cnt"))
    t = c.agg(F.sum("cnt").cast("double").alias("tot"))
    ps = F.col("cnt_s").cast("double") / F.col("tot_s")
    q = F.col("cnt").cast("double") / F.col("tot")
    terms = (
        sc.join(F.broadcast(st), "source")
        .join(F.broadcast(c), "token")
        .crossJoin(F.broadcast(t))
        .select(
            "source",
            F.floor(ps * F.log(ps / q) * KL_SCALE + F.lit(0.5))
            .cast("long")
            .alias("kq"),
        )
    )
    return terms.groupBy("source").agg(
        F.count("*").alias("n_distinct_tokens"),
        round_half_up(
            F.sum("kq").cast("double") / F.lit(float(KL_SCALE)), 4
        ).alias("kl_nats"),
    )


@query(
    "text_lexical_diversity",
    oracle=f"""
    WITH ex AS (
      SELECT source, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    tc AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS cnt
      FROM ex GROUP BY 1, 2
    )
    SELECT source,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) FILTER (cnt = 1) AS BIGINT) AS n_hapax,
           {sql_round_half_up(
               'CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)', 4)}
             AS ttr,
           {sql_round_half_up(
               'CAST(count(*) FILTER (cnt = 1) AS DOUBLE)'
               ' / CAST(count(*) AS DOUBLE)', 4)} AS hapax_share
    FROM tc GROUP BY 1
    """,
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical-diversity profile: type-token ratio and hapax
    share — the cheap corpus-health signals that expose boilerplate
    floods (TTR collapses) and OCR/garbage feeds (hapax share spikes),
    complementing the Zipf fit (text_zipf_fit) with per-source
    resolution.

    One corpus explode into a (source, token)-bounded count table, then a
    vocabulary-bounded summary — identical scale shape to the KL drift
    monitor, with which it shares the first aggregate at 100 TB."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ex = docs.select("source", F.explode(tokenize("text", 2)).alias("token"))
    tc = ex.groupBy("source", "token").agg(F.count("*").alias("cnt"))
    hapax = (F.col("cnt") == 1).cast("long")
    return tc.groupBy("source").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(hapax).alias("n_hapax"),
        round_half_up(
            F.count("*").cast("double") / F.sum("cnt").cast("double"), 4
        ).alias("ttr"),
        round_half_up(
            F.sum(hapax).cast("double") / F.count("*").cast("double"), 4
        ).alias("hapax_share"),
    )


@query(
    "pipeline_dataset_card",
    oracle=f"""
    WITH q AS ({QUALITY_ORACLE_SQL}),
    d AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts
      FROM documents
    ),
    s AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             CAST(sum(CAST(floor(quality_score * 10000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS q_x4_sum,
             CAST(count(*) AS BIGINT) AS n
      FROM q
    )
    SELECT d.n_docs, d.n_sources, d.n_langs, d.n_distinct_texts,
           d.n_docs - d.n_distinct_texts AS n_exact_dups,
           s.total_tokens,
           {sql_round_half_up(
               'CAST(s.q_x4_sum AS DOUBLE) / (10000.0 * s.n)', 4)}
             AS mean_quality
    FROM d CROSS JOIN s
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: one row summarizing the corpus for a release —
    document/source/language counts, exact-duplicate count, total token
    budget, and mean quality score — the numbers a dataset README quotes,
    produced by the same engine that computed them.

    Determinism: the mean quality re-quantizes each (already 4-decimal)
    score to an integer BEFORE summing (int64 sums are partition-order-
    free; a distributed avg() of step-valued doubles can flip the
    rounding boundary — the recall_eval lesson institutionalized).  Two
    single-pass aggregates, crossJoined 1-row frames, linear at 100 TB."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    d = docs.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("text").alias("n_distinct_texts"),
    )
    q = quality_stats(docs)
    s = q.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(
            F.floor(F.col("quality_score") * 10000.0 + F.lit(0.5)).cast("long")
        ).alias("q_x4_sum"),
        F.count("*").alias("n"),
    )
    return d.crossJoin(s).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "n_distinct_texts",
        (F.col("n_docs") - F.col("n_distinct_texts")).alias("n_exact_dups"),
        "total_tokens",
        round_half_up(
            F.col("q_x4_sum").cast("double")
            / (F.lit(10000.0) * F.col("n").cast("double")),
            4,
        ).alias("mean_quality"),
    )


BPE_TOP_MERGES = 20


@query(
    "text_bpe_merge_step",
    oracle=f"""
    WITH words AS (
      SELECT unnest({_SQL_TOKENS}) AS w FROM documents
    ),
    wc AS (SELECT w, count(*) AS cnt FROM words GROUP BY 1),
    pc AS (
      SELECT unnest(list_transform(range(1, length(w)),
                    i -> substring(w, CAST(i AS INT), 2))) AS pair,
             cnt
      FROM wc
    )
    SELECT pair, CAST(sum(cnt) AS BIGINT) AS n_occ
    FROM pc GROUP BY 1
    ORDER BY n_occ DESC, pair
    LIMIT {BPE_TOP_MERGES}
    """,
)
def text_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge iteration (Sennrich et al., ACL 2016): count every
    adjacent symbol pair across the corpus (symbols = characters at step
    0) and emit the top merge candidates — the tokenizer-training
    analogue of similarity_kmeans_step's one-Lloyd-iteration contract.
    A driver loop applies the winning merge to the vocabulary and calls
    the step again; each step is this same query shape.

    Scale shape: the corpus collapses to the word VOCABULARY first (the
    text_top_tokens_by_lang heavy-hitter trick) so the only corpus-sized
    shuffle is the word count; pair explosion then runs over vocab-bounded
    data (|vocab| x avg_word_len rows), and the final top-k is TakeOrdered
    on (count desc, pair) — deterministic at the cut line on both
    engines."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    wc = (
        docs.select(F.explode(tokenize("text", 2)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    pairs = F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
    return (
        wc.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), "pair")
        .limit(BPE_TOP_MERGES)
    )


@query(
    "text_domain_mixture",
    oracle=f"""
    WITH g AS (
      SELECT source, lang,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(length({_SQL_TOKENS})) AS BIGINT) AS n_tokens,
             CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY 1, 2
    ),
    t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM g)
    SELECT g.source, g.lang, g.n_docs, g.n_tokens,
           CAST(g.n_tokens * 10000 // t.total_tokens AS BIGINT)
             AS tok_share_bp,
           CAST(g.sum_chars * 1000 // g.n_docs AS BIGINT)
             AS mean_chars_milli
    FROM g CROSS JOIN t
    """,
)
def text_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture report: per (source, lang) cell, the document count,
    token budget, share of the total corpus token budget (basis points),
    and mean document length — the table a pretraining data recipe quotes
    when setting mixture weights (and the input `pipeline_mixture_sample`
    consumes as its target distribution).

    One map-side-combined aggregate over the corpus; the corpus-wide
    token total is then derived FROM the grouped table (|sources| x
    |langs| rows), not from a second corpus pass, and crossJoined back as
    a broadcast 1-row frame.  Shares and means are 64-bit integer
    division — no IEEE rounding anywhere.  At 100 TB: one shuffle,
    carrying one row per (source, lang) per task."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return domain_mixture_frame(docs)


def domain_mixture_frame(docs: DataFrame, checkpoint: bool = True) -> DataFrame:
    """``checkpoint=True`` materializes the |sources| x |langs| rollup
    once before the total is derived from it — WITHOUT it the lazy total
    re-evaluates the whole aggregate, a second corpus scan.  The plan
    contract (tests/test_plans.py) asserts the registered query's final
    plan has NO parquet scan: both join sides must come from the
    checkpointed rollup rows."""
    g = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokenize("text", 2))).cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    if checkpoint:
        g = g.localCheckpoint(eager=True)
    t = g.agg(F.sum("n_tokens").cast("long").alias("total_tokens"))
    return g.crossJoin(F.broadcast(t)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.expr("n_tokens * 10000 div total_tokens").alias("tok_share_bp"),
        F.expr("sum_chars * 1000 div n_docs").alias("mean_chars_milli"),
    )


# --- Full BPE trainer loop (3 unrolled merge iterations) ---------------------
BPE_ITERS = 3


def _sql_bpe_iter(k: int) -> str:
    """CTEs for BPE iteration ``k``: count adjacent symbol pairs over
    state w{k-1}, pick the top merge (count DESC, pair ASC — the
    Sennrich tie-break made deterministic), apply it with the
    same-type VARCHAR fold (see text_bpe_iter3's docstring), and emit
    the new state w{k} plus its corpus-wide symbol count."""
    prev = f"w{k - 1}"
    return f"""
    p{k} AS (
      SELECT u.pair, CAST(sum(cnt) AS BIGINT) AS n_occ
      FROM (
        SELECT cnt,
               unnest(list_transform(range(1, length(syl)),
                 i -> syl[i] || ' ' || syl[i + 1])) AS pair
        FROM (
          SELECT cnt, string_split(syms, ' ') AS syl FROM {prev}
        ) WHERE length(syl) >= 2
      ) u(cnt, pair)
      WHERE u.pair IS NOT NULL
      GROUP BY 1
    ),
    m{k} AS (
      SELECT pair,
             split_part(pair, ' ', 1) AS a,
             split_part(pair, ' ', 2) AS b,
             n_occ
      FROM p{k} ORDER BY n_occ DESC, pair LIMIT 1
    ),
    w{k} AS (
      SELECT list_reduce(
               list_prepend('', string_split({prev}.syms, ' ')),
               (acc, s) -> CASE
                 WHEN acc = '' THEN s
                 WHEN (acc = m{k}.a OR ends_with(acc, ' ' || m{k}.a))
                      AND s = m{k}.b THEN acc || s
                 ELSE acc || ' ' || s END
             ) AS syms,
             cnt
      FROM {prev}, m{k}
    ),
    t{k} AS (
      SELECT CAST(sum(length(string_split(syms, ' ')) * cnt) AS BIGINT)
               AS n_syms
      FROM w{k}
    )"""


@query(
    "text_bpe_iter3",
    oracle=f"""
    WITH words AS (
      SELECT unnest({_SQL_TOKENS}) AS w FROM documents
    ),
    wc AS (SELECT w, count(*) AS cnt FROM words GROUP BY 1),
    w0 AS (
      SELECT array_to_string(
               list_transform(range(1, length(w) + 1),
                 i -> substring(w, CAST(i AS INT), 1)), ' ') AS syms,
             cnt
      FROM wc
    ),
    {','.join(_sql_bpe_iter(k) for k in range(1, BPE_ITERS + 1))}
    {' UNION ALL '.join(
        f'''SELECT CAST({k} AS INT) AS iter, m{k}.a AS merge_a,
            m{k}.b AS merge_b, m{k}.n_occ,
            t{k}.n_syms AS corpus_symbols_after
            FROM m{k}, t{k}'''
        for k in range(1, BPE_ITERS + 1)
    )}
    """,
)
def text_bpe_iter3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full distributed BPE trainer loop (Sennrich et al., ACL 2016),
    {BPE_ITERS} merge iterations unrolled — the tokenizer-training
    companion to similarity_kmeans_iter3's Lloyd loop, turning
    text_bpe_merge_step's single-iteration contract into the actual
    merge-table artifact a tokenizer ships.  Each iteration counts
    adjacent symbol pairs over the current vocabulary segmentation,
    picks the (count DESC, pair ASC) winner, and APPLIES it; the output
    row per iteration carries the chosen merge, its overlap-blind pair
    count (the standard BPE statistic), and the corpus-wide symbol
    count AFTER application — the number that pins the merge
    application itself (non-overlapping left-to-right), not just the
    pair counting.

    Cross-engine merge application without array-typed fold
    accumulators (DuckDB's list_reduce requires acc and element types
    to match): the segmentation state is a SPACE-DELIMITED SYMBOL
    STRING (tokens are [a-z0-9_]+ by the shared tokenizer, so the
    space never collides), and applying merge (a, b) is a plain string
    fold — append ``' ' || s`` normally, but append ``s`` bare when
    the accumulator ends with symbol ``a`` (checked as the suffix
    ``' ' || a``, unambiguous because symbols cannot contain spaces)
    and s = b, which fuses exactly the non-overlapping left-to-right
    occurrences ("aaa" under (a,a) becomes ["aa","a"], and the fused
    "aa" cannot chain because the suffix test then fails).  Both
    engines run the IDENTICAL fold, so the trained table cannot fork.

    Scale shape (the bpe_merge_step contract, looped): the corpus
    collapses to the word vocabulary in ONE corpus-grain shuffle; every
    iteration after that is vocab-bounded (|vocab| rows of delimited
    strings, pair explosion ~|vocab| x avg_len), with the state
    checkpointed per iteration exactly like kmeans_iter3's centroid
    tables so iteration k+1 reads materialized rows instead of
    replaying k jobs.  The merge row is a broadcast 1-row frame."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    wc = (
        docs.select(F.explode(tokenize("text", 2)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    chars = F.expr(
        "array_join(transform(sequence(1, length(w)), "
        "i -> substring(w, i, 1)), ' ')"
    )
    state = wc.select(chars.alias("syms"), "cnt").localCheckpoint(eager=True)
    out_rows = []
    pair_expr = F.expr(
        "CASE WHEN size(syl) >= 2 THEN transform(sequence(1, size(syl) - 1),"
        " i -> concat(element_at(syl, i), ' ', element_at(syl, i + 1)))"
        " ELSE array() END"
    )
    for k in range(1, BPE_ITERS + 1):
        syl = state.select(F.split("syms", " ").alias("syl"), "cnt")
        merge = (
            syl.select(F.explode(pair_expr).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n_occ"))
            .orderBy(F.col("n_occ").desc(), "pair")
            .limit(1)
            .select(
                F.split("pair", " ").getItem(0).alias("a"),
                F.split("pair", " ").getItem(1).alias("b"),
                "n_occ",
            )
        )
        applied = state.crossJoin(F.broadcast(merge)).select(
            F.aggregate(
                F.split("syms", " "),
                F.lit(""),
                lambda acc, s: F.when(acc == "", s)
                .when(
                    (
                        (acc == F.col("a"))
                        | acc.endswith(F.concat(F.lit(" "), F.col("a")))
                    )
                    & (s == F.col("b")),
                    F.concat(acc, s),
                )
                .otherwise(F.concat(acc, F.lit(" "), s)),
            ).alias("syms"),
            "cnt",
            "a",
            "b",
            "n_occ",
        ).localCheckpoint(eager=True)
        row = (
            applied.groupBy("a", "b", "n_occ")
            .agg(
                F.sum(F.size(F.split("syms", " ")) * F.col("cnt"))
                .cast("long")
                .alias("corpus_symbols_after")
            )
            .select(
                F.lit(k).cast("int").alias("iter"),
                F.col("a").alias("merge_a"),
                F.col("b").alias("merge_b"),
                F.col("n_occ"),
                "corpus_symbols_after",
            )
        )
        out_rows.append(row)
        state = applied.select("syms", "cnt")
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out
