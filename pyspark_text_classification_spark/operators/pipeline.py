"""Composite corpus-cleaning pipeline: the operators composed the way a
pre-training data pipeline actually chains them.

quality filter -> exact dedup (canonical keeper) -> kept-corpus stats —
one declarative plan, so Catalyst fuses the stages: the tokenizer
expressions and the quality predicate evaluate in the scan stage, the
dedup is the only wide exchange, and the final projection carries three
scalars per surviving document. At 100 TB this whole pipeline is one
shuffle over (text-hash) plus a map-side quality filter that prunes before
anything moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    char_poly_hash,
    sql_char_poly_hash,
)
from pyspark_text_classification_spark.functions.text import round_half_up, tokenize
from pyspark_text_classification_spark.operators.dedup import (
    _sql_shingle_hashes as _sql_sh,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

MIN_TOKENS = 10

_SQL_TOKENS = r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"


@query(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents
    ),
    q AS (
      SELECT doc_id, text,
             CAST(length(toks) AS BIGINT) AS n_tokens
      FROM t
      WHERE length(toks) >= {MIN_TOKENS}
    ),
    kept AS (
      SELECT min(doc_id) AS doc_id,
             min(n_tokens) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM q GROUP BY text
    )
    SELECT doc_id, n_tokens, n_copies FROM kept
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-filter then exact-dedup the corpus; emit the canonical doc
    (min doc_id per distinct text), its token count, and how many copies
    it absorbed. The quality predicate runs BEFORE the dedup shuffle —
    filtered rows never enter the exchange."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = tokenize("text", 2)
    q = docs.select(
        "doc_id", "text", F.size(toks).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= MIN_TOKENS)
    return q.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_copies"),
    ).select("doc_id", "n_tokens", "n_copies")


SPLIT_PCT = (80, 90)  # train < 80, val < 90, else test


@query(
    "pipeline_hash_split",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source,
             {sql_char_poly_hash('text')} % 100 AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < {SPLIT_PCT[0]} THEN 'train'
                WHEN bucket < {SPLIT_PCT[1]} THEN 'val'
                ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM h
    GROUP BY 1, 2
    """,
)
def pipeline_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment: split = content-hash bucket
    (80/10/10), NOT seeded randomness — the same document lands in the same
    split on every run, any cluster, any engine (rand()-based splits are
    neither reproducible across retries nor oracle-checkable). Content
    hashing also sends exact duplicates to the SAME split, preventing
    train/test leakage of duplicated documents. Pure map-side expression +
    one aggregate."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bucket = char_poly_hash("text") % 100
    split = (
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[1], "val")
        .otherwise("test")
    )
    return docs.groupBy("source", split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
    )


# PII scrubbing: the standard pre-training redaction pass. Patterns are
# deliberately alternation-free so Java regex (Spark) and RE2 (DuckDB)
# agree on every match; production swaps in a richer pattern set (or an
# NER model via batch_infer) behind the same (count, scrub) surface.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
# scrub order matters (an IPv4 tail can look phone-ish): email -> ip -> phone
PII_PATTERNS = (
    (PII_EMAIL, "<EMAIL>"),
    (PII_IPV4, "<IP>"),
    (PII_PHONE, "<PHONE>"),
)


def scrub_pii(text: Column | str) -> Column:
    """Sequential regexp_replace of every PII pattern (all occurrences)."""
    col = F.col(text) if isinstance(text, str) else text
    for pat, token in PII_PATTERNS:
        col = F.regexp_replace(col, F.lit(pat), F.lit(token))
    return col


def _sql_scrub(expr: str) -> str:
    for pat, token in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{token}', 'g')"
    return expr


@query(
    "pipeline_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(length(regexp_extract_all(text, '{PII_IPV4}')) AS BIGINT)
             AS n_ips,
           CAST(length(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
             AS n_phones,
           {sql_char_poly_hash(_sql_scrub('text'))} AS scrubbed_hash
    FROM documents
    """,
)
def pipeline_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over the corpus: count + scrub emails, IPv4s, and
    phone numbers per document. Pure map-side expression — zero shuffle,
    linear to 100 TB. The output pins the exact scrubbed text via a
    content hash (cross-engine checksum) instead of shipping megabytes of
    text through the comparator; the scrub semantics themselves are
    asserted on a constructed PII fixture in tests (the synthetic corpus
    is PII-free, so the counts here are the all-zero ground truth)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count("text", F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count("text", F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        char_poly_hash(scrub_pii("text")).alias("scrubbed_hash"),
    )


# per-language keep rates (percent): downsample the dominant language,
# keep most of the rest — classic corpus rebalancing before training
SAMPLE_PCT_DEFAULT = 40
SAMPLE_PCT = {"en": 10}
_SAMPLE_SALT = "|sample"  # decouples the sampling stream from the split stream


def _rate_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in SAMPLE_PCT.items()
    )
    return f"CASE {whens} ELSE {SAMPLE_PCT_DEFAULT} END"


@query(
    "pipeline_stratified_sample",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, lang,
             {sql_char_poly_hash(f"text || '{_SAMPLE_SALT}'")} % 100
               < ({_rate_sql()}) AS keep
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (keep) AS BIGINT) AS n_sampled,
           min(CASE WHEN keep THEN doc_id END) AS first_kept,
           CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_id_sum
    FROM s GROUP BY lang
    """,
)
def pipeline_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates applied
    by content hash, NOT seeded randomness — the engine's replacement for
    ``df.sampleBy`` (whose Bernoulli draws differ per partitioning and
    rerun). A document's fate depends only on its text, so resampling a
    grown corpus keeps every previously-kept document (stable training
    sets), duplicates land on the same side of the cut, and the whole
    operator is a map-side expression + one aggregate — no shuffle of the
    kept rows themselves. The hash stream is salted so sampling decisions
    are independent of pipeline_hash_split's train/val/test buckets.
    kept_id_sum is the cross-engine checksum that pins the exact kept set,
    not just its size."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    rate = F.lit(SAMPLE_PCT_DEFAULT)
    for lang, pct in SAMPLE_PCT.items():
        rate = F.when(F.col("lang") == lang, pct).otherwise(rate)
    keep = char_poly_hash(F.concat(F.col("text"), F.lit(_SAMPLE_SALT))) % 100 < rate
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.count_if(keep).alias("n_sampled"),
        F.min(F.when(keep, F.col("doc_id"))).alias("first_kept"),
        F.sum(F.when(keep, F.col("doc_id")).otherwise(0)).alias("kept_id_sum"),
    )


CONTEXT_WINDOW = 512  # tokens per packed training sequence


@query(
    "pipeline_pack_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    o AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS BIGINT) AS off
      FROM t
    )
    SELECT doc_id, source, n_tokens,
           COALESCE(off, 0) AS token_offset,
           CAST(floor(COALESCE(off, 0) / {CONTEXT_WINDOW}) AS BIGINT)
             AS first_chunk,
           CAST(floor((COALESCE(off, 0) + GREATEST(n_tokens, 1) - 1)
                      / {CONTEXT_WINDOW}) AS BIGINT) AS last_chunk
    FROM o
    """,
)
def pipeline_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing — the pretraining step that
    concatenates a shard's documents into one token stream and cuts it
    into fixed context windows. Per source shard, docs ordered by doc_id
    get a running token offset (one window cumsum = one shuffle on the
    shard key); each doc reports the first/last chunk it lands in, which
    is exactly the map a chunk-writer needs to emit packed sequences.
    At 100 TB the shard key is the unit of parallelism (a global total
    order would be a single-reducer sort — deliberately avoided);
    zero-token docs still occupy a point offset (GREATEST(n,1) guards
    the empty-doc chunk span). Whitespace tokens stand in for the
    tokenizer; swap text_token_counts' BPE-ish regex or a real tokenizer
    UDF for production budgets."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id",
        "source",
        F.regexp_count("text", F.lit(r"\S+")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        off.alias("token_offset"),
        F.floor(off / CONTEXT_WINDOW).alias("first_chunk"),
        F.floor(
            (off + F.greatest(F.col("n_tokens"), F.lit(1)) - 1) / CONTEXT_WINDOW
        ).alias("last_chunk"),
    )


RANK_PARTITIONS = 32  # range partitions for the distributed total order


def total_order_rank(
    df: DataFrame, order: list, rank_col: str = "global_rank"
) -> tuple[DataFrame, int]:
    """(df + rank_col, n_rows): distributed total-order row_number WITHOUT
    a single-partition window — the reusable core of pipeline_global_rank,
    shared with q41_customer_rfm's quartile scoring.

    1. ``repartitionByRange`` + ``sortWithinPartitions`` on the total
       order (ONE range exchange; Spark samples split points so the
       partitions balance under skew), materialized via eager
       ``localCheckpoint`` so the two downstream reads (count map + rank
       enumeration) never recompute it and no catalog-cache entry is
       left behind in long multi-query sessions;
    2. per-partition counts (one row per partition reaches the driver);
    3. in-partition enumeration + the partition's prefix offset via an
       Arrow ``mapInPandas``.

    ``order`` must be a total order (include a unique tie-break column)
    for the rank to be deterministic. n_rows comes free from the count
    map — no extra job."""
    from pyspark.sql.types import LongType, StructField, StructType

    d = (
        df.repartitionByRange(RANK_PARTITIONS, *order)
        .sortWithinPartitions(*order)
        .localCheckpoint(eager=True)
    )
    sizes = {
        r["pid"]: r["cnt"]
        for r in d.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in range(max(sizes, default=-1) + 1):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(rank_col, LongType(), False)]
    )

    def enumerate_sorted(batches):
        from pyspark import TaskContext

        base = offsets.get(TaskContext.get().partitionId(), 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf[rank_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    return d.mapInPandas(enumerate_sorted, out_schema), acc


def ntile_from_rank(rank_col: str, n: int, tiles: int = 4):
    """SQL ntile(tiles) as pure arithmetic over a precomputed global rank.

    ntile splits n rows into ``tiles`` groups whose sizes differ by at
    most one (the first n % tiles groups get the extra row); with n known
    driver-side the group of a row is a closed-form expression of its
    rank, so quartile scoring needs NO window at all."""
    base, rem = divmod(n, tiles)
    if base == 0:  # n < tiles: ntile assigns tile == rank
        return F.col(rank_col)
    cut = rem * (base + 1)
    return F.when(
        F.col(rank_col) <= cut,
        F.expr(f"({rank_col} + {base}) div {base + 1}"),
    ).otherwise(F.expr(f"{rem} + (({rank_col} - {cut} + {base} - 1) div {base})"))


@query(
    "pipeline_global_rank",
    oracle="""
    SELECT doc_id, n_chars,
           CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                AS BIGINT) AS global_rank
    FROM documents
    """,
)
def pipeline_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed total-order rank (here: documents by size, the
    curriculum/data-ordering shape) WITHOUT a single-partition window.

    A naive ``row_number() OVER (ORDER BY ...)`` with no PARTITION BY
    collapses the whole dataset into ONE task — the classic 100 TB
    killer. This is the textbook two-pass alternative:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` on the total
       order (one range shuffle; Spark samples split points, so
       partitions are balanced even under skew);
    2. count rows per range partition (a tiny aggregate — one row per
       partition reaches the driver, never the data);
    3. enumerate inside each sorted partition and add that partition's
       prefix offset (an Arrow ``mapInPandas`` carrying only the rank
       columns — order within a sorted partition is preserved).

    The only full-data movement is the ONE range exchange every
    total-order operation needs; ties are broken by doc_id so the rank
    is deterministic and oracle-checkable."""
    docs = load_table(spark, sf_dir, "documents")
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    ranked, _n = total_order_rank(docs.select("doc_id", "n_chars"), order)
    return ranked


ZORDER_BITS = 8  # bins per dimension (256 range-normalized buckets)


def _z_terms(u_expr: str, h_expr: str, intdiv: str) -> str:
    """Morton/z-value as pure integer arithmetic — ``(x div 2^i) mod 2``
    extracts bit i, so the SAME formula runs on any engine without bitwise
    operators (``intdiv`` is 'div' for Spark SQL, '//' for DuckDB)."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({u_expr}) {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({h_expr}) {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _z_bin(x: str, xmin: str, xmax: str, intdiv: str) -> str:
    """Range-normalize a dimension to [0, 2^ZORDER_BITS): equal-width bins
    over the OBSERVED min/max. Without this, the wider dimension's high
    bits dominate the interleave and the z-order degenerates into a 1-D
    sort (a 4-bit user id against a 10-bit hour range clusters hours
    only). Integer arithmetic exact on both engines."""
    n = 1 << ZORDER_BITS
    return f"((({x}) - ({xmin})) * {n}) {intdiv} (({xmax}) - ({xmin}) + 1)"


_SQL_HOUR = "epoch_us(ts) // 3600000000"


@query(
    "pipeline_zorder_key",
    oracle=f"""
    WITH h AS (
      SELECT event_id, user_id, {_SQL_HOUR} AS hr FROM events
    ),
    b AS (
      SELECT event_id,
             {_z_bin('user_id', 'min(user_id) OVER ()',
                     'max(user_id) OVER ()', '//')} AS ub,
             {_z_bin('hr', 'min(hr) OVER ()', 'max(hr) OVER ()', '//')} AS hb
      FROM h
    )
    SELECT event_id, CAST({_z_terms('ub', 'hb', '//')} AS BIGINT) AS zval
    FROM b
    """,
)
def pipeline_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) key over the two dimensions ad-hoc queries filter
    events by — user and hour. Each dimension is first range-normalized
    to 256 equal-width bins over its observed min/max (one tiny global
    aggregate, broadcast back — the same stats pass any OPTIMIZE ZORDER
    implementation does), then the bin bits are interleaved. Laying files
    out in zval order (zorder_layout below) clusters BOTH dimensions at
    once, so min/max file statistics prune reads for user-range AND
    time-range predicates — the multi-dimensional data skipping a
    single-column sort can't give. All integer arithmetic (bit i ==
    (x div 2^i) mod 2), identical on both engines."""
    from pyspark_text_classification_spark.functions.time import TS_US_EXPR

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.expr(f"({TS_US_EXPR}) div 3600000000").alias("hr")
    )
    lims = ev.agg(
        F.min("user_id").alias("umin"), F.max("user_id").alias("umax"),
        F.min("hr").alias("hmin"), F.max("hr").alias("hmax"),
    )
    b = ev.crossJoin(F.broadcast(lims)).select(
        "event_id",
        F.expr(_z_bin("user_id", "umin", "umax", "div")).alias("ub"),
        F.expr(_z_bin("hr", "hmin", "hmax", "div")).alias("hb"),
    )
    return b.select(
        "event_id",
        F.expr(_z_terms("ub", "hb", "div")).cast("long").alias("zval"),
    )


def zorder_layout(df: DataFrame, zval: Column, n_files: int) -> DataFrame:
    """Range-partition rows by their z-value (one shuffle — the same
    exchange any re-layout pays) so each output file covers a compact
    z-range, i.e. a small rectangle in (dim1, dim2) space. Write the
    result with one file per partition and both dimensions' parquet
    min/max stats become selective."""
    return df.withColumn("__z", zval).repartitionByRange(
        n_files, "__z"
    ).sortWithinPartitions("__z").drop("__z")


BENCH_MOD = 37  # pseudo-benchmark: every 37th doc stands in for an eval set
DECON_K = 3     # shingle width for overlap detection
DECON_RATIO_PCT = 10  # contaminated if >= 10% of shingles hit the benchmark


@query(
    "pipeline_decontaminate",
    oracle=f"""
    WITH sh AS ({_sql_sh(DECON_K)}),
    b AS (SELECT DISTINCT h FROM sh WHERE doc_id % {BENCH_MOD} = 0),
    c AS (
      SELECT s.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(count(b.h) AS BIGINT) AS n_shared
      FROM sh s LEFT JOIN b ON s.h = b.h
      WHERE s.doc_id % {BENCH_MOD} <> 0
      GROUP BY 1
    )
    SELECT doc_id, n_shingles, n_shared,
           CAST(CASE WHEN n_shared * 100 >= n_shingles * {DECON_RATIO_PCT}
                     AND n_shared > 0 THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM c
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose token
    3-shingles overlap an evaluation set — the contamination check every
    serious pre-training pipeline runs before release (here every 37th
    document stands in for the benchmark corpus).

    100 TB shape: benchmark corpora are tiny relative to the training
    corpus, so the benchmark's distinct shingle set BROADCASTS and the
    check costs one map-side hash-join probe per corpus shingle — the
    corpus is never shuffled. Shares the dedup family's shingle machinery
    (token hashes folded into k-gram hashes, computed once per token)."""
    from pyspark_text_classification_spark.operators.dedup import (
        shingle_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(docs, k=DECON_K)
    bench = (
        sh.filter(F.col("doc_id") % BENCH_MOD == 0).select("h").distinct()
    )
    corpus = sh.filter(F.col("doc_id") % BENCH_MOD != 0)
    hits = corpus.join(
        F.broadcast(bench.withColumn("hit", F.lit(1))), "h", "left"
    )
    agg = hits.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.count("hit").alias("n_shared"),
    )
    contaminated = (
        (F.col("n_shared") * 100 >= F.col("n_shingles") * DECON_RATIO_PCT)
        & (F.col("n_shared") > 0)
    )
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        contaminated.cast("int").alias("contaminated"),
    )


@query(
    "pipeline_full_prep",
    oracle=f"""
    WITH scrubbed AS (
      SELECT doc_id, {_sql_scrub('text')} AS stext FROM documents
    ),
    q AS (
      SELECT doc_id, stext,
             CAST(length(list_filter(str_split_regex(lower(stext), '\\W+'),
                                     t -> length(t) >= 2)) AS BIGINT)
               AS n_tokens
      FROM scrubbed
    ),
    kept AS (
      SELECT min(doc_id) AS doc_id, min(n_tokens) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_copies,
             min(stext) AS stext
      FROM q WHERE n_tokens >= {MIN_TOKENS} GROUP BY stext
    ),
    split AS (
      SELECT CASE WHEN {sql_char_poly_hash('stext')} % 100 < {SPLIT_PCT[0]}
                  THEN 'train'
                  WHEN {sql_char_poly_hash('stext')} % 100 < {SPLIT_PCT[1]}
                  THEN 'val' ELSE 'test' END AS split,
             n_tokens, n_copies
      FROM kept
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_copies - 1) AS BIGINT) AS dup_copies_absorbed
    FROM split GROUP BY split
    """,
)
def pipeline_full_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-prep chain END-TO-END in one declarative plan:
    PII-scrub -> quality filter -> exact dedup (canonical keeper) ->
    content-hash split assignment -> per-split release stats.

    The point is what Catalyst does with the composition: scrub, tokenize
    count, and the quality predicate all fuse into the SCAN's projection
    (filtered rows never reach an exchange); the dedup groupBy is the one
    wide shuffle; the split expression rides the dedup output and the
    final per-split aggregate is three rows. One data-sized shuffle for
    the entire pipeline — composing the five operators costs no more than
    the most expensive one alone, which is the whole argument for a
    declarative engine at 100 TB."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    stext = scrub_pii("text").alias("stext")
    q = docs.select("doc_id", stext).select(
        "doc_id",
        "stext",
        F.size(tokenize("stext", 2)).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") >= MIN_TOKENS)
    kept = q.groupBy("stext").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_copies"),
    )
    bucket = char_poly_hash("stext") % 100
    split = (
        F.when(bucket < SPLIT_PCT[0], "train")
        .when(bucket < SPLIT_PCT[1], "val")
        .otherwise("test")
    )
    return kept.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.col("n_copies") - 1).alias("dup_copies_absorbed"),
    )


# Target mixture for pipeline_mixture_sample, as integer proportion parts
# (weights as literal doubles would drag inexact division into the keep
# decision; integer parts keep every rate computation exact on both
# engines). Unlisted sources get the default part count.
MIX_PARTS = {"src0": 30, "src1": 20}
MIX_PART_DEFAULT = 3
_MIX_SALT = "|mix"  # decouples this hash stream from split/sample streams
_PPM = 1_000_000


def _parts_sql() -> str:
    whens = " ".join(
        f"WHEN source = '{s}' THEN {p}" for s, p in MIX_PARTS.items()
    )
    return f"CASE {whens} ELSE {MIX_PART_DEFAULT} END"


@query(
    "pipeline_mixture_sample",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, source, text, {_parts_sql()} AS parts FROM documents
    ),
    c AS (
      SELECT source, parts, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1, 2
    ),
    t AS (
      SELECT min((n * {_PPM}) // parts) AS tq FROM c
    ),
    r AS (
      SELECT source, (parts * tq) // n AS thr_ppm FROM c CROSS JOIN t
    ),
    s AS (
      SELECT p.doc_id, p.source, r.thr_ppm,
             {sql_char_poly_hash(f"text || '{_MIX_SALT}'")} % {_PPM}
               < r.thr_ppm AS keep
      FROM p JOIN r USING (source)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(min(thr_ppm) AS BIGINT) AS thr_ppm,
           CAST(count(*) FILTER (keep) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN keep THEN doc_id ELSE 0 END) AS BIGINT)
             AS kept_id_sum
    FROM s GROUP BY source
    """,
)
def pipeline_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting: downsample each source so the sampled corpus
    matches a TARGET mixture (MIX_PARTS proportions) — the data-mixing
    step that turns raw per-source availability into the training blend
    (e.g. "30 parts web, 20 parts books, 3 parts everything else").

    Rates are derived, not configured: waterfilling without upsampling —
    the feasible sampled total is T = min over sources of (count_s /
    parts_s), and source s keeps rate_s = parts_s * T / count_s (<= 1 by
    construction; the scarcest source binds and is kept whole). All rate
    arithmetic is scaled-integer (ppm) so both engines make bit-identical
    keep decisions; intermediate products stay under 2^63 up to ~10^13
    docs per source.

    Scale shape: one source-bounded count aggregate, a scalar min that
    broadcasts, a broadcast rate join back onto the corpus (sources are
    few), and the deterministic content-hash keep decision — the same
    stable-under-regrowth, duplicate-consistent, retry-safe semantics as
    pipeline_stratified_sample, with the per-source aggregate as the only
    data-sized shuffle. kept_id_sum pins the exact kept set."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    parts = F.lit(MIX_PART_DEFAULT)
    for s, pv in MIX_PARTS.items():
        parts = F.when(F.col("source") == s, pv).otherwise(parts)
    c = docs.groupBy("source", parts.alias("parts")).agg(
        F.count("*").alias("n")
    )
    tq = c.agg(F.min(F.expr(f"(n * {_PPM}) div parts")).alias("tq"))
    rates = (
        c.crossJoin(F.broadcast(tq))
        .select("source", F.expr("(parts * tq) div n").alias("thr_ppm"))
    )
    keep = (
        char_poly_hash(F.concat(F.col("text"), F.lit(_MIX_SALT))) % _PPM
        < F.col("thr_ppm")
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.min("thr_ppm").alias("thr_ppm"),
            F.count_if(keep).alias("n_sampled"),
            F.sum(F.when(keep, F.col("doc_id")).otherwise(0)).alias("kept_id_sum"),
        )
    )


ALLOWED_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "pipeline_validate",
    oracle=f"""
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(doc_id) AS BIGINT) AS doc_id_nonnull,
             CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_id_distinct,
             CAST(count(text) AS BIGINT) AS text_nonnull,
             CAST(count(*) FILTER (lang IN {ALLOWED_LANGS}) AS BIGINT)
               AS lang_in_domain,
             CAST(count(*) FILTER (n_chars = length(text)) AS BIGINT)
               AS n_chars_consistent,
             CAST(count(*) FILTER (n_chars >= 0) AS BIGINT) AS n_chars_nonneg
      FROM documents
    )
    SELECT check_name, observed, expected,
           CAST(observed = expected AS INT) AS passed
    FROM (
      SELECT 'doc_id_nonnull' AS check_name, doc_id_nonnull AS observed,
             n_rows AS expected FROM s
      UNION ALL
      SELECT 'doc_id_unique', doc_id_distinct, doc_id_nonnull FROM s
      UNION ALL
      SELECT 'text_nonnull', text_nonnull, n_rows FROM s
      UNION ALL
      SELECT 'lang_in_domain', lang_in_domain, n_rows FROM s
      UNION ALL
      SELECT 'n_chars_matches_text', n_chars_consistent, n_rows FROM s
      UNION ALL
      SELECT 'n_chars_nonnegative', n_chars_nonneg, n_rows FROM s
    )
    """,
)
def pipeline_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-suite data validation (the Deequ/Great-Expectations
    pattern): completeness, key uniqueness, domain membership, and
    cross-column consistency checks over the corpus, emitted as one row
    per check with observed/expected counts and a pass flag — the QA gate
    a pipeline runs before promoting a snapshot.

    Scale shape: ALL checks reduce in ONE pass — a single aggregate with
    conditional counters (count FILTER) plus one distinct-count; nothing
    rescans per check, so adding a constraint costs one more counter, not
    one more job. The check table itself is constant-size and unions from
    the one aggregate row."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    n = F.count("*")
    s = docs.agg(
        n.alias("n_rows"),
        F.count("doc_id").alias("doc_id_nonnull"),
        F.count_distinct("doc_id").alias("doc_id_distinct"),
        F.count("text").alias("text_nonnull"),
        F.count_if(F.col("lang").isin(*ALLOWED_LANGS)).alias("lang_in_domain"),
        F.count_if(F.col("n_chars") == F.length("text")).alias(
            "n_chars_consistent"
        ),
        F.count_if(F.col("n_chars") >= 0).alias("n_chars_nonneg"),
    )
    checks = [
        ("doc_id_nonnull", "doc_id_nonnull", "n_rows"),
        ("doc_id_unique", "doc_id_distinct", "doc_id_nonnull"),
        ("text_nonnull", "text_nonnull", "n_rows"),
        ("lang_in_domain", "lang_in_domain", "n_rows"),
        ("n_chars_matches_text", "n_chars_consistent", "n_rows"),
        ("n_chars_nonnegative", "n_chars_nonneg", "n_rows"),
    ]
    rows = None
    for name, obs, exp in checks:
        r = s.select(
            F.lit(name).alias("check_name"),
            F.col(obs).alias("observed"),
            F.col(exp).alias("expected"),
            (F.col(obs) == F.col(exp)).cast("int").alias("passed"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


SEQ_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def _bucket_case_sql(n: str) -> str:
    whens = " ".join(f"WHEN {n} <= {b} THEN {b}" for b in SEQ_BUCKETS)
    return f"CASE {whens} ELSE {SEQ_BUCKETS[-1] * 2} END"


@query(
    "pipeline_length_buckets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, CAST(length({_SQL_TOKENS}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    b AS (
      SELECT n_tokens,
             CAST({_bucket_case_sql('n_tokens')} AS BIGINT) AS seq_len
      FROM t
    )
    SELECT seq_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(seq_len * count(*) AS BIGINT) AS padded_tokens,
           {{rhu}} AS pad_waste_ratio
    FROM b GROUP BY 1
    """.replace(
        "{rhu}",
        # waste = fraction of the padded batch that is padding
        "floor((1.0 - CAST(sum(n_tokens) AS DOUBLE)"
        " / CAST(seq_len * count(*) AS DOUBLE)) * 10000.0 + 0.5) / 10000.0",
    ),
)
def pipeline_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing for training-batch packing: assign every
    document to the smallest power-of-two context bucket that holds its
    token count and account the padding waste per bucket — the statistic
    that decides bucket boundaries for a padded-batch data loader.

    The bucket assignment is a branch-only CASE ladder over fixed
    boundaries (no float log2 — exact identical integers on any engine),
    fused into the scan stage; the aggregate is bounded by the bucket
    count, so beyond the single map-side-combined groupBy nothing moves.
    Linear scan at 100 TB, output rows = len(SEQ_BUCKETS)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    n_tokens = F.size(tokenize("text", min_token_length=2)).cast("long")
    bucket = F.expr(_bucket_case_sql("n_tokens")).cast("long")
    b = docs.select(n_tokens.alias("n_tokens")).select(
        "n_tokens", bucket.alias("seq_len")
    )
    waste = F.lit(1.0) - F.col("total_tokens").cast("double") / F.col(
        "padded_tokens"
    ).cast("double")
    return (
        b.groupBy("seq_len")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "padded_tokens", (F.col("seq_len") * F.col("n_docs")).cast("long")
        )
        .select(
            "seq_len",
            "n_docs",
            "total_tokens",
            "padded_tokens",
            round_half_up(waste, 4).alias("pad_waste_ratio"),
        )
    )


# Efraimidis-Spiridakis weighted reservoir sampling, derandomized: the
# uniform draw comes from an LCG over doc_id and its ln() is quantized to
# integer micro-nats (the same trick text_lm_logprob property-tests), so
# the priority key is engine-exact.
WS_K = 20  # sample size per source stratum
_WS_A = 48_271  # MINSTD multiplier (Park-Miller)
_WS_MOD = 2_147_483_647  # 2^31 - 1
_LN_SCALE = 1_000_000


@query(
    "pipeline_weighted_sample",
    oracle=f"""
    WITH k AS (
      SELECT doc_id, source, n_chars,
             (doc_id * {_WS_A} + 1) % {_WS_MOD} AS h
      FROM documents
    ),
    p AS (
      SELECT doc_id, source, n_chars,
             CAST(floor(ln((h + 1.0) / {_WS_MOD}.0) * {_LN_SCALE}.0 + 0.5)
                  AS BIGINT) AS ln_micro
      FROM k
    ),
    r AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST(ln_micro AS DOUBLE) / n_chars DESC, doc_id
             ) AS rnk
      FROM p WHERE n_chars > 0
    )
    SELECT source, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars
    FROM r WHERE rnk <= {WS_K}
    """,
)
def pipeline_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, k docs per source stratum,
    selection probability proportional to document length — the
    Efraimidis-Spiridakis reservoir scheme (key = u^(1/w), ranked by
    ln(u)/w) with the randomness derandomized: u comes from a MINSTD LCG
    over doc_id, so the sample is reproducible on any engine, any
    cluster, any retry, and oracle-checkable.

    Determinism: ln(u) is quantized to integer micro-nats before the
    single division by the integer weight — one correctly-rounded IEEE op
    on both engines, so ranks never drift by an ulp.  Plan: pure map-side
    key computation, one window shuffle on source, and the rank filter
    cuts each stratum to k rows map-side after the sort — the standard
    distributed top-k-per-group shape."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    h = (F.col("doc_id") * _WS_A + 1) % _WS_MOD
    ln_micro = F.floor(
        F.log((h + 1).cast("double") / float(_WS_MOD)) * _LN_SCALE + F.lit(0.5)
    ).cast("long")
    key = ln_micro.cast("double") / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(key.desc(), "doc_id")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= WS_K)
        .select("source", F.col("rnk").cast("long").alias("rnk"), "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Migration-grade integrity: order-independent table checksums + CDC merge
# ---------------------------------------------------------------------------

_CK_MOD = 2_147_483_647  # 2^31 - 1 (the poly-hash modulus)
_CK_MULT = 1_000_003


def _horner_sql(terms: list[str]) -> str:
    """Nonneg Horner-chain row hash, mod at every step (overflow-safe)."""
    acc = terms[0]
    for t in terms[1:]:
        acc = f"((({acc}) * {_CK_MULT} + ({t})) % {_CK_MOD})"
    return acc


def _nonneg_sql(x: str) -> str:
    return f"((({x}) % {_CK_MOD} + {_CK_MOD}) % {_CK_MOD})"


_DOC_ROW_SQL = _horner_sql(["doc_id", sql_char_poly_hash("text")])
_EVT_ROW_SQL = _horner_sql(
    [
        "event_id",
        _nonneg_sql("epoch_us(ts)"),
        "user_id",
        _nonneg_sql("CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)"),
        sql_char_poly_hash("event_type"),
    ]
)
_ORD_ROW_SQL = _horner_sql(
    [
        "o_orderkey",
        "o_custkey",
        sql_char_poly_hash("o_orderstatus"),
        _nonneg_sql("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"),
        _nonneg_sql("epoch_us(o_orderdate) // 1000000"),
    ]
)


@query(
    "pipeline_table_checksum",
    oracle=f"""
    SELECT 'documents' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor({_DOC_ROW_SQL}) AS BIGINT) AS checksum
    FROM documents
    UNION ALL
    SELECT 'events', CAST(count(*) AS BIGINT),
           CAST(bit_xor({_EVT_ROW_SQL}) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'orders', CAST(count(*) AS BIGINT),
           CAST(bit_xor({_ORD_ROW_SQL}) AS BIGINT)
    FROM orders
    """,
)
def pipeline_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content checksums for migration validation: per table, the XOR of a
    canonical per-row hash — the cheap way to prove a 100 TB copy, engine
    swap, or re-layout preserved every row.  XOR is commutative,
    associative, and overflow-free, so the aggregate is one map-side-
    combined pass with NO ordering requirement — any partitioning, any
    cluster size, same checksum — and a single flipped bit anywhere
    changes it.

    Row hashes mix the stable columns through an overflow-safe Horner
    chain (mod at every step keeps products under 2^62); doubles enter as
    quantized integers, timestamps as epoch integers — the cross-engine
    determinism rules the rest of the engine already follows."""
    from pyspark.sql import Column as _Col

    def horner(terms: list[_Col]) -> _Col:
        acc = terms[0]
        for t in terms[1:]:
            acc = (acc * _CK_MULT + t) % _CK_MOD
        return acc

    def nonneg(x: _Col) -> _Col:
        return F.pmod(x, F.lit(_CK_MOD))

    def one(df: DataFrame, name: str, row: _Col) -> DataFrame:
        return df.select(row.alias("h")).agg(
            F.lit(name).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(h)").cast("long").alias("checksum"),
        )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    ts_us_col = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    doc_row = horner([F.col("doc_id"), char_poly_hash("text")])
    evt_row = horner(
        [
            F.col("event_id"),
            nonneg(ts_us_col),
            F.col("user_id"),
            nonneg(F.floor(F.col("value") * 1_000_000.0 + F.lit(0.5)).cast("long")),
            char_poly_hash("event_type"),
        ]
    )
    ord_row = horner(
        [
            F.col("o_orderkey"),
            F.col("o_custkey"),
            char_poly_hash("o_orderstatus"),
            nonneg(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("long")
            ),
            nonneg(
                F.expr(
                    "timestampdiff(MICROSECOND,"
                    " TIMESTAMP_NTZ'1970-01-01 00:00:00', o_orderdate)"
                    " div 1000000"
                )
            ),
        ]
    )
    return (
        one(docs, "documents", doc_row)
        .unionByName(one(ev, "events", evt_row))
        .unionByName(one(orders, "orders", ord_row))
    )


# CDC change-feed simulation, derived deterministically from doc_id so the
# merge is oracle-checkable: every 10th doc updates, another 10th deletes,
# another 10th re-inserts under a shifted key.
_CDC_UPDATE_MOD = 3
_CDC_DELETE_MOD = 7
_CDC_INSERT_MOD = 5
_CDC_INSERT_SHIFT = 10_000_000
_CDC_UPDATE_PREFIX = "rev2: "


@query(
    "pipeline_cdc_merge",
    oracle=f"""
    WITH upd AS (
      SELECT doc_id, '{_CDC_UPDATE_PREFIX}' || text AS text, source
      FROM documents WHERE doc_id % 10 = {_CDC_UPDATE_MOD}
    ),
    del AS (
      SELECT doc_id FROM documents WHERE doc_id % 10 = {_CDC_DELETE_MOD}
    ),
    ins AS (
      SELECT doc_id + {_CDC_INSERT_SHIFT} AS doc_id, text, source
      FROM documents WHERE doc_id % 10 = {_CDC_INSERT_MOD}
    ),
    untouched AS (
      SELECT doc_id, text, source FROM documents
      WHERE doc_id % 10 NOT IN ({_CDC_UPDATE_MOD}, {_CDC_DELETE_MOD})
    ),
    merged AS (
      SELECT * FROM untouched
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(bit_xor({_horner_sql(['doc_id', sql_char_poly_hash('text')])})
                AS BIGINT) AS checksum
    FROM merged GROUP BY 1
    """,
)
def pipeline_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert semantics over an immutable snapshot — the CDC
    apply step (SCD type 1) every warehouse sync runs: delete keys drop,
    update keys take the new row version, inserts append.  Expressed as
    keep = snapshot ANTI-JOIN touched-keys, then UNION the new versions —
    the only way to "mutate" at 100 TB, and exactly what table formats'
    MERGE INTO compiles to underneath.

    The change feed here is derived deterministically from doc_id (mod
    classes for update/delete/insert) so the merged result is
    oracle-checkable end to end; the per-source XOR row-checksum output
    proves the merge byte-for-byte, not just by row count.  Scale shape:
    one shuffle for the key anti-join (changes side is the small side —
    broadcast when it fits), unions are free, and the checksum aggregate
    is map-side combined."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "source"
    )
    merged = cdc_merged(docs)
    row_h = (F.col("doc_id") * _CK_MULT + char_poly_hash("text")) % _CK_MOD
    return (
        merged.select("source", row_h.alias("h"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.expr("bit_xor(h)").cast("long").alias("checksum"),
        )
    )


def cdc_merged(docs: DataFrame) -> DataFrame:
    """The deterministic change feed applied to the snapshot (shared by
    pipeline_cdc_merge and pipeline_snapshot_diff)."""
    m10 = F.pmod(F.col("doc_id"), F.lit(10))
    upd = docs.filter(m10 == _CDC_UPDATE_MOD).select(
        "doc_id",
        F.concat(F.lit(_CDC_UPDATE_PREFIX), F.col("text")).alias("text"),
        "source",
    )
    deleted_or_updated = docs.filter(
        m10.isin(_CDC_UPDATE_MOD, _CDC_DELETE_MOD)
    ).select("doc_id")
    ins = docs.filter(m10 == _CDC_INSERT_MOD).select(
        (F.col("doc_id") + _CDC_INSERT_SHIFT).alias("doc_id"), "text", "source"
    )
    kept = docs.join(F.broadcast(deleted_or_updated), "doc_id", "left_anti")
    return kept.unionByName(upd).unionByName(ins)


_CDC_MERGED_SQL = f"""
    upd AS (
      SELECT doc_id, '{_CDC_UPDATE_PREFIX}' || text AS text, source
      FROM documents WHERE doc_id % 10 = {_CDC_UPDATE_MOD}
    ),
    ins AS (
      SELECT doc_id + {_CDC_INSERT_SHIFT} AS doc_id, text, source
      FROM documents WHERE doc_id % 10 = {_CDC_INSERT_MOD}
    ),
    untouched AS (
      SELECT doc_id, text, source FROM documents
      WHERE doc_id % 10 NOT IN ({_CDC_UPDATE_MOD}, {_CDC_DELETE_MOD})
    ),
    merged AS (
      SELECT * FROM untouched
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins
    )
"""


@query(
    "pipeline_snapshot_diff",
    oracle=f"""
    WITH {_CDC_MERGED_SQL}
    SELECT coalesce(m.source, d.source) AS source,
           CASE WHEN d.doc_id IS NULL THEN 'added'
                WHEN m.doc_id IS NULL THEN 'removed'
                WHEN m.text <> d.text THEN 'changed'
                ELSE 'unchanged' END AS status,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d
    FULL JOIN merged m ON d.doc_id = m.doc_id
    GROUP BY 1, 2
    """,
)
def pipeline_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data diff between two table versions: FULL OUTER join on the key,
    classify every row as added / removed / changed / unchanged, count per
    source — the reconciliation report run after any migration, backfill,
    or CDC apply (here: against the deterministic cdc_merged version, so
    the expected diff is exactly the change feed).

    Scale shape: one key-partitioned full-outer shuffle join — both sides
    stream through sorted merge, nothing is driver-side; the change
    classification is a per-row CASE fused into the join's projection, and
    the output aggregate is (sources x 4 statuses)-bounded."""
    v1 = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text", "source"
    )
    v2 = cdc_merged(v1)
    d, m = v1.alias("d"), v2.alias("m")
    status = (
        F.when(F.col("d.doc_id").isNull(), "added")
        .when(F.col("m.doc_id").isNull(), "removed")
        .when(F.col("m.text") != F.col("d.text"), "changed")
        .otherwise("unchanged")
    )
    return (
        d.join(m, F.col("d.doc_id") == F.col("m.doc_id"), "full_outer")
        .groupBy(
            F.coalesce(F.col("m.source"), F.col("d.source")).alias("source"),
            status.alias("status"),
        )
        .agg(F.count("*").alias("n_docs"))
    )


K_ANON = 5  # groups smaller than this are re-identification risks
_KA_CHAR_BUCKET = 100  # n_chars coarsened to 100-char buckets


@query(
    "pipeline_kanonymity_audit",
    oracle=f"""
    WITH g AS (
      SELECT lang, source, n_chars // {_KA_CHAR_BUCKET} AS len_bucket,
             CAST(count(*) AS BIGINT) AS grp_size
      FROM documents GROUP BY 1, 2, 3
    )
    SELECT CAST({K_ANON} AS BIGINT) AS k,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (grp_size < {K_ANON}) AS BIGINT)
             AS n_small_groups,
           CAST(coalesce(sum(grp_size) FILTER (grp_size < {K_ANON}), 0)
                AS BIGINT) AS n_docs_at_risk,
           CAST(min(grp_size) AS BIGINT) AS min_group_size
    FROM g
    """,
)
def pipeline_kanonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers: coarsen (lang, source,
    length-bucket) into equivalence groups and count how many documents
    sit in groups smaller than k — the re-identification risk measure a
    privacy review runs BEFORE releasing a corpus (a document alone in
    its (lang, source, size) cell is linkable even with the text
    scrubbed).

    One map-side-combined aggregate to the QI-bounded group table, then a
    scalar summary — linear scan at 100 TB, output one row.  The
    complement of pipeline_pii_scrub: scrubbing removes identifiers IN
    the text, this measures identification BY metadata."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    g = docs.groupBy(
        "lang",
        "source",
        (F.col("n_chars") / _KA_CHAR_BUCKET).cast("long").alias("len_bucket"),
    ).agg(F.count("*").alias("grp_size"))
    small = F.col("grp_size") < K_ANON
    return g.agg(
        F.lit(K_ANON).cast("long").alias("k"),
        F.count("*").alias("n_groups"),
        F.sum(small.cast("long")).alias("n_small_groups"),
        F.coalesce(
            F.sum(F.when(small, F.col("grp_size"))), F.lit(0)
        ).alias("n_docs_at_risk"),
        F.min("grp_size").alias("min_group_size"),
    )


# --- shard manifest ---------------------------------------------------------
MANIFEST_SHARDS = 16
_SHARD_A = 2_654_435_761  # Knuth multiplicative constant; literal both engines


@query(
    "pipeline_shard_manifest",
    oracle=f"""
    WITH rows_h AS (
      SELECT (doc_id * {_SHARD_A}) % {MANIFEST_SHARDS} AS shard_id,
             n_chars,
             {_DOC_ROW_SQL} AS h
      FROM documents
    )
    SELECT shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(bit_xor(h) AS BIGINT) AS checksum
    FROM rows_h GROUP BY 1
    """,
)
def pipeline_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The publishing manifest of a sharded dataset export: per shard,
    the document count, total characters, and an order-free XOR content
    checksum — what a 100 TB dataset release ships next to its shards so
    any consumer can verify a download (and any writer can verify a
    re-layout) without re-reading the corpus twice.

    Shard assignment is the same multiplicative hash a sharded WRITER
    would use (deterministic, key-stable under appends); the manifest is
    ONE map-side-combined aggregate whose output is |shards| rows, and
    the checksum column reuses pipeline_table_checksum's Horner row hash
    so manifest verification and table-level migration checks compose."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark_text_classification_spark.functions.hashing import (
        _poly_hash_sql,
    )

    # _horner_sql nests plain arithmetic strings, so it serves both
    # engines; only the char-hash leaf differs (Spark vs DuckDB HOF).
    row_h = F.expr(_horner_sql(["doc_id", _poly_hash_sql("text")]))
    return (
        docs.select(
            F.expr(f"(doc_id * {_SHARD_A}) % {MANIFEST_SHARDS}").alias(
                "shard_id"
            ),
            "n_chars",
            row_h.alias("h"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.expr("bit_xor(h)").cast("long").alias("checksum"),
        )
    )


# --- RAG chunking: overlapping token windows --------------------------------
RAG_CHUNK_TOKENS = 64
RAG_CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@query(
    "pipeline_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_filter(str_split_regex(lower(text), '\\W+'),
                                 t -> length(t) >= 2) AS toks
      FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS chunk_idx,
             list_slice(toks, i * {RAG_CHUNK_STRIDE} + 1,
                        i * {RAG_CHUNK_STRIDE} + {RAG_CHUNK_TOKENS}) AS ctoks
      FROM toks,
           LATERAL unnest(range(0, CAST(greatest(1,
             ceil((length(toks) - {RAG_CHUNK_TOKENS})
                  / {RAG_CHUNK_STRIDE}.0) + 1) AS BIGINT))) AS u(i)
    )
    SELECT doc_id, chunk_idx,
           CAST(length(ctoks) AS BIGINT) AS n_tokens,
           {sql_char_poly_hash("array_to_string(ctoks, ' ')")} AS chunk_hash
    FROM chunks WHERE length(ctoks) > 0
    """,
)
def pipeline_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-index chunking: split every document into overlapping
    {RAG_CHUNK_TOKENS}-token windows with stride {RAG_CHUNK_STRIDE}
    (16-token overlap, the retrieval-chunking default shape), emitting
    stable (doc_id, chunk_idx) keys, token counts, and a content hash
    per chunk — the table an embedding indexer consumes.

    Chunking is entirely IN-ROW (a sequence of slices over the token
    array; the explode happens after the window arithmetic), so the only
    shuffle anything downstream sees is whatever IT does — the chunker
    itself is map-local at any scale.  Chunk count per doc is
    ceil((len - size) / stride) + 1, floored at 1 so short documents
    still emit their single partial chunk; trailing windows shorter than
    the chunk size are kept (standard: the tail must be indexed too).
    The content hash is the cross-engine polynomial family, so chunk
    identity survives engine swaps (and feeds dedup_chunks-style
    downstream dedup directly)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks_expr = r"filter(split(lower(text), '\\W+'), t -> length(t) >= 2)"
    n_chunks = (
        f"CAST(greatest(1, ceil((size(toks) - {RAG_CHUNK_TOKENS})"
        f" / {RAG_CHUNK_STRIDE}D) + 1) AS BIGINT)"
    )
    return (
        docs.selectExpr("doc_id", f"{toks_expr} AS toks")
        .selectExpr(
            "doc_id",
            f"posexplode(transform(sequence(0, {n_chunks} - 1), "
            f"i -> slice(toks, i * {RAG_CHUNK_STRIDE} + 1, "
            f"{RAG_CHUNK_TOKENS}))) AS (chunk_idx, ctoks)",
        )
        .filter(F.size("ctoks") > 0)
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size("ctoks").cast("long").alias("n_tokens"),
            char_poly_hash(F.array_join("ctoks", " ")).alias("chunk_hash"),
        )
    )


# --- observed metrics: df.observe() piggyback ---------------------------------
OBS_MIN_QTY = 5  # quality-gate threshold


@query(
    "pipeline_observed_metrics",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_seen,
           CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
             AS sum_qty_fl,
           CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_returned,
           CAST(sum(CASE WHEN l_quantity >= {OBS_MIN_QTY} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN l_quantity >= {OBS_MIN_QTY}
                    THEN CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS pass_price_c
    FROM lineitem
    """,
)
def pipeline_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-quality metrics PIGGYBACKED on a gate pass with
    ``df.observe()`` (the Observation API): the scan-side metrics
    (rows seen, floored quantity sum, returned-flag count) ride the SAME
    job that computes the downstream gate aggregate — no second scan.
    At 100 TB this halves the IO of every "validate then process"
    pipeline stage: observe() attaches CollectMetrics accumulators to
    the plan instead of re-reading the input, which is why it, and not a
    separate validation query, is the right shape for inline data-quality
    counters.  Eager by necessity (Observation.get blocks on the action);
    the returned one-row frame carries both the observed and the computed
    halves, all exact integers.

    The observe pass runs in an ISOLATED spark.newSession() (same
    SparkContext, separate session state): a used Observation stays
    registered in the session's ObservationManager, and MLlib model
    training summaries capture their SparkSession into executor closures
    — any LATER LogisticRegressionModel.transform in the same session
    then dies with NotSerializableException(ObservationManager).
    Session-scoping the observation keeps the caller's session's manager
    empty, so monitoring a pass can never poison unrelated ML queries
    (root-caused in a 221-query sequential drive)."""
    from pyspark.sql import Observation

    obs_session = spark.newSession()
    li = load_table(obs_session, sf_dir, "lineitem")
    obs = Observation("gate_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_seen"),
        F.sum(F.floor("l_quantity").cast("long")).alias("sum_qty_fl"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
            "n_returned"
        ),
    )
    gate = (
        observed.filter(F.col("l_quantity") >= OBS_MIN_QTY)
        .agg(
            F.count("*").alias("n_pass"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("pass_price_c"),
        )
        .collect()[0]  # the action that also materializes the metrics
    )
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_seen"],
                m["sum_qty_fl"],
                m["n_returned"],
                gate["n_pass"],
                gate["pass_price_c"],
            )
        ],
        "n_seen LONG, sum_qty_fl LONG, n_returned LONG, n_pass LONG,"
        " pass_price_c LONG",
    )


# --- incremental view maintenance (partial-aggregate merge) -------------------
IVM_CUTOFF = "1999-01-01"  # base/delta split inside the data's date range


@query(
    "pipeline_ivm_merge",
    oracle="""
    SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
             AS yyyymm,
           CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount))
                               * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_c,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount))
                               * 100.0 + 0.5) AS BIGINT))
                // count(*) AS BIGINT) AS avg_rev_c
    FROM lineitem
    GROUP BY 1
    """,
)
def pipeline_ivm_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the monthly revenue rollup: the
    BASE partition (shipped before {IVM_CUTOFF}) and the DELTA
    partition are aggregated SEPARATELY and merged by summing partial
    states — sum merges by +, count by +, avg re-derives from the
    merged sums (the algebraic-aggregate decomposition every IVM /
    materialized-view engine rests on, e.g. Gupta & Mumick's classic
    survey, SIGMOD Record 1995).  The oracle is the FULL recompute
    over base + delta, so the hash match IS the proof that
    merge(agg(base), agg(delta)) = agg(base + delta) under this
    engine's quantization.

    At 100 TB this is the nightly pattern: yesterday's view state is a
    few thousand (month, sums) rows; only the delta partition is
    scanned, and the merge is a groupBy over view-grain rows.  Both
    sub-aggregates here are map-side-combined int64-cents sums; the
    merge shuffles view-grain rows only."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.floor(
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        * 100.0
        + F.lit(0.5)
    ).cast("long")
    keyed = li.select(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("long")
        .alias("yyyymm"),
        rev.alias("rev_c"),
        F.col("l_shipdate"),
    )
    cutoff = F.expr(f"TIMESTAMP_NTZ'{IVM_CUTOFF} 00:00:00'")
    base = keyed.filter(F.col("l_shipdate") < cutoff)
    delta = keyed.filter(F.col("l_shipdate") >= cutoff)

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("yyyymm").agg(
            F.sum("rev_c").alias("revenue_c"),
            F.count("*").alias("n_items"),
        )

    merged = (
        partial(base)
        .unionByName(partial(delta))
        .groupBy("yyyymm")
        .agg(
            F.sum("revenue_c").alias("revenue_c"),
            F.sum("n_items").alias("n_items"),
        )
    )
    return merged.selectExpr(
        "CAST(yyyymm AS BIGINT) AS yyyymm",
        "CAST(revenue_c AS BIGINT) AS revenue_c",
        "CAST(n_items AS BIGINT) AS n_items",
        "CAST(revenue_c div n_items AS BIGINT) AS avg_rev_c",
    )


# --- Exact token-budget subsample ---------------------------------------------
# "Give me exactly N tokens of data, deterministically": the mixture /
# ablation primitive — every training-data recipe ends in a token budget,
# and the selection must be reproducible across reruns and engines.
TOKEN_BUDGET = 10_000          # tokens to keep (whitespace-word convention)
BUDGET_MULT = 48271            # MINSTD multiplier — the deterministic shuffle
BUDGET_MOD = 2_147_483_647     # 2^31 - 1 (shared with functions/hashing.py)
BUDGET_MIN_BUCKETS = 256       # order-prefix bucket floor (fixture scale)


def budget_bucket_div(n: int) -> int:
    """Order-prefix divisor for b = max({BUDGET_MIN_BUCKETS}, isqrt(n))
    buckets over the h key space [0, 2^31-1): bkt = h div THIS.  Any
    positive divisor preserves the order-prefix property (bucket
    boundaries respect the global (h, doc_id) order), so the bucket
    count can scale with the corpus — the shared sqrt sizing rule —
    without touching the oracle, whose global-window spec is
    bucket-free.  At a fixed 256 buckets a single task cumulative-sums
    n/256 rows (~4e9 at n = 1e12); sqrt sizing bounds both levels at
    ~sqrt(n): the offset window sees b rows, each in-bucket window
    ~n/b.  Ceil so the bucket count never exceeds b."""
    import math

    b = max(BUDGET_MIN_BUCKETS, math.isqrt(max(n, 1)))
    return max(1, -(-BUDGET_MOD // b))


def with_budget_keys(df: DataFrame, bucket_div: int | None = None) -> DataFrame:
    """Add the deterministic shuffle key h = (doc_id * mult) mod p and its
    ORDER-PREFIX bucket (bkt = h div bucket_div — bucket boundaries
    respect the global (h, doc_id) order, unlike a modulo).  Shared by
    the operator and the property test so both exercise the same key
    derivation.

    doc_id must be non-negative: Spark's pmod and the oracle's ``%``
    agree only for non-negative dividends (DuckDB ``%`` is
    sign-of-dividend), so a negative id would order differently on the
    two engines — asserted here rather than silently diverging."""
    div = bucket_div if bucket_div is not None else budget_bucket_div(0)
    neg_guard = F.when(
        F.assert_true(
            F.col("doc_id") >= 0,
            F.lit("with_budget_keys requires doc_id >= 0"),
        ).isNull(),
        F.col("doc_id"),
    )
    return df.withColumn(
        "h",
        F.pmod(
            F.pmod(neg_guard, F.lit(BUDGET_MOD)) * BUDGET_MULT,
            F.lit(BUDGET_MOD),
        ),
    ).withColumn("bkt", F.expr(f"h div {div}"))


def two_level_budget_prefix(t: DataFrame, budget: int) -> DataFrame:
    """(doc_id, tokens, cum_tokens) for rows whose running token total
    under the global (h, doc_id) order stays within ``budget`` — computed
    as 256 bucket offsets (one bounded unpartitioned window) broadcast
    over PARTITIONED in-bucket cumulative sums, never a global window.
    Shared by pipeline_token_budget_sample and its property test."""
    bsum = t.groupBy("bkt").agg(F.sum("tokens").alias("btok"))
    w_off = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )  # 256-row table: the bounded unpartitioned-window allowance
    boff = bsum.select(
        "bkt",
        F.coalesce(F.sum("btok").over(w_off), F.lit(0)).alias("off"),
    ).filter(F.col("off") <= budget)  # prune hopeless buckets early
    w_cum = (
        Window.partitionBy("bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.join(F.broadcast(boff), "bkt")
        .select(
            "doc_id",
            "tokens",
            (F.sum("tokens").over(w_cum) + F.col("off")).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= budget)
    )


@query(
    "pipeline_token_budget_sample",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             length(text) - length(replace(text, ' ', '')) + 1 AS tokens,
             ((((doc_id % {BUDGET_MOD}) + {BUDGET_MOD}) % {BUDGET_MOD})
               * {BUDGET_MULT}) % {BUDGET_MOD} AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, tokens,
             sum(tokens) OVER (
               ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tokens
      FROM t
    )
    SELECT doc_id, CAST(tokens AS BIGINT) AS tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    """,
)
def pipeline_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic token-budget subsample: order documents by the fixed
    affine permutation h = (doc_id * {BUDGET_MULT}) mod (2^31 - 1) — a
    reproducible shuffle with no RNG state — and keep the prefix whose
    running token total stays within TOKEN_BUDGET ({TOKEN_BUDGET}).
    Output is the kept set with each document's token count and its
    cumulative position, so a recipe can audit exactly where the budget
    landed.

    Scale shape — the oracle's single ``sum() OVER (ORDER BY h)`` is the
    one-reducer global cumulative sum that dies at 100 TB; the engine
    computes the IDENTICAL prefix sum in two bounded levels instead:
    (1) hash rows into b = max(256, isqrt(n)) ORDER-PREFIX buckets
    (bucket = h div ceil(2^31 / b) — bucket boundaries respect the
    global order, unlike a modulo; b sized from one count so both
    levels stay ~sqrt(n)), and aggregate per-bucket token sums (b
    rows); (2) turn those into exclusive bucket offsets with one window
    over the b-row table (the contracted bounded-window allowance) and
    broadcast them back; (3) run
    the in-bucket cumulative sum under a PARTITIONED window and add the
    offset.  Only rows at-or-under the budget survive the filter, so the
    result is budget-bounded regardless of corpus size; the early-bucket
    pruning (skip buckets whose offset already exceeds the budget) is a
    pushed filter on the broadcast join output.  Accumulation is int64
    (corpus tokens ~1e13 at 100 TB, bound 9.2e18; DuckDB sums in
    HUGEINT, cast back)."""
    docs = load_table(spark, sf_dir, "documents")
    # One bounded count() sizes the bucket divisor (buckets =
    # max(256, isqrt(n)), the shared sqrt sizing rule) so no single task
    # ever cumulative-sums more than ~sqrt(n) rows; the oracle is
    # bucket-free (its global window IS the semantic spec), so the
    # bucket count is engine-internal and the hash is unaffected.
    n = docs.count()
    t = with_budget_keys(
        docs.select(
            "doc_id",
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + F.lit(1)
            )
            .cast("long")
            .alias("tokens"),
        ),
        budget_bucket_div(n),
    )
    return two_level_budget_prefix(t, TOKEN_BUDGET)
