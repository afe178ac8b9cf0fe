"""Declared, oracle-checkable query registry (SURVEY.md §2.9 Q1-Q18 + extensions).

Each entry pairs a Spark DataFrame program with the equivalent ANSI SQL that
DuckDB runs over the same parquet tables. The driver hash-matches the two at
sf0.01 (order-insensitive, columns sorted by name), so:

- every computed column is aliased identically on both sides;
- every derived double goes through ``round_half_up`` (identical IEEE ops in
  both engines — floor(x*10^d+0.5)/10^d — immune to the engines' different
  native round() tie-breaking);
- casts use try_cast/floor because DuckDB CAST(double AS int) rounds while
  Spark truncates, and Spark 4 runs ANSI mode by default;
- timestamps are exported as epoch seconds; arrays as joined strings.

Registry shape: ``QUERIES[name] -> fn(spark, sf_dir) -> DataFrame`` and
``ORACLES[name] -> SQL string`` (absent for non-SQL-expressible ops, which
the driver checks rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.text import (
    ENGLISH_STOPWORDS,
    guard_empty_tokens,
    normalize_binary_label,
    remove_stopwords,
    round_half_up,
    sql_round_half_up,
    sql_string_list,
    tokenize,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

_STOPWORD_SQL = sql_string_list(ENGLISH_STOPWORDS)

# DuckDB twin of functions.text.tokenize(text, min_token_length=2)
_SQL_TOKENS = r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"


# ---------------------------------------------------------------------------
# Q1-Q11, Q16, Q18 — relational core (scans, projections, filters, aggregates)
# ---------------------------------------------------------------------------


@query(
    "q01_scan_project",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_returnflag, l_quantity
    FROM lineitem
    """,
)
def q01_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 scan + P4 narrow projection (SURVEY §2.9 Q1).

    Column pruning: only 5 of 11 lineitem columns reach the scan
    (ReadSchema in .explain shows the pruned struct).
    """
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_quantity"
    )


@query(
    "q02_casts",
    oracle="""
    SELECT
      l_orderkey,
      CAST(floor(l_quantity) AS INTEGER)  AS qty_int,
      CAST(l_linenumber AS BIGINT)        AS linenumber_long,
      CAST(l_partkey AS DOUBLE)           AS partkey_double
    FROM lineitem
    """,
)
def q02_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/F5 type casts (SURVEY §2.9 Q2; reference qqp_test.py:34-41).

    floor() before the double->int cast because DuckDB CAST rounds while
    Spark truncates; floor makes both exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.floor("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("long").alias("linenumber_long"),
        F.col("l_partkey").cast("double").alias("partkey_double"),
    )


@query(
    "q03_notnull_length_filter",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE text IS NOT NULL AND length(text) > 0
    """,
)
def q03_notnull_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/P7/F4 null + length predicates (SURVEY §2.9 Q3; qnli_test.py:101,112-113).

    Both predicates are Catalyst-pushable into the parquet scan
    (PushedFilters: IsNotNull(text))."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").isNotNull() & (F.length("text") > 0)).select(
        "doc_id", "n_chars"
    )


@query(
    "q04_dropna_subset",
    oracle="""
    SELECT event_id, user_id
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    """,
)
def q04_dropna_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/P9 null-drop on a column subset (SURVEY §2.9 Q4; qqp_test.py:41)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.na.drop(subset=["event_type", "value"]).select("event_id", "user_id")


@query(
    "q05_concat_trim",
    oracle="""
    SELECT
      c_custkey,
      concat_ws(' ', trim(c_name), trim(c_mktsegment)) AS joined_ws,
      trim(c_name) || ' [SEP] ' || trim(c_mktsegment)  AS joined_cat
    FROM customer
    """,
)
def q05_concat_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3 concat_ws (null-skipping, qnli_test.py:108-109) vs concat
    (null-propagating, qqp_test.py:44) with trim (SURVEY §2.9 Q5).

    DuckDB's concat() ignores NULLs, so the oracle twin of Spark's
    null-propagating concat is the || operator."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.concat_ws(" ", F.trim("c_name"), F.trim("c_mktsegment")).alias("joined_ws"),
        F.concat(
            F.trim("c_name"), F.lit(" [SEP] "), F.trim("c_mktsegment")
        ).alias("joined_cat"),
    )


@query(
    "q06_case_mapping",
    oracle="""
    SELECT
      o_orderkey,
      CAST(CASE o_orderstatus
             WHEN 'F' THEN 0 WHEN 'O' THEN 1 WHEN 'P' THEN 2
             ELSE -1 END AS DOUBLE) AS status_code
    FROM orders
    """,
)
def q06_case_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 when/otherwise label mapping (SURVEY §2.9 Q6; transformers_test.py:220-232)."""
    orders = load_table(spark, sf_dir, "orders")
    status = F.col("o_orderstatus")
    return orders.select(
        "o_orderkey",
        F.when(status == "F", 0)
        .when(status == "O", 1)
        .when(status == "P", 2)
        .otherwise(-1)
        .cast("double")
        .alias("status_code"),
    )


@query(
    "q07_bucket_histogram",
    oracle="""
    SELECT mod(o_orderkey, 20) AS bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY 1
    """,
)
def q07_bucket_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 modulo bucketing histogram (SURVEY §2.9 Q7; transformers_test.py:207-210).

    The engine's production variant uses pmod(hash(id), n) for skew-free
    buckets; keys here are non-negative so pmod == mod for the oracle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(F.pmod("o_orderkey", F.lit(20)).alias("bucket")).groupBy(
        "bucket"
    ).agg(F.count("*").alias("cnt"))


@query(
    "q08_table_counts",
    oracle="""
    SELECT 'lineitem' AS tbl, CAST(count(*) AS BIGINT) AS n FROM lineitem
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'region', count(*) FROM region
    UNION ALL SELECT 'events', count(*) FROM events
    UNION ALL SELECT 'documents', count(*) FROM documents
    UNION ALL SELECT 'embeddings', count(*) FROM embeddings
    """,
)
def q08_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 full-table counts for every table (SURVEY §2.9 Q8).

    count() is a metadata-only parquet scan (no column decode) — the
    cheapest possible action at any scale."""
    names = [
        "lineitem", "orders", "customer", "part", "supplier",
        "nation", "region", "events", "documents", "embeddings",
    ]
    dfs = [
        load_table(spark, sf_dir, n)
        .agg(F.count("*").alias("n"))
        .select(F.lit(n).alias("tbl"), "n")
        for n in names
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


@query(
    "q09_group_count_2keys",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q09_group_count_2keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 two-key group count — the confusion-matrix shape
    (SURVEY §2.9 Q9; qnli_test.py:183-193). Partial aggregation
    (map-side combine) happens automatically: low-cardinality keys mean
    the shuffle carries only (key, partial-count) rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("cnt"))


@query(
    "q10_describe_stats",
    oracle=f"""
    SELECT
      CAST(count(length(text)) AS BIGINT)                       AS cnt,
      {sql_round_half_up('avg(length(text))', 4)}               AS avg_len,
      {sql_round_half_up('stddev_samp(length(text))', 4)}       AS stddev_len,
      CAST(min(length(text)) AS BIGINT)                         AS min_len,
      CAST(max(length(text)) AS BIGINT)                         AS max_len
    FROM documents
    """,
)
def q10_describe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 describe() equivalence: count/avg/stddev_samp/min/max of text
    length (SURVEY §2.9 Q10; qnli_test.py:117-118).

    Lengths are integers so the double sums are exact; only the final
    divisions can diverge by ulps, absorbed by round_half_up(4)."""
    docs = load_table(spark, sf_dir, "documents")
    ln = F.length("text")
    return docs.agg(
        F.count(ln).alias("cnt"),
        round_half_up(F.avg(ln), 4).alias("avg_len"),
        round_half_up(F.stddev_samp(ln), 4).alias("stddev_len"),
        F.min(ln).cast("long").alias("min_len"),
        F.max(ln).cast("long").alias("max_len"),
    )


@query(
    "q11_topk_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q11_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1/L2/L4 deterministic top-k (SURVEY §2.9 Q11). Spark plans
    orderBy+limit as TakeOrderedAndProject — a per-partition top-k then a
    driver merge of k*numPartitions rows, never a full sort shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderkey", "o_totalprice").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    ).limit(10)


@query(
    "q16_label_index",
    oracle="""
    SELECT o_orderstatus AS label,
           CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderstatus) - 1
                AS DOUBLE) AS label_index
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q16_label_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 StringIndexer semantics, made deterministic (SURVEY §2.9 Q16;
    qqp_test.py:88-91): frequency-descending index with an explicit
    alphabetical tie-break (MLlib leaves ties unspecified — SURVEY §7.4.1)."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_orderstatus").alias("label")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("label"))
    return counts.select(
        "label", (F.row_number().over(w) - 1).cast("double").alias("label_index")
    )


@query(
    "q18_label_normalize",
    oracle="""
    SELECT event_id, label FROM (
      SELECT event_id,
             CASE WHEN event_type IN ('click', 'purchase') THEN 1
                  WHEN event_type IN ('view', 'signup')    THEN 0
                  ELSE TRY_CAST(event_type AS INTEGER) END AS label
      FROM events
    ) WHERE label IS NOT NULL
    """,
)
def q18_label_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 label normalization with int-cast fallback + null filter
    (SURVEY §2.9 Q18; qnli_test.py:82-105) — CASE + try_cast, no Python UDF."""
    ev = load_table(spark, sf_dir, "events")
    out = ev.select(
        "event_id",
        normalize_binary_label(
            "event_type",
            one_values=["click", "purchase"],
            zero_values=["view", "signup"],
        ).alias("label"),
    )
    return out.filter(F.col("label").isNotNull())


# ---------------------------------------------------------------------------
# Q12-Q15, Q17 — tokenization pipeline (the reference's core text ops)
# ---------------------------------------------------------------------------


@query(
    "q12_tokenize_explode",
    oracle=f"""
    SELECT doc_id, unnest({_SQL_TOKENS}) AS token
    FROM documents
    """,
)
def q12_tokenize_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 RegexTokenizer as native split/filter/explode (SURVEY §2.9 Q12;
    sst2_test2.py:50, qnli_test.py:121). Stays inside whole-stage codegen —
    no Python worker, no MLlib transformer object."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", F.explode(tokenize("text", 2)).alias("token"))


@query(
    "q13_stopword_filter",
    oracle=f"""
    SELECT doc_id, token
    FROM (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
    WHERE token NOT IN ({_STOPWORD_SQL})
    """,
)
def q13_stopword_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 StopWordsRemover as an anti-filter against the embedded MLlib
    English list (SURVEY §2.9 Q13; sst2_test2.py:51)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = remove_stopwords(tokenize("text", 2))
    return docs.select("doc_id", F.explode(toks).alias("token"))


@query(
    "q14_vocabulary",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents)
    SELECT token,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(count(*) AS BIGINT)               AS tf
    FROM toks
    GROUP BY token
    """,
)
def q14_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3-fit relational core: per-token document frequency and term
    frequency via explode + groupBy (SURVEY §2.9 Q14; sst2_test2.py:52).
    CountVectorizer's top-V selection is this table + orderBy desc limit V
    (tie-ambiguous, so the declared query is the full table)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokenize("text", 2)).alias("token"))
    return toks.groupBy("token").agg(
        F.count_distinct("doc_id").alias("df"), F.count("*").alias("tf")
    )


@query(
    "q15_idf",
    oracle=f"""
    WITH toks AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents),
    dfreq AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
    ),
    total AS (SELECT count(*) AS n_docs FROM documents)
    SELECT token, CAST(df AS BIGINT) AS df,
           {sql_round_half_up('ln((n_docs + 1.0) / (df + 1.0))', 6)} AS idf
    FROM dfreq, total
    WHERE df >= 5
    """,
)
def q15_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 IDF fit: idf(t) = ln((N+1)/(df+1)) with minDocFreq=5
    (SURVEY §2.9 Q15; qqp_test.py:82-86, sst2_test2.py:53).

    N arrives via a 1-row broadcast cross join (BroadcastNestedLoopJoin of
    a single aggregate row — no shuffle of the vocab side)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(tokenize("text", 2)).alias("token"))
    dfreq = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    total = docs.agg(F.count("*").alias("n_docs"))
    return (
        dfreq.crossJoin(F.broadcast(total))
        .filter(F.col("df") >= 5)
        .select(
            "token",
            F.col("df").cast("long").alias("df"),
            round_half_up(
                F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))), 6
            ).alias("idf"),
        )
    )


@query(
    "q17_empty_token_guard",
    oracle=f"""
    SELECT doc_id,
           array_to_string(
             CASE WHEN length({_SQL_TOKENS}) = 0 THEN ['unknown']
                  ELSE {_SQL_TOKENS} END, ' ') AS tokens_str
    FROM documents
    """,
)
def q17_empty_token_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 EmptyListHandler semantics as pure CASE (SURVEY §2.9 Q17;
    qnli_test.py:23-49). Arrays are exported as space-joined strings so the
    cross-engine value hash is representation-independent."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = guard_empty_tokens(tokenize("text", 2))
    return docs.select(
        "doc_id", F.array_join(toks, " ").alias("tokens_str")
    )
