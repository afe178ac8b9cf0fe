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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.text import tokenize
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
    toks = tokenize("text")
    q = docs.select(
        "doc_id", "text", F.size(toks).cast("long").alias("n_tokens")
    ).filter(F.col("n_tokens") >= MIN_TOKENS)
    return q.groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_copies"),
    ).select("doc_id", "n_tokens", "n_copies")
