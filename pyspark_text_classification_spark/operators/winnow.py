"""Winnowing document fingerprints (MOSS) for substring-level near-dup.

Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting" (SIGMOD 2003): hash every k-gram, then keep only the
MINIMUM hash of each sliding window of w consecutive k-gram hashes.  The
guarantee: any shared substring of at least w + k - 1 tokens produces at
least one shared fingerprint, while the fingerprint density is ~2/(w+1)
of all positions — the index is a fixed fraction of corpus size
regardless of document length.

Relational formulation (contrast with dedup_minhash_lsh, which is
whole-document resemblance): winnowed fingerprints catch PARTIAL overlap
— quotations, mirrored paragraphs, template reuse — that document-level
MinHash dilutes away.  Pipeline:

1. per-position k-gram hashes: one transform over the token-hash array
   (each char hashed once; hashing.py's shingle fold);
2. winnow in-row: position i keeps min(hs[i..i+w-1]) — an O(m*w)
   higher-order-function pass entirely inside whole-stage codegen, no
   explode until the fingerprint set is already ~2/(w+1) sparse;
3. fingerprint postings: explode + hash-distinct (doc_id, fp);
4. frequency cap: fingerprints in > FP_MAX_DOCS documents are dropped
   (boilerplate guard — same role as the LSH bucket cap), bounding the
   pair join's per-key fan-out at C(FP_MAX_DOCS, 2);
5. candidate pairs: postings self-join on fp, count shared fingerprints,
   keep pairs sharing >= MIN_SHARED.

Scale shape (100 TB): the only shuffles are the fingerprint distinct and
the pair aggregate, both hash-partitioned on bounded-fan-out keys; the
winnowing itself is map-side.  All hashes are the cross-engine polynomial
family (functions/hashing.py), so the whole pipeline is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    _poly_hash_sql,
    sql_char_poly_hash,
    sql_token_shingle_hashes,
    token_shingle_hashes_sql,
)
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

_SPARK_TOKS = r"filter(split(lower(text), '\\W+'), t -> length(t) >= 2)"
_SQL_TOKS = r"list_filter(str_split_regex(lower(text), '\W+'), t -> length(t) >= 2)"

WINNOW_K = 3   # k-gram length (tokens)
WINNOW_W = 4   # winnowing window; guarantee threshold = w + k - 1 = 6 tokens
FP_MAX_DOCS = 64   # drop fingerprints appearing in more docs (boilerplate)
MIN_SHARED = 3     # pairs must share at least this many fingerprints


def winnowed_fingerprints(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, fp) winnowed fingerprints per document.

    The min-of-window selection runs as an in-row transform over the
    per-position k-gram hash array — documents shorter than one window
    contribute their single global min, so every non-empty document has
    at least one fingerprint.
    """
    th = f"transform({_SPARK_TOKS}, t -> {_poly_hash_sql('t')})"
    hs = token_shingle_hashes_sql("th", WINNOW_K)
    fps = (
        f"CASE WHEN size(hs) <= {WINNOW_W} THEN array(array_min(hs)) "
        f"ELSE transform(sequence(1, size(hs) - {WINNOW_W - 1}), "
        f"i -> array_min(slice(hs, i, {WINNOW_W}))) END"
    )
    return (
        fan_out(docs)
        .selectExpr("doc_id", f"{th} AS th")
        .selectExpr("doc_id", f"{hs} AS hs")
        .selectExpr("doc_id", f"explode({fps}) AS fp")
        .distinct()
    )


_SQL_FPS = f"""
    SELECT DISTINCT doc_id, fp FROM (
      SELECT doc_id, unnest(
        CASE WHEN length(hs) <= {WINNOW_W} THEN [list_min(hs)]
        ELSE list_transform(range(1, length(hs) - {WINNOW_W - 2}),
             i -> list_min(list_slice(hs, i, i + {WINNOW_W - 1}))) END) AS fp
      FROM (
        SELECT doc_id, {sql_token_shingle_hashes('th', WINNOW_K)} AS hs
        FROM (SELECT doc_id,
                     list_transform({_SQL_TOKS},
                                    t -> {sql_char_poly_hash('t')}) AS th
              FROM documents)
      )
    )
"""


@query(
    "dedup_winnowing",
    oracle=f"""
    WITH fps AS ({_SQL_FPS}),
    freq AS (SELECT fp, count(*) AS nf FROM fps GROUP BY 1),
    keep AS (
      SELECT f.doc_id, f.fp
      FROM fps f JOIN freq ON freq.fp = f.fp
      WHERE freq.nf <= {FP_MAX_DOCS}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared_fps
    FROM keep a JOIN keep b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {MIN_SHARED}
    """,
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level near-dup candidates via winnowed fingerprints:
    pairs of documents sharing >= {MIN_SHARED} selected k-gram hashes.

    Complements dedup_minhash_lsh (whole-document resemblance): the
    winnowing guarantee means any shared run of >= {WINNOW_W + WINNOW_K
    - 1} tokens is caught even when the rest of the two documents is
    unrelated.  The frequency cap drops boilerplate fingerprints before
    the self-join, bounding per-key fan-out (the same hot-key guard as
    the LSH bucket cap and the Adamic-Adar hub cap)."""
    docs = load_table(spark, sf_dir, "documents")
    fps = winnowed_fingerprints(docs).localCheckpoint(eager=True)
    freq = fps.groupBy("fp").agg(F.count("*").alias("nf"))
    keep = (
        fps.join(freq, "fp")
        .filter(F.col("nf") <= FP_MAX_DOCS)
        .select("doc_id", "fp")
    )
    a = keep.alias("a")
    b = keep.select(
        F.col("fp").alias("bfp"), F.col("doc_id").alias("doc_b")
    ).alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("bfp"))
               & (F.col("a.doc_id") < F.col("doc_b")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= MIN_SHARED)
    )
