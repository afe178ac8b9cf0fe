"""Streaming corpus-admission gate: incoming documents checked against a
STATIC corpus index for exact and near duplication — dedup_incremental_
ingest's decision table computed online, one decision per arriving doc.

Execution shape (stateless except the final per-doc decision aggregate):

- static side, built once per (re)plan: the existing corpus' content-hash
  set, its LSH band table (the batch minhash_band_signatures machinery),
  and its per-doc sorted shingle-hash SETS as arrays (so the stream-side
  Jaccard verify is one in-row array_intersect, no aggregation);
- stream side: every signature is computed IN-ROW — char-hash tokens,
  2-shingle hashes, array_distinct to set semantics, the 32 permutation
  minima as array_min folds (min over a set equals min over the multiset,
  so the in-row form is bit-identical to the batch hash-aggregate), and
  the 8 band signatures — then posexplode(bands) feeds the stream-static
  band equi-join;
- decisions: exact membership (stream-static left join on content hash)
  and verified near-dups (candidate join + in-row Jaccard >= 0.8, the
  SAME round-to-4-then-compare arithmetic as the batch verify) reduce via
  ONE min-priority aggregate: exact(0) beats near_dup(1) beats
  admitted(2) — the only stateful stage, complete-mode drained.

Held to dedup_incremental_ingest's oracle verbatim: the same incoming
partition (doc_id % 10 == 7) against the same existing corpus must get
identical decisions on a drained replay.  At 100 TB the static index is
a precomputed bucketed table (band-join co-located) and the stream side
stays map-local until the |incoming|-bounded decision aggregate.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.hashing import (
    BAND_ROWS,
    HASH_MOD,
    MINHASH_PERMS,
    _poly_hash_sql,
    char_poly_hash,
    token_shingle_hashes_sql,
)
from pyspark_text_classification_spark.operators.dedup import (
    INGEST_MOD,
    INGEST_REM,
    minhash_band_signatures,
    shingle_hashes,
)
from pyspark_text_classification_spark.functions.text import round_half_up
from pyspark_text_classification_spark.registry import ORACLES, query
from pyspark_text_classification_spark.sources.parquet import load_table
from pyspark_text_classification_spark.streaming.infer import (
    DOCS_STREAM_SCHEMA,
)

_SPARK_TOKS = r"filter(split(lower(text), '\\W+'), t -> length(t) >= 2)"
_N_BANDS = len(MINHASH_PERMS) // BAND_ROWS
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def _rowwise_bands_sql() -> tuple[str, str]:
    """(sh_set_expr, bands_expr): in-row shingle SET and the 8-element
    band-signature array over it (exprs reference a ``sh`` column)."""
    th = f"transform({_SPARK_TOKS}, t -> {_poly_hash_sql('t')})"
    sh_set = f"array_distinct({token_shingle_hashes_sql(th, 2)})"
    mins = ", ".join(
        f"array_min(transform(sh, h -> ({a}L * h + {b}L) % {HASH_MOD}L))"
        for _p, a, b in MINHASH_PERMS
    )
    bands = ", ".join(
        "concat_ws('-', "
        + ", ".join(
            f"CAST(mins[{band * BAND_ROWS + r}] AS STRING)"
            for r in range(BAND_ROWS)
        )
        + ")"
        for band in range(_N_BANDS)
    )
    return sh_set, f"array({bands})"


def stream_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(documents) -> incoming filter -> in-row signatures ->
    stream-static exact/band joins -> min-priority decision aggregate ->
    complete-mode memory sink, drained with availableNow."""
    docs = load_table(spark, sf_dir, "documents")
    is_inc = F.col("doc_id") % INGEST_MOD == INGEST_REM
    existing = docs.filter(~is_inc)
    ex_hashes = (
        existing.select(char_poly_hash("text").alias("th"))
        .distinct()
        .withColumn("seen", F.lit(1))
        .localCheckpoint(eager=True)
    )
    ex_sh = shingle_hashes(existing, 2)
    ex_sets = (
        ex_sh.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("h")).alias("ex_arr"))
        .select(
            F.col("doc_id").alias("ex_id"),
            "ex_arr",
            F.size("ex_arr").alias("n_b"),
        )
        .localCheckpoint(eager=True)
    )
    ex_bands = (
        minhash_band_signatures(ex_sh)
        .select(F.col("doc_id").alias("ex_id"), "band", "sig")
        .localCheckpoint(eager=True)
    )

    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
        .filter(is_inc)
    )
    sh_set, bands = _rowwise_bands_sql()
    mins = ", ".join(
        f"array_min(transform(sh, h -> ({a}L * h + {b}L) % {HASH_MOD}L))"
        for _p, a, b in MINHASH_PERMS
    )
    sig = (
        src.selectExpr("doc_id", "text", f"{sh_set} AS sh")
        .selectExpr(
            "doc_id", "text", "sh", "size(sh) AS n_a",
            f"array({mins}) AS mins",
        )
        .selectExpr("doc_id", "text", "sh", "n_a", f"{bands} AS bandsigs")
    )
    # exact gate: priority 0 on membership, else admitted (2)
    d_exact = (
        sig.select(
            "doc_id", char_poly_hash("text").alias("th")
        )
        .join(F.broadcast(ex_hashes), "th", "left")
        .select(
            "doc_id",
            F.when(F.col("seen").isNotNull(), F.lit(0))
            .otherwise(F.lit(2))
            .alias("prio"),
        )
    )
    # near gate: band-bucket candidates, in-row Jaccard verify (same
    # round-then-compare arithmetic as the batch oracle)
    cand = (
        sig.selectExpr(
            "doc_id", "sh", "n_a", "posexplode(bandsigs) AS (band, sig)"
        )
        .join(ex_bands, ["band", "sig"])
        .select("doc_id", "sh", "n_a", "ex_id")
        .join(ex_sets, "ex_id")
    )
    inter = F.size(F.array_intersect(F.col("sh"), F.col("ex_arr")))
    jac4 = round_half_up(
        inter / (F.col("n_a") + F.col("n_b") - inter), 4
    )
    d_near = (
        cand.filter(jac4 >= 0.8)
        .select("doc_id", F.lit(1).alias("prio"))
    )
    decisions = (
        d_exact.unionByName(d_near)
        .groupBy("doc_id")
        .agg(F.min("prio").alias("p"))
        .select(
            "doc_id",
            F.when(F.col("p") == 0, "exact")
            .when(F.col("p") == 1, "near_dup")
            .otherwise("admitted")
            .alias("decision"),
        )
    )
    sink_name = f"stream_ingest_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            decisions.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    for df in (ex_hashes, ex_sets, ex_bands):
        df.unpersist()
    return spark.table(sink_name)


# held to the batch admission gate's oracle verbatim
query(
    "dedup_stream_ingest",
    oracle=ORACLES["dedup_incremental_ingest"],
)(stream_ingest_gate)
