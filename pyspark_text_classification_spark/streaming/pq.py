"""Streaming PQ encoding: fresh embedding vectors compressed to product-
quantization codes against a STATIC codebook — the online path that keeps
a 100 TB compressed vector store current as new data streams in (the
encode half of operators/pq.py, which also serves the stored codes via
ADC).

Execution shape — fully STATELESS per row:

- the M x K codebook (2048 subvectors of 2 ints) is collected ONCE at plan
  build and embedded as literal arithmetic, the same trick the streaming
  near-dup filter uses for its hyperplane array
  (similarity.rowwise_bucket_array_sql): each micro-batch row evaluates
  32 x 64 integer squared distances in-row and takes LEAST over the
  ``d2 * K + code_id`` keys — no stream-side join, no aggregation, no
  watermark, no state;
- statelessness makes batch-split invariance structural: any micro-batch
  partitioning of the input drains to the identical table, so the drained
  replay is held to the batch ``similarity_pq_codes`` oracle row-for-row.

At cluster scale the embedded-literal codebook is exactly a broadcast
variable; refreshing the codebook is a stream restart with a new literal
(codebooks change on retrain, not per batch); the literal codebook is
the PQ_LLOYD_STEPS-trained pq_codebook_refined, so streaming codes match the
batch index bit-for-bit.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.operators.pq import (
    PQ_K,
    PQ_M,
    PQ_SUB,
    trained_codebook,
)
from pyspark_text_classification_spark.registry import ORACLES, query
from pyspark_text_classification_spark.streaming.similarity import (
    EMB_STREAM_SCHEMA,
)
from pyspark_text_classification_spark.operators.similarity import QUANT_SCALE
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def _rowwise_code_exprs(codebook_rows) -> list[F.Column]:
    """(code_m, d2_m) literal-arithmetic expressions for each subspace.

    ``codebook_rows`` is the collected (m, code_id, cq) table. For
    subspace m the expression is LEAST over the K codewords of the
    integer key ``d2 * K + code_id`` where d2 is written out as PQ_SUB
    explicit squared-difference terms against literal codeword
    components — the whole argmin stays inside whole-stage codegen."""
    by_m: dict[int, list[tuple[int, list[int]]]] = {}
    for r in codebook_rows:
        by_m.setdefault(r["m"], []).append((r["code_id"], list(r["cq"])))
    keys = []
    for m in range(PQ_M):
        terms = []
        for code_id, cq in sorted(by_m[m]):
            d2 = " + ".join(
                f"(qv[{m * PQ_SUB + i}] - ({c}L)) * (qv[{m * PQ_SUB + i}] - ({c}L))"
                for i, c in enumerate(cq)
            )
            terms.append(f"(({d2}) * {PQ_K} + {code_id})")
        keys.append(F.expr(f"least({', '.join(terms)})"))
    return keys


def pq_codes_stream_frame(src: DataFrame, codebook_rows) -> DataFrame:
    """The streaming encode plan over any embedding stream: quantize
    in-row, argmin against the literal codebook, emit codes + qerr with
    the batch query's exact column contract."""
    qv = F.transform(
        F.transform("embedding", lambda x: x.cast("double")),
        lambda x: F.floor(x * QUANT_SCALE).cast("long"),
    )
    with_qv = src.select("vec_id", qv.alias("qv"))
    keys = _rowwise_code_exprs(codebook_rows)
    cols = [(k % PQ_K).alias(f"code_{m}") for m, k in enumerate(keys)]
    qerr = None
    for k in keys:
        d2 = (k / PQ_K).cast("long")  # keys are non-negative: trunc == div
        qerr = d2 if qerr is None else qerr + d2
    return with_qv.select("vec_id", *cols, qerr.alias("qerr"))


@query("similarity_stream_pq_codes")
def similarity_stream_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(embeddings) -> stateless in-row PQ encode -> memory sink,
    drained with availableNow; held to the batch similarity_pq_codes
    oracle (registered below once the batch module has registered it)."""
    cb_rows = trained_codebook(spark, sf_dir).collect()
    src = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "embeddings.parquet")
        .load(sf_dir)
    )
    frame = pq_codes_stream_frame(src, cb_rows)
    sink_name = f"stream_pq_codes_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            frame.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink_name).localCheckpoint(eager=True)


# the streaming twin answers to the batch query's oracle verbatim
ORACLES["similarity_stream_pq_codes"] = ORACLES["similarity_pq_codes"]
