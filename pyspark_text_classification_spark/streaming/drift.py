"""Streaming distribution-drift monitor: the per-source KL divergence
(operators/textstats.text_kl_drift) fed by an incremental stream.

Shape: the only corpus-sized work — tokenize + explode + (source, token)
counting — runs INSIDE the stream as a complete-mode stateful aggregate,
so each micro-batch folds its tokens into the running counts and the
state store holds only the vocabulary-bounded count table.  The KL
finisher (vocab-bounded joins + micro-nat quantized terms) runs on the
drained counts and is shared verbatim with the batch query, which is why
the drained stream is held to the batch DuckDB oracle.

At 100 TB the monitor runs continuously: each trigger updates
sources x vocab counters and re-emits the KL row per source — the
dashboard alarm loop — while no document is ever reprocessed.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.functions.text import tokenize
from pyspark_text_classification_spark.operators.textstats import (
    kl_from_source_token_counts,
)
from pyspark_text_classification_spark.registry import ORACLES as _ORACLES
from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.streaming.infer import DOCS_STREAM_SCHEMA
from pyspark_text_classification_spark.streaming.state import (
    scoped_state_partitions,
)


def stream_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(documents) -> explode tokens -> complete-mode
    (source, token) count aggregate -> drain -> shared KL finisher."""
    src = (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )
    counts = (
        src.select("source", F.explode(tokenize("text", 2)).alias("token"))
        .groupBy("source", "token")
        .agg(F.count("*").alias("cnt_s"))
    )
    sink_name = f"stream_kl_{uuid.uuid4().hex[:8]}"
    with scoped_state_partitions(spark):
        q = (
            counts.writeStream.format("memory")
            .queryName(sink_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # the finisher self-joins its input three ways; a MemoryPlan view
    # cannot be deduplicated by the analyzer, so pin the (vocab-bounded)
    # drained counts as a concrete plan first
    counts_static = spark.table(sink_name).localCheckpoint()
    return kl_from_source_token_counts(counts_static)


# held to the batch query's oracle: a drained full replay must equal the
# one-shot batch computation
query("text_stream_kl_drift", oracle=_ORACLES["text_kl_drift"])(stream_kl_drift)
