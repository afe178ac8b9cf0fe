"""End-to-end GLUE task runner: the reference's four driver scripts as ONE
parameterized, library-grade entry point.

A user of the reference runs ``python sst2_test2.py`` / ``qqp_test.py`` /
``qnli_test.py`` against ``./glue/<TASK>/{train,dev}.tsv``; here the same
workflow is ``run_glue_task(spark, "sst2", train, dev, out_dir)``:

    TSV scan (explicit schema, QQP quote mode)      S1-S3
    -> column normalize + native label cleanup      P1-P5, U1 (no UDF)
    -> pair concat ([SEP] / trim+space)             F1-F3
    -> null/length filters                          P6-P9
    -> recipe fit (tokenize->featurize->LR)         T1-T8, M1-M2
    -> distributed eval + confusion matrix          M3-M5
    -> prediction sink (parquet + CSV), model save, S4-S6, S7
       metrics JSON

Differences from the reference, by design (SURVEY.md §4/§7): no
inferSchema double-scan, zero Python row UDFs in the cleanup (native
when/concat/filter expressions), evaluation stays distributed (no
sklearn-on-collect), and the prediction export carries the probability
through ``vector_to_array`` (VectorUDT never crosses the engine boundary).
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_text_classification_spark.ml.evaluate import (
    binary_metrics,
    confusion_matrix_df,
)
from pyspark_text_classification_spark.ml.pipelines import (
    fit_text_classifier,
    save_model,
)
from pyspark_text_classification_spark.ml.reporting import write_metrics_report
from pyspark_text_classification_spark.sources.csv import read_tsv, write_csv
from pyspark_text_classification_spark.sources.parquet import write_parquet

# Explicit TSV schemas (SURVEY.md §1.4) — inferSchema is banned in the
# engine (double-scan, brittle types at scale).
GLUE_SCHEMAS = {
    "sst2": "sentence STRING, label INT",
    "qqp": (
        "id INT, qid1 INT, qid2 INT, "
        "question1 STRING, question2 STRING, is_duplicate INT"
    ),
    "qnli": "index INT, question STRING, sentence STRING, label STRING",
}


def load_glue_task(spark: SparkSession, task: str, path: str) -> DataFrame:
    """Read one GLUE split and normalize it to (text, label double).

    Per-task cleanup mirrors the reference's semantics with native
    expressions:
    - sst2: sentence as-is, dropna (sst2_test2.py:40-41)
    - qqp:  null-PROPAGATING '[SEP]' concat (qqp_test.py:44) after a
            subset na.drop (qqp_test.py:41); quote/escape TSV mode
    - qnli: entailment->0 / not_entailment->1 / else try_cast int — the
            clean_label UDF (qnli_test.py:82-96) as a CASE expression —
            then null-skipping trim concat + length filter
            (qnli_test.py:99-113)
    """
    if task == "sst2":
        df = read_tsv(spark, path, GLUE_SCHEMAS[task])
        return df.na.drop().select(
            F.col("sentence").alias("text"),
            F.col("label").cast("double").alias("label"),
        )
    if task == "qqp":
        df = read_tsv(spark, path, GLUE_SCHEMAS[task], quoted=True)
        return (
            df.na.drop(subset=["question1", "question2", "is_duplicate"])
            .select(
                F.concat(
                    F.col("question1"), F.lit(" [SEP] "), F.col("question2")
                ).alias("text"),
                F.col("is_duplicate").cast("double").alias("label"),
            )
            .filter(F.col("text").isNotNull())
        )
    if task == "qnli":
        df = read_tsv(spark, path, GLUE_SCHEMAS[task])
        label = (
            F.when(F.col("label") == "not_entailment", F.lit(1))
            .when(F.col("label") == "entailment", F.lit(0))
            .otherwise(F.col("label").try_cast("int"))
        )
        return (
            df.select(
                F.concat_ws(
                    " ", F.trim(F.col("question")), F.trim(F.col("sentence"))
                ).alias("text"),
                label.cast("double").alias("label"),
            )
            .filter(F.col("label").isNotNull())
            .filter(F.length("text") > 0)
        )
    raise ValueError(f"unknown GLUE task {task!r}; expected sst2|qqp|qnli")


def run_glue_task(
    spark: SparkSession,
    task: str,
    train_path: str,
    dev_path: str,
    output_dir: str,
    write_csv_copy: bool = True,
) -> dict[str, Any]:
    """Train + evaluate one GLUE task end to end; returns the metric dict.

    Artifacts under ``output_dir``: predictions.parquet (+ .csv),
    confusion.parquet, model/, metrics.json — the reference's sink surface
    (S4-S7) with distributed writers.
    """
    train = load_glue_task(spark, task, train_path)
    dev = load_glue_task(spark, task, dev_path)

    model = fit_text_classifier(train, recipe=task)
    preds = model.transform(dev).cache()
    try:
        metrics = binary_metrics(preds)
        confusion = confusion_matrix_df(preds)

        export = preds.select(
            "text",
            "label",
            "prediction",
            vector_to_array(F.col("probability"))[1].alias("positive_prob"),
        )
        write_parquet(export, os.path.join(output_dir, "predictions.parquet"))
        if write_csv_copy:
            write_csv(export, os.path.join(output_dir, "predictions.csv"))
        write_parquet(confusion, os.path.join(output_dir, "confusion.parquet"))
        save_model(model, os.path.join(output_dir, "model"))
        write_metrics_report(
            metrics, os.path.join(output_dir, "metrics.json"), run_name=task
        )
        return metrics
    finally:
        preds.unpersist()


def main(argv: list[str] | None = None) -> None:
    """CLI parity with the reference's ``python <task>_test.py`` scripts:

        python -m pyspark_text_classification_spark.runner sst2 \
            ./glue/SST-2/train.tsv ./glue/SST-2/dev.tsv ./out/sst2
    """
    import argparse

    from pyspark_text_classification_spark.session import get_session

    ap = argparse.ArgumentParser(description="Run one GLUE task end to end")
    ap.add_argument("task", choices=sorted(GLUE_SCHEMAS))
    ap.add_argument("train_tsv")
    ap.add_argument("dev_tsv")
    ap.add_argument("output_dir")
    args = ap.parse_args(argv)

    spark = get_session(app_name=f"glue-{args.task}")
    metrics = run_glue_task(
        spark, args.task, args.train_tsv, args.dev_tsv, args.output_dir
    )
    print({k: round(v, 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
