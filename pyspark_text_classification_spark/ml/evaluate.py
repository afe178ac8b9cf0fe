"""Distributed evaluation layer (SURVEY.md §2.8 M3-M5).

The reference computes most metrics by collecting predictions to the driver
and running sklearn (sst2_test2.py:95-128, qqp_test.py:146-166,
transformers_test.py:238-255) — a driver OOM at scale. Here every metric is
a distributed aggregate:

- accuracy / weighted F1 / AUC via MLlib evaluators (executor-side jobs)
- confusion matrix as groupBy(label, prediction).count() — the one
  aggregation the reference itself pushed to the cluster (qnli_test.py:183)
- top-k model coefficients as a DataFrame orderBy/limit (replacing the
  driver-side np.argsort at sst2_test2.py:148-161)
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegressionModel
from pyspark.ml.evaluation import (
    BinaryClassificationEvaluator,
    MulticlassClassificationEvaluator,
)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def confusion_matrix_df(
    predictions: DataFrame,
    label_col: str = "label",
    prediction_col: str = "prediction",
) -> DataFrame:
    """Confusion matrix as a relational aggregate (qnli_test.py:183-193)."""
    return predictions.groupBy(label_col, prediction_col).agg(
        F.count("*").alias("cnt")
    )


def binary_metrics(
    predictions: DataFrame,
    label_col: str = "label",
    prediction_col: str = "prediction",
    raw_prediction_col: str = "rawPrediction",
) -> dict[str, float]:
    """accuracy, weighted F1, areaUnderROC — three evaluator jobs.

    Matches the reference's evaluator usage (sst2_test2.py:79-86,
    qqp_test.py:118-133, qnli_test.py:161-174); AUC uses rawPrediction
    (NOT qnli's probability-column inconsistency, SURVEY §2.8 defect #3).
    """
    # Project to the three evaluated columns and eagerly localCheckpoint:
    # the three evaluator jobs then share one tiny materialized table
    # instead of re-running the featurize+score chain each, AND the
    # evaluators' internal RDD operations (BinaryClassificationMetrics
    # sorts by score RDD-side) serialize trivial closures over a
    # checkpointed scan rather than the whole codegen'd pipeline lineage
    # — re-serializing that full lineage was the failure observed after
    # ~200 sequential queries in one JVM (closure-cleaner serialization
    # error inside CachedRDDBuilder/evaluate).
    pruned = predictions.select(
        label_col, prediction_col, raw_prediction_col
    ).localCheckpoint(eager=True)
    acc = MulticlassClassificationEvaluator(
        labelCol=label_col,
        predictionCol=prediction_col,
        metricName="accuracy",
    ).evaluate(pruned)
    f1 = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol=prediction_col, metricName="f1"
    ).evaluate(pruned)
    auc = BinaryClassificationEvaluator(
        labelCol=label_col,
        rawPredictionCol=raw_prediction_col,
        metricName="areaUnderROC",
    ).evaluate(pruned)
    return {"accuracy": acc, "f1": f1, "auc": auc}


def top_k_coefficients(
    spark: SparkSession,
    model: LogisticRegressionModel,
    vocabulary: list[str],
    k: int = 20,
) -> DataFrame:
    """Top-k positive and negative LR coefficients with their vocab terms,
    as a distributed sort (replaces sst2_test2.py:148-161).

    The coefficient vector is bounded by vocabSize (3000 here) so
    parallelizing it is cheap; the orderBy/limit is a TakeOrdered, not a
    full sort.
    """
    coefs = model.coefficients.toArray().tolist()
    rows = [(t, float(c)) for t, c in zip(vocabulary, coefs)]
    df = spark.createDataFrame(rows, schema="term STRING, coefficient DOUBLE")
    pos = df.orderBy(F.col("coefficient").desc()).limit(k).withColumn(
        "direction", F.lit("positive")
    )
    neg = df.orderBy(F.col("coefficient").asc()).limit(k).withColumn(
        "direction", F.lit("negative")
    )
    return pos.unionByName(neg)
