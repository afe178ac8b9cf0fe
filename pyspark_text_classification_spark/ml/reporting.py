"""Reporting layer (SURVEY.md §2.1 S7/S8, §7.2 layer 6).

The reference writes PNG plots, JSON reports, error logs, and MLflow runs
from full driver-side collections (sst2_test2.py:122-210,
transformers_test.py:259-342). The engine's rule: every report is fed by a
SMALL AGGREGATED DataFrame (confusion matrix, metric rows, ROC points) —
never a full prediction collection — so reporting cost is independent of
corpus size.

MLflow and matplotlib are optional runtime deps, gated behind import-try
(absent in this build); the JSON report path has no extra dependencies.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def roc_points(
    predictions: DataFrame,
    label_col: str = "label",
    prob_col: str = "positive_prob",
    n_bins: int = 100,
) -> DataFrame:
    """ROC curve coordinates as a distributed aggregate: bucket the
    positive probability into n_bins thresholds and compute cumulative
    TPR/FPR — replaces sklearn.roc_curve over a full collect
    (sst2_test2.py:105-128). Returns ~n_bins rows regardless of scale."""
    binned = predictions.select(
        F.least(
            F.floor(F.col(prob_col) * n_bins).cast("int"), F.lit(n_bins - 1)
        ).alias("bin"),
        F.col(label_col).cast("int").alias("y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("y").alias("pos"), F.count("*").alias("n")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    totals = per_bin.select(
        "bin",
        F.sum("pos").over(w).alias("cum_pos"),
        (F.sum("n").over(w) - F.sum("pos").over(w)).alias("cum_neg"),
    )
    return totals.select(
        (F.col("bin") / n_bins).alias("threshold"),
        "cum_pos",
        "cum_neg",
    )


def write_metrics_report(
    metrics: dict[str, Any], path: str, run_name: str = "run"
) -> None:
    """JSON metrics report (qnli_test.py:274-281 pattern, no plots dep)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"run": run_name, "metrics": metrics}, f, indent=2)


def log_to_mlflow(
    metrics: dict[str, float],
    params: dict[str, Any] | None = None,
    experiment: str = "pyspark-text-classification",
) -> bool:
    """Optional MLflow sink (transformers_test.py:38-40,259-261). Returns
    False (no-op) when mlflow is not installed — callers never fail on a
    missing tracking backend."""
    try:
        import mlflow  # noqa: PLC0415
    except ImportError:
        return False
    mlflow.set_experiment(experiment)
    with mlflow.start_run():
        for k, v in (params or {}).items():
            mlflow.log_param(k, v)
        for k, v in metrics.items():
            mlflow.log_metric(k, float(v))
    return True


def _load_pyplot():
    """Import-gated headless pyplot shared by every plot writer; None when
    matplotlib is absent (plot sinks become no-ops, never failures)."""
    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415
    except ImportError:
        return None
    return plt


def save_roc_plot(points: DataFrame, path: str) -> bool:
    """Optional matplotlib ROC curve from the AGGREGATED ``roc_points``
    output (~n_bins rows regardless of corpus size) — the distributed twin
    of the reference's sklearn.roc_curve-over-full-collect plot
    (sst2_test2.py:105-128). Returns False when matplotlib is absent."""
    plt = _load_pyplot()
    if plt is None:
        return False
    rows = points.orderBy(F.col("threshold").desc()).collect()  # ~n_bins
    total_pos = max((r.cum_pos for r in rows), default=0)
    total_neg = max((r.cum_neg for r in rows), default=0)
    if not total_pos or not total_neg:
        return False  # degenerate: single-class predictions, no curve
    fpr = [r.cum_neg / total_neg for r in rows]
    tpr = [r.cum_pos / total_pos for r in rows]
    fig, ax = plt.subplots()
    ax.plot([0.0, *fpr, 1.0], [0.0, *tpr, 1.0])
    ax.plot([0, 1], [0, 1], linestyle="--")
    ax.set_xlabel("false positive rate")
    ax.set_ylabel("true positive rate")
    ax.set_title("ROC")
    fig.savefig(path)
    plt.close(fig)
    return True


def save_confusion_plot(confusion: DataFrame, path: str) -> bool:
    """Optional matplotlib confusion-matrix heatmap from the AGGREGATED
    matrix (4 rows for binary), never raw predictions. Returns False when
    matplotlib is absent."""
    plt = _load_pyplot()
    if plt is None:
        return False
    rows = confusion.collect()  # aggregated: O(label_cardinality^2) rows
    labels = sorted({r[0] for r in rows} | {r[1] for r in rows})
    idx = {v: i for i, v in enumerate(labels)}
    grid = [[0] * len(labels) for _ in labels]
    for r in rows:
        grid[idx[r[0]]][idx[r[1]]] = r[2]
    fig, ax = plt.subplots()
    ax.imshow(grid)
    ax.set_xlabel("prediction")
    ax.set_ylabel("label")
    for i, row in enumerate(grid):
        for j, v in enumerate(row):
            ax.text(j, i, str(v), ha="center", va="center")
    fig.savefig(path)
    plt.close(fig)
    return True


def write_comparison_report(
    results: dict[str, dict[str, Any]],
    dir_path: str,
    plot: bool = True,
    to_mlflow: bool = False,
) -> "list[dict[str, Any]]":
    """Multi-task performance comparison (transformers_test.py:306-340
    ``generate_report``): one record per task -> records-orient JSON at
    ``dir_path/report.json``, an optional grouped bar chart of the shared
    numeric metrics at ``dir_path/task_comparison.png`` (import-gated like
    the other plot writers), and an optional MLflow artifact log.

    ``results`` maps task name -> metrics dict (e.g. the dicts
    ``evaluate.binary_metrics`` produces); every metric stays a number in
    the JSON (the reference string-formats them, which breaks downstream
    consumers — inverted here).  Driver-side by design: the inputs are
    per-task AGGREGATES (a handful of floats each), never row data."""
    os.makedirs(dir_path, exist_ok=True)
    records = [{"task": t, **m} for t, m in results.items()]
    with open(os.path.join(dir_path, "report.json"), "w") as f:
        json.dump(records, f, indent=2)

    if plot and records:
        plt = _load_pyplot()
        if plt is not None:
            metrics = [
                k
                for k in records[0]
                if k != "task"
                and all(
                    isinstance(r.get(k), (int, float)) for r in records
                )
            ]
            if metrics:
                fig, axes = plt.subplots(
                    1, len(metrics), figsize=(6 * len(metrics), 5)
                )
                axes = [axes] if len(metrics) == 1 else list(axes)
                tasks = [r["task"] for r in records]
                for ax, metric in zip(axes, metrics):
                    ax.bar(tasks, [r[metric] for r in records])
                    ax.set_title(metric)
                fig.tight_layout()
                fig.savefig(os.path.join(dir_path, "task_comparison.png"))
                plt.close(fig)

    if to_mlflow:
        try:
            import mlflow  # noqa: PLC0415
        except ImportError:
            pass
        else:
            mlflow.log_artifact(dir_path)
    return records
