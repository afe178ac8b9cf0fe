"""ML layer tests: pipeline recipes (metric tolerance — SURVEY.md §5),
custom Transformer semantics + persistence, distributed evaluation,
batched inference."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pyspark_text_classification_spark.ml.evaluate import (
    binary_metrics,
    confusion_matrix_df,
    top_k_coefficients,
)
from pyspark_text_classification_spark.ml.featurize import EmptyTokenGuard
from pyspark_text_classification_spark.ml.inference import (
    DeterministicStubModel,
    batch_infer,
)
from pyspark_text_classification_spark.ml.pipelines import fit_text_classifier
from pyspark_text_classification_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def labeled_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "text", (F.col("lang") == "en").cast("double").alias("label")
    ).cache()


def test_empty_token_guard_semantics(spark):
    df = spark.createDataFrame(
        [(["a", "b"],), ([],)], schema="toks array<string>"
    )
    out = EmptyTokenGuard(inputCol="toks", outputCol="fixed").transform(df)
    rows = {tuple(r.fixed) for r in out.collect()}
    assert rows == {("a", "b"), ("unknown",)}


def test_empty_token_guard_persistence_roundtrip(spark):
    g = EmptyTokenGuard(inputCol="toks", outputCol="fixed")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/guard"
        g.write().overwrite().save(path)
        loaded = EmptyTokenGuard.load(path)
    assert loaded.getInputCol() == "toks"
    assert loaded.getOutputCol() == "fixed"


def test_sst2_recipe_learns_signal(spark):
    """Metric-tolerance test (the oracle can't hash iterative LR): on a
    corpus with a real lexical signal the TF-IDF+LR recipe must score
    near-perfectly. (The sf documents' lang label is uncorrelated with
    their shared-vocabulary text, so signal comes from a built fixture.)"""
    pos_words = ["great", "excellent", "wonderful", "superb", "amazing"]
    neg_words = ["awful", "terrible", "horrible", "dreadful", "poor"]
    rows = []
    for i in range(120):
        w = pos_words if i % 2 == 0 else neg_words
        text = " ".join(w[(i + j) % 5] for j in range(8)) + f" filler{i % 7}"
        rows.append((text, float(i % 2 == 0)))
    df = spark.createDataFrame(rows, schema="text string, label double")
    model = fit_text_classifier(df, recipe="sst2")
    m = binary_metrics(model.transform(df))
    assert m["accuracy"] >= 0.95
    assert m["auc"] >= 0.95


def test_qqp_recipe_runs(spark, labeled_docs):
    model = fit_text_classifier(labeled_docs.limit(200), recipe="qqp")
    assert model.transform(labeled_docs.limit(50)).count() == 50


def test_qnli_recipe_survives_empty_tokens(spark):
    """The qnli recipe's guard must keep Word2Vec alive on degenerate text
    (empty, punctuation-only, all-stopwords — FIXTURES.md F1 edge rows)."""
    rows = [
        ("good solid table merge query", 1.0),
        ("...", 0.0),
        ("", 0.0),
        ("the of and a", 1.0),
        ("!!!", 1.0),
    ] * 10
    df = spark.createDataFrame(rows, schema="text string, label double")
    model = fit_text_classifier(df, recipe="qnli")
    assert model.transform(df).count() == 50


def test_confusion_matrix_counts(spark):
    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 0.0), (0.0, 0.0), (0.0, 0.0)],
        schema="label double, prediction double",
    )
    cm = {
        (r.label, r.prediction): r.cnt
        for r in confusion_matrix_df(df).collect()
    }
    assert cm == {(1.0, 1.0): 1, (1.0, 0.0): 1, (0.0, 0.0): 2}


def test_topk_coefficients_shape(spark, labeled_docs):
    model = fit_text_classifier(labeled_docs.limit(300), recipe="sst2")
    vocab = model.stages[2].vocabulary
    out = top_k_coefficients(spark, model.stages[-1], vocab, k=5).collect()
    assert len(out) == 10
    pos = [r.coefficient for r in out if r.direction == "positive"]
    neg = [r.coefficient for r in out if r.direction == "negative"]
    assert pos == sorted(pos, reverse=True)
    assert neg == sorted(neg)


def test_batch_infer_matches_stub_locally(spark):
    """mapInPandas output == driver-side stub model output (Arrow path
    preserves values), and confidence is present (reference defect #1)."""
    rows = [(i, f"text number {i}") for i in range(37)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {
        r.doc_id: (r.predicted_label, r.confidence)
        for r in batch_infer(df).collect()
    }
    stub = DeterministicStubModel()
    for i, text in rows:
        labels, confs = stub.predict([text])
        assert got[i] == (labels[0], confs[0])


def test_model_loads_once_per_worker_not_per_task(spark, tmp_path):
    """The scale claim batch_infer's docstring makes, proven: a 'heavy'
    factory injected through model_factory loads AT MOST once per Python
    worker process across many tasks — never once per task (the reference
    reloads per task, transformers_test.py:123-131). Each factory call
    appends a line to a pid-named marker file; worker reuse means a pid's
    file must hold exactly one line."""
    marker_dir = str(tmp_path / "loads")
    os.makedirs(marker_dir, exist_ok=True)

    def counting_factory():
        import os as _os

        with open(f"{marker_dir}/{_os.getpid()}", "a") as fh:
            fh.write("load\n")
        return DeterministicStubModel()

    # > local[32]'s worker count so loads-per-worker < tasks is provable
    # (and > defaultParallelism so batch_infer's fan_out keeps the count)
    n_tasks = 64
    rows = [(i, f"text number {i}") for i in range(480)]
    df = spark.createDataFrame(
        rows, schema="doc_id long, text string"
    ).repartition(n_tasks)
    out = batch_infer(df, model_factory=counting_factory)
    assert out.count() == 480

    marker_files = os.listdir(marker_dir)
    loads_per_worker = [
        len(open(f"{marker_dir}/{f}").readlines()) for f in marker_files
    ]
    n_loads = sum(loads_per_worker)
    assert 0 < n_loads < n_tasks, (
        f"{n_loads} loads for {n_tasks} tasks — looks per-task, not per-worker"
    )
    assert all(n == 1 for n in loads_per_worker), (
        f"a worker loaded the model more than once: {loads_per_worker}"
    )


def test_pipeline_model_save_load_roundtrip(spark, tmp_path):
    """S6: a fitted pipeline (incl. the custom EmptyTokenGuard stage)
    persists and reloads to identical predictions."""
    from pyspark_text_classification_spark.ml.pipelines import (
        fit_text_classifier,
        load_model,
        save_model,
    )

    train = spark.createDataFrame(
        [("good great fine", 1), ("bad awful poor", 0)] * 20,
        schema="text string, label int",
    )
    model = fit_text_classifier(train, recipe="sst2")
    path = str(tmp_path / "model")
    save_model(model, path)
    reloaded = load_model(path)
    test = spark.createDataFrame(
        [("great stuff",), ("awful stuff",)], schema="text string"
    )
    a = [r.prediction for r in model.transform(test).collect()]
    b = [r.prediction for r in reloaded.transform(test).collect()]
    assert a == b


def test_write_comparison_report(tmp_path):
    """The multi-task report writer (generate_report parity): records
    JSON with numeric metrics preserved, plot gated on matplotlib."""
    import json as _json

    from pyspark_text_classification_spark.ml.reporting import (
        write_comparison_report,
    )

    results = {
        "sst2": {"accuracy": 0.7752, "auc": 0.8528, "n": 872},
        "qqp": {"accuracy": 0.7057, "auc": 0.7252, "n": 39972},
    }
    records = write_comparison_report(results, str(tmp_path / "report"))
    assert [r["task"] for r in records] == ["sst2", "qqp"]
    on_disk = _json.load(open(tmp_path / "report" / "report.json"))
    assert on_disk == records
    assert isinstance(on_disk[0]["accuracy"], float)  # numbers, not strings


def test_exported_scorer_matches_mllib_transform(spark, sf_dir):
    """Train-export-serve parity: the exported-weights scorer served
    through batch_infer must reproduce the fitted PipelineModel's own
    transform() — labels exactly (away from the 0.5 boundary) and
    probabilities to float precision, because the export replays the
    identical tokenize/stopword/count/idf/dot math in the same
    accumulation order."""
    from pyspark.ml.functions import vector_to_array

    from pyspark_text_classification_spark.ml.inference import (
        ExportedScorerFactory,
        batch_infer,
        export_lr_scorer,
    )
    from pyspark_text_classification_spark.ml.pipelines import (
        fit_text_classifier,
    )
    from pyspark_text_classification_spark.ml.queries import (
        _labeled_documents,
    )
    from pyspark_text_classification_spark.sources.parquet import load_table

    labeled = _labeled_documents(spark, sf_dir)
    model = fit_text_classifier(labeled, recipe="sst2")
    want = {
        r.doc_id: (int(r.prediction), float(r.p1))
        for r in model.transform(labeled)
        .select(
            "doc_id",
            "prediction",
            vector_to_array("probability")[1].alias("p1"),
        )
        .collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    export = export_lr_scorer(model)
    got = {
        r.doc_id: (int(r.predicted_label), float(r.confidence))
        for r in batch_infer(
            docs, model_factory=ExportedScorerFactory(export)
        ).collect()
    }

    assert set(got) == set(want)
    for doc_id, (label, p1) in want.items():
        g_label, g_conf = got[doc_id]
        w_conf = p1 if label else 1.0 - p1
        assert abs(g_conf - w_conf) < 1e-9, (doc_id, g_conf, w_conf)
        if abs(p1 - 0.5) > 1e-9:
            assert g_label == label, (doc_id, p1)
