"""End-to-end GLUE runner tests: three tiny task-shaped TSV fixtures
through load -> fit -> eval -> sinks (SURVEY.md §5 fixture hazards:
quoted QQP fields, string QNLI labels, null rows)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark_text_classification_spark.runner import (
    load_glue_task,
    run_glue_task,
)

POS = "great wonderful film truly moving and excellent"
NEG = "dull terrible mess boring and awful throughout"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


@pytest.fixture()
def sst2_files(tmp_path):
    rows = [f"{POS} {i}\t1" for i in range(12)] + [
        f"{NEG} {i}\t0" for i in range(12)
    ]
    body = "sentence\tlabel\n" + "\n".join(rows) + "\n"
    return _write(tmp_path, "train.tsv", body), _write(
        tmp_path, "dev.tsv", body
    )


def test_load_sst2_drops_nulls(spark, tmp_path):
    p = _write(
        tmp_path, "s.tsv", "sentence\tlabel\ngood\t1\n\t0\nbad\t\n"
    )
    out = load_glue_task(spark, "sst2", p)
    assert out.columns == ["text", "label"]
    assert out.count() == 1  # null sentence and null label rows dropped


def test_load_qqp_quoted_and_sep(spark, tmp_path):
    p = _write(
        tmp_path,
        "q.tsv",
        "id\tqid1\tqid2\tquestion1\tquestion2\tis_duplicate\n"
        '1\t10\t11\t"what\tis it"\thow so\t1\n'
        "2\t12\t13\t\tmissing q1\t0\n",
    )
    out = load_glue_task(spark, "qqp", p).collect()
    assert len(out) == 1  # null question1 row dropped (subset na.drop)
    assert out[0].text == "what\tis it [SEP] how so"


def test_load_qnli_label_case_and_concat(spark, tmp_path):
    p = _write(
        tmp_path,
        "n.tsv",
        "index\tquestion\tsentence\tlabel\n"
        "0\t q? \t s. \tentailment\n"
        "1\tx\ty\tnot_entailment\n"
        "2\tu\tv\tbogus\n",
    )
    rows = {r.text: r.label for r in load_glue_task(spark, "qnli", p).collect()}
    assert rows == {"q? s.": 0.0, "x y": 1.0}  # trimmed concat; bogus dropped


def test_run_glue_task_end_to_end(spark, sst2_files, tmp_path):
    train, dev = sst2_files
    out_dir = str(tmp_path / "out")
    metrics = run_glue_task(spark, "sst2", train, dev, out_dir)
    # separable fixture: the TF-IDF+LR recipe must fit it near-perfectly
    assert metrics["accuracy"] >= 0.9
    assert metrics["auc"] >= 0.9
    report = json.load(open(os.path.join(out_dir, "metrics.json")))
    assert report["run"] == "sst2"
    back = spark.read.parquet(os.path.join(out_dir, "predictions.parquet"))
    assert {"text", "label", "prediction", "positive_prob"} <= set(back.columns)
    assert os.path.isdir(os.path.join(out_dir, "model"))
    conf = spark.read.parquet(os.path.join(out_dir, "confusion.parquet"))
    assert conf.count() <= 4


def test_run_glue_task_qnli_end_to_end(spark, tmp_path):
    """QNLI shape: string labels, pair concat, Word2Vec recipe (the
    heaviest reference pipeline) survives end to end on a tiny fixture."""
    qs = [("why is sky blue", "rayleigh scattering of light", "entailment"),
          ("why is sky blue", "bananas are yellow fruit", "not_entailment")]
    rows = []
    for i in range(10):
        for q, s, lab in qs:
            rows.append(f"{len(rows)}\t{q} {i}\t{s} {i}\t{lab}")
    body = "index\tquestion\tsentence\tlabel\n" + "\n".join(rows) + "\n"
    train = _write(tmp_path, "train.tsv", body)
    dev = _write(tmp_path, "dev.tsv", body)
    out_dir = str(tmp_path / "out_qnli")
    metrics = run_glue_task(
        spark, "qnli", train, dev, out_dir, write_csv_copy=False
    )
    # Word2Vec on a toy corpus won't separate well; the contract is the
    # pipeline RUNS and emits sane artifacts, not model quality
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert os.path.isdir(os.path.join(out_dir, "model"))


def test_coverage_priority_classes_and_stability():
    """Artifact-aware driver ordering: reds re-queue first, never-checked
    next (original order preserved), settled greens last; a later green
    settles an earlier red; rows-only 'no_oracle' rows with a row count
    count as green."""
    from pyspark_text_classification_spark.all_queries import (
        coverage_priority,
    )

    names = ["a", "b", "c", "d", "e"]
    r1 = {
        "a": {"err": "boom", "hash_match": None, "spark_rows": None},
        "b": {"err": None, "hash_match": True, "rows_match": True},
        "c": {"err": "no_oracle", "spark_rows": 7},
    }
    # d, e never checked; a red; b, c green
    assert coverage_priority(names, [r1]) == ["a", "d", "e", "b", "c"]
    # a later round greens 'a' -> it settles behind the never-checked,
    # and BEHIND b/c: greens re-drive stalest-evidence-first (a's row is
    # the most recent of the three)
    r2 = {"a": {"err": None, "hash_match": True, "rows_match": True}}
    assert coverage_priority(names, [r1, r2]) == ["d", "e", "b", "c", "a"]
    # LATEST round wins: a REGRESSION (green in r1, red later) re-queues
    # first instead of settling on the stale green
    r3 = {"b": {"err": "boom", "hash_match": None, "spark_rows": None}}
    assert coverage_priority(names, [r1, r2, r3]) == ["b", "d", "e", "c", "a"]
    # no artifacts -> order unchanged
    assert coverage_priority(names, []) == names
    # an oracle ADDED after a rows-only 'no_oracle' row re-queues the
    # query at the front: the stronger hash check is pending
    assert coverage_priority(names, [r1, r2], oracled={"c"}) == [
        "c", "d", "e", "b", "a",
    ]
    # ...but with no oracle registered the rows-only row stays its green
    assert coverage_priority(names, [r1, r2], oracled=set()) == [
        "d", "e", "b", "c", "a",
    ]
    # a recheck name (code changed this round) outranks never-checked and
    # greens — its recorded green is stale by construction — but not reds
    assert coverage_priority(names, [r1, r2], recheck=["b"]) == [
        "b", "d", "e", "c", "a",
    ]
    assert coverage_priority(names, [r1, r2, r3], recheck=["b"]) == [
        "b", "d", "e", "c", "a",
    ]


def test_driver_first50_carries_only_new_information():
    """The live registration order: as long as at least 50 queries lack a
    settled-green driver record, every one of the first 50 slots must be
    spent on a non-settled query (red re-queue or never-checked) — the
    invariant that makes each round's CORRECTNESS sweep maximally
    informative."""
    import glob
    import json
    import os

    from pyspark_text_classification_spark.all_queries import (
        ORACLES,
        QUERIES,
        ROUND_RECHECK,
        coverage_priority,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifacts = []
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        with open(p) as fh:
            artifacts.append(json.load(fh))
    if not artifacts:
        return  # fresh clone: static order stands, nothing to assert
    names = list(QUERIES)
    # a query is settled iff coverage_priority sorts it into the tail
    # class; recompute the classes exactly the way the registry does
    ordered = coverage_priority(
        names, artifacts, oracled=set(ORACLES), recheck=ROUND_RECHECK
    )
    assert names == ordered  # the applied order IS the priority order
    # every current-round recheck (changed output/schema) must land in
    # the first-50 sweep the driver actually records
    assert set(ROUND_RECHECK) <= set(ordered[:50]), ordered[:50]
    # count non-settled = queries that would sort before any settled green
    settled_suffix = 0
    for n in reversed(ordered):
        rec = None
        for data in artifacts:
            if n in data:
                rec = data[n]
        ok = rec is not None and (
            (rec.get("err") is None
             and bool(rec.get("hash_match", rec.get("rows_match"))))
            or (rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
                and n not in ORACLES)
        )
        if not ok:
            break
        settled_suffix += 1
    non_settled = len(ordered) - settled_suffix
    if non_settled >= 50:
        first50 = ordered[:50]
        greens = [n for n in first50 if n in ordered[len(ordered) - settled_suffix:]]
        assert not greens, f"settled greens wasting driver slots: {greens}"


import pytest as _pytest


@_pytest.mark.parametrize("module", ["__spark_entry__", "bench"])
def test_driver_contract_refuses_audit_pin(monkeypatch, module):
    """The batch-cap env pin is scale-audit-only (ADVICE r10): importing
    the driver contract OR the bench under it must fail fast, so pinned
    hashes/timings can never masquerade as recorded artifacts.  Both
    module-level fences are exercised (ADVICE r11: the bench copy used
    to be untested and could silently drift)."""
    import importlib
    import sys

    import pytest

    monkeypatch.setenv("SPARK_GRAFT_QUERY_BATCH_CAP", "63")
    saved = sys.modules.pop(module, None)
    try:
        with pytest.raises(RuntimeError, match="scale-audit|not comparable"):
            importlib.import_module(module)
    finally:
        sys.modules.pop(module, None)
        if saved is not None:
            sys.modules[module] = saved


def test_bench_summary_line_fits_driver_tail():
    """The grading driver stores a 2000-char stdout TAIL and parses the
    final JSON line out of it (BENCH_r02.json: a 6 KB line came back
    front-truncated and unparseable).  The r12 summary line adds the
    frozen CORE_50 per-query dict; this pins (a) that at pessimistic
    magnitudes (99.99 s for every core query, noisy-host totals) the
    compact line still fits the tail with the dict intact, and (b) that
    the summary_line guard drops the dict — never the totals — if the
    line would ever exceed the 1900-char budget."""
    import json

    import bench

    assert set(bench.CORE_50) <= set(bench.HEADLINE)

    def skeleton(core_val):
        summary = {
            "metric": "headline_queries_total",
            "value": 21199.8888,
            "unit": "sec",
            "n_queries": 212,
            "core50_total": 4999.5,
            "core50_queries": {n: core_val for n in bench.CORE_50},
        }
        for k in (
            "ann_macro_recall pq_macro_recall ivf_pq_macro_recall "
            "ivf_pq_auto_macro_recall ann_ivf_auto_macro_recall "
            "rerank_macro_recall auto_rerank_macro_recall "
            "ivf_append_macro_recall ivf_delete_macro_recall knn_accuracy "
            "knn_best_accuracy bloom_fpp_micro"
        ).split():
            summary[k] = 0.7264
        summary["loadavg1"] = 31.99
        summary["loadavg1_end"] = 31.99
        summary["sf"] = 0.1
        summary["knn_best_config"] = "weighted@99"
        return summary

    # (a) pessimistic-but-sane: every core query at 99.99s — dict kept
    line = bench.summary_line(skeleton(99.99))
    assert len(line) < 1900, len(line)
    assert "core50_queries" in json.loads(line)
    # (b) absurd magnitudes trip the guard: totals survive, dict dropped
    big = bench.summary_line(skeleton(999999999.99))
    parsed = json.loads(big)
    assert len(big) < 1900
    assert "core50_queries" not in parsed
    assert parsed["value"] == 21199.8888
