"""Physical-plan inspection helpers (SURVEY.md §4; the 100 TB checklist).

The engine's performance contract is expressed as assertions over the
formatted physical plan: filters reach the parquet scan (PushedFilters),
projections prune the read schema (ReadSchema), small dims broadcast
(BroadcastHashJoin), and the relational core never drops into a Python
worker (no BatchEvalPython/ArrowEvalPython outside declared pandas-UDF
operators). tests/test_plans.py runs these against the declared queries so
a regression that silently de-optimizes a plan fails CI, not the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"  # noqa: SLF001
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan carries `fragment` inside PushedFilters."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually decoded by the (first) parquet scan."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            struct = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            return [c.split(":")[0] for c in struct.split(",") if ":" in c]
    return []


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or (
        "BroadcastNestedLoopJoin" in formatted_plan(df)
    )


def count_physical_nodes(plan: str, name: str) -> int:
    """Count distinct physical operators named `name` in a formatted plan.

    The formatted explain output mentions every node twice — once in the
    plan tree (``+- SortMergeJoin Inner (64)``) and once as a detail
    header (``(64) SortMergeJoin``) — so a raw substring count
    double-counts.  Counting unique node ids from detail headers gives
    the true operator count.
    """
    import re

    return len(set(re.findall(rf"^\((\d+)\) {name}\b", plan, re.MULTILINE)))


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-worker exec nodes in the plan (should be empty for the
    relational core; exactly the declared pandas stages elsewhere)."""
    plan = formatted_plan(df)
    return [
        name
        for name in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas")
        if name in plan
    ]


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen stages in the plan.

    The formatted plan marks fused operators with ``[codegen id : N]``
    (the legacy ``WholeStageCodegen`` node name only appears in the
    simple-mode string); counting distinct ids counts fused spans."""
    import re

    plan = formatted_plan(df)
    return len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
