"""Physical-plan introspection helpers — used by tests to assert that the
plans we ship are the plans we designed (SURVEY.md §4): filters pushed to
the parquet scan, scope joins broadcast, no accidental cartesian products,
whole-stage codegen over the relational core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filters(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Column names in the parquet ReadSchema (pruning check)."""
    plan = physical_plan(df)
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema:" in line:
            inner = line.split("struct<", 1)[-1].rsplit(">", 1)[0]
            cols += [c.split(":")[0].strip() for c in inner.split(",") if ":" in c]
    return cols


def _count_nodes(df: DataFrame, op: str) -> int:
    """Count physical operators by their detail-section header `(N) Op` —
    the formatted plan prints every node twice (tree + detail), so a raw
    substring count double-counts."""
    import re

    return len(re.findall(rf"^\(\d+\) {op}\b", physical_plan(df), re.MULTILINE))


def count_broadcast_joins(df: DataFrame) -> int:
    return _count_nodes(df, "BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    return _count_nodes(df, "Exchange")


def has_cartesian(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "CartesianProduct" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen regions. The formatted
    explain annotates member nodes with `[codegen id : N]` (the string
    'WholeStageCodegen' only appears in treeString mode)."""
    import re

    ids = set(re.findall(r"\[codegen id : (\d+)\]", physical_plan(df)))
    return len(ids)
