"""Physical-plan inspection helpers.

The scale contract (SURVEY §4 and the north star) is enforced as tests:
filters and projections must reach the parquet scan, small dims must
broadcast, top-k must compile to TakeOrderedAndProject, and hot paths
must stay inside whole-stage codegen. These helpers expose the plan text
so tests (and bench analysis) can assert those properties instead of
hoping for them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    text = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — column-pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges planned (before AQE reuse)."""
    return len(re.findall(r"\bExchange hashpartitioning", physical_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees ('codegen' explain mode works
    pre-execution, unlike the *(n) markers AQE withholds until final)."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen", text)
    return int(m.group(1)) if m else 0


def partition_filters(df: DataFrame) -> list[str]:
    text = formatted_plan(df)
    return [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[(.*?)\]", text)
        if m.group(1).strip()
    ]
