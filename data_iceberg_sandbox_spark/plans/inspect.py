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


def _bracket_list(text: str, label: str) -> list[str]:
    r"""Parse `label: [ ... ]` entries with BRACKET-AWARE scanning and
    top-level comma splits (r13 review: the old non-greedy `\[(.*?)\]`
    truncated at the first ']' INSIDE a filter — an
    `In(col, [a,b])` entry was cut mid-list and every filter after it
    silently vanished, so pushdown assertions passed/failed on
    garbage fragments)."""
    out: list[str] = []
    needle = label + ": ["
    i = 0
    while True:
        j = text.find(needle, i)
        if j < 0:
            return out
        depth, pdepth, k = 1, 0, j + len(needle)
        start = k
        parts: list[str] = []
        while k < len(text) and depth:
            ch = text[k]
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif ch == "(":
                pdepth += 1
            elif ch == ")":
                pdepth -= 1
            elif ch == "," and depth == 1 and pdepth == 0:
                parts.append(text[start:k])
                start = k + 1
            k += 1
        parts.append(text[start : k - 1])
        out.extend(x.strip() for x in parts if x.strip())
        i = k


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all scans in the plan."""
    return _bracket_list(formatted_plan(df), "PushedFilters")


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each scan — column-pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def has_broadcast_join(df: DataFrame) -> bool:
    p = physical_plan(df)  # render once, not twice (r13 review)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def exchange_count(df: DataFrame) -> int:
    """Number of SHUFFLE exchanges planned (before AQE reuse) — hash,
    range, and single-partition alike (r13 review: counting only
    hashpartitioning let a 'must not shuffle' assertion pass on a plan
    that range-partitions for a global sort). BroadcastExchange is a
    broadcast build, not a shuffle, and is excluded."""
    return len(
        re.findall(
            r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition)",
            physical_plan(df),
        )
    )


def hash_exchange_count(df: DataFrame) -> int:
    """Hash-partitioned shuffle exchanges only — the data-scaled kind
    the 'ONE fact exchange' plan contracts count (a scalar aggregate's
    SinglePartition exchange carries per-partition partials, not the
    fact)."""
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
    return _bracket_list(formatted_plan(df), "PartitionFilters")
