"""Query registry plumbing.

Each implemented operator from SURVEY.md §2 registers a ``QuerySpec``:
a named (spark, sf_dir) → DataFrame callable plus (when SQL-expressible)
the equivalent ANSI-SQL oracle string for DuckDB. ``__spark_entry__``
assembles ``queries()`` / ``oracle_sql()`` from these.

Oracle-determinism conventions used across all specs:
- session timezone pinned UTC (session.py) so timestamps align;
- monetary/float aggregates computed over DECIMAL casts (exact, order-
  independent) and emitted as DOUBLE via one final cast — bit-identical
  across engines;
- averages emitted as ``CAST(exact_decimal_sum AS DOUBLE) / count`` (one
  IEEE division — deterministic), never the engine's float avg;
- LIMIT only behind a total ORDER BY with a unique tie-break key;
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check
    doc: str = ""


def as_query_dicts(
    specs: list[QuerySpec],
) -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    queries = {s.name: s.fn for s in specs}
    oracles = {s.name: s.oracle for s in specs if s.oracle is not None}
    return queries, oracles
