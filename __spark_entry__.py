"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fraud-enrichment pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus EXT operators) with DuckDB oracle twins.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_iceberg_sandbox_spark.operators import fraud  # noqa: E402
from data_iceberg_sandbox_spark.operators.spec import (  # noqa: E402
    QuerySpec,
    _memoized,
    as_query_dicts,
)


def _all_specs():
    from data_iceberg_sandbox_spark.operators import relational, tpch

    specs = list(relational.SPECS) + list(tpch.SPECS)
    for mod_name in (
        "lifecycle",
        "advanced",
        "tpch2",
        "pipeline",
        "dedup",
        "similarity",
        "textstats",
        "multimodal",
        "retrieval",
        "timeseries",
        "stats_tests",
        "insights",
    ):
        # fail LOUD (r13 review): all twelve modules are mandatory, and
        # the old `except ImportError: pass` silently removed a
        # module's entire spec family from queries()/oracle_sql()/bench
        # on any transitive import typo — the driver then reported
        # green on a shrunken surface with no error anywhere
        mod = __import__(
            f"data_iceberg_sandbox_spark.operators.{mod_name}",
            fromlist=["SPECS"],
        )
        specs += list(mod.SPECS)
    from data_iceberg_sandbox_spark.streaming import specs as streaming_specs

    specs += list(streaming_specs.SPECS)
    return specs


def _driver_history() -> tuple[dict[str, int], set[str]]:
    """(name -> round of most recent green row, any-row names).

    The driver checks a bounded number of queries per round; enumerating
    never-checked queries first, then checked-but-not-green, then green
    ordered stalest-first makes the full surface re-prove itself every
    few rounds instead of re-checking the same recent greens forever
    (the testdata regenerates between rounds, so old greens go stale).
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_green: dict[str, int] = {}
    seen: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            # r14 sweep: a CORRECTNESS file holding a JSON list/scalar
            # (e.g. a truncated or error-payload round) raised
            # AttributeError out of queries()/oracle_sql() — the driver
            # then lost the ENTIRE surface to one malformed history file
            continue
        for name, row in rows.items():
            seen.add(name)
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, seen


# Queries whose implementation was rewritten in an optimization round
# (r14/r15) and that the driver's capped 50-row oracle sample has not
# re-proven SINCE the rewrite (VERDICT r14 #7: the r14 cohort was
# pytest-oracled only). They rank just after the never-green tiers until
# a CORRECTNESS round >= _PRIORITY_SINCE greens them, then fall back to
# the normal stalest-first rotation.
_PRIORITY_RECHECK = {
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_volume_share",
    "tpch_q8_market_share",
    "tpch_q17_small_quantity",
    "multi_distinct_agg",
    "percentile_prices",
    "weighted_median_price",
    "embedding_quantize_int8",
    "text_repetition_score",
    "cube_counts",
    "orders_cohort_ltv",
    "tpch_q22_sales_opportunity",
    "tpch_q3_shipping_priority",
    "dedup_incremental_lsh",
    "dedup_minhash_lsh",
    "json_extract_props",
}
_PRIORITY_SINCE = 15


def _unchecked_first(d: dict) -> dict:
    last_green, seen = _driver_history()
    order = list(d)

    def rank(name: str) -> tuple:
        if name in last_green:
            if (
                name in _PRIORITY_RECHECK
                and last_green[name] < _PRIORITY_SINCE
            ):
                # rewritten since its last driver green — re-prove now
                return (2, last_green[name], order.index(name))
            # Green queries re-prove stalest-first: a capped driver
            # cycles the whole surface every ceil(total/cap) rounds.
            return (3, last_green[name], order.index(name))
        if name in seen:
            return (1, 0, order.index(name))  # had a row but never green
        return (0, 0, order.index(name))  # never checked at all
        # tier 0/1 names come first so regressions and new queries
        # always get a driver row the round they appear.

    return dict(sorted(d.items(), key=lambda kv: rank(kv[0])))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return fraud.fraud_alerts_enriched(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = as_query_dicts(_all_specs())
    # Memoized like every other pure read-only spec: the flagship was the
    # one unmemoized entry, so each bench run re-ran the plan build
    # including _inline_nations' collect — one extra job + the py4j
    # plan-construction round trips per timed run (r10 flagship regression).
    q["flagship_fraud_enriched"] = _memoized(
        QuerySpec(
            name="flagship_fraud_enriched",
            fn=fraud.fraud_alerts_enriched,
            oracle=fraud.fraud_enriched_oracle_sql(),
        )
    )
    return _unchecked_first(q)


def oracle_sql() -> dict[str, str]:
    _, o = as_query_dicts(_all_specs())
    o["flagship_fraud_enriched"] = fraud.fraud_enriched_oracle_sql()
    return _unchecked_first(o)
