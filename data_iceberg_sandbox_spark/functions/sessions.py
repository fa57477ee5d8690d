"""Shared sessionization core (ONE implementation — r12 review:
advanced.sessionize_events and timeseries.session_length_quantiles
carried line-for-line copies of the lag → gap-flag → running-sum
islands construction that had to stay in lockstep by hand)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def with_session_ids(ev: DataFrame, gap_minutes: int = 60) -> DataFrame:
    """Gap-based sessionization: a gap STRICTLY GREATER than
    ``gap_minutes`` starts a new session (merge-on-equal semantics —
    the exact-micros `> gap` comparison the oracles replay). Adds ``is_new`` and a per-user
    ``session_id`` (1-based) via the classic lag → flag → running-sum
    islands construction: ONE user_id shuffle, both window passes
    reuse the same partitioning."""
    w_user = W.partitionBy("user_id").orderBy("ts", "event_id")
    # EXACT integer microseconds (r12 review): the old whole-second
    # truncation (ts.cast long) disagreed with the oracle's fractional
    # epoch() for gaps inside (3600, 3601)s — parity on µs-grain data
    # held only by luck. Both engines now compare epoch micros.
    gap_us = F.unix_micros(F.col("ts")) - F.lag(
        F.unix_micros(F.col("ts"))
    ).over(w_user)
    return ev.withColumn(
        "is_new",
        F.when(
            gap_us.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w_user.rowsBetween(W.unboundedPreceding, 0)),
    )
