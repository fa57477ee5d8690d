"""Testdata schema probe (VERDICT r4 item 7).

The driver regenerates /root/testdata between rounds and has already
changed the physical timestamp stamp once (INT64 TIMESTAMP(NANOS) →
Timestamp(isAdjustedToUTC=false, micros), which Spark 4 reads as
TIMESTAMP_NTZ). The engine's event-time contract is plain TIMESTAMP —
watermarks and epoch casts require it (reference maps event time to a
plain timestamp type too: transaction.avsc:19-25, SURVEY §1.2). This
probe asserts the scan layer delivers that contract for every declared
event-time column in every sf dir, so the next physical-stamp change
breaks HERE with a clear message instead of deep inside a watermark.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from data_iceberg_sandbox_spark.sources.registry import _TS_COLS, load_table

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table,cols", sorted(_TS_COLS.items()))
def test_event_time_columns_load_as_timestamp(spark, sf_dir, table, cols):
    df = load_table(spark, sf_dir, table)
    for c in cols:
        dt = df.schema[c].dataType
        assert isinstance(dt, T.TimestampType), (
            f"{sf_dir}/{table}.parquet column {c!r} loaded as {dt.simpleString()}, "
            "expected timestamp. The driver likely regenerated /root/testdata "
            "with a new physical timestamp stamp; teach "
            "sources/registry.py load_table() to normalize it."
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_event_time_instant_unchanged_by_normalization(spark, sf_dir):
    # The normalization must relabel, not shift: under the pinned UTC
    # session tz, min/max of events.ts must equal DuckDB's naive read of
    # the same file (the oracle side), second for second.
    duckdb = pytest.importorskip("duckdb")
    from pyspark.sql import functions as F

    # Compare epoch MICROS, not collected datetimes: toPandas/collect
    # render timestamps in the driver's OS-local timezone, so a Python-
    # datetime comparison only holds on a UTC box (ADVICE r5).
    df = load_table(spark, sf_dir, "events")
    lo, hi = df.agg(
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))
    ).first()
    dlo, dhi = duckdb.sql(
        f"SELECT epoch_us(min(ts)), epoch_us(max(ts))"
        f" FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert (lo, hi) == (dlo, dhi)
