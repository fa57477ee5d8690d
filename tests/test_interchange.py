"""Client-side interchange surface (SURVEY §2.1 S15, §2.2 P5): Arrow and
pandas export, current-timestamp columns (non-deterministic → behavioral
tests, no oracle)."""

from __future__ import annotations

import datetime

import pyarrow as pa
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_arrow_export(spark):
    """S15: scan → Arrow (the PyIceberg scan().to_arrow() analog)."""
    tbl = load_table(spark, SF_SMOKE, "nation").toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 25
    assert tbl.column_names == ["n_nationkey", "n_name", "n_regionkey"]


def test_pandas_export_arrow_enabled(spark):
    pdf = load_table(spark, SF_SMOKE, "region").toPandas()
    assert len(pdf) == 5
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"


def test_current_timestamp_columns(spark):
    """P5/P6 (create_table.py:57-59): created_at = current_timestamp(),
    updated_at copies it; both constant-folded per query."""
    df = (
        load_table(spark, SF_SMOKE, "region")
        .withColumn("created_at", F.current_timestamp())
        .withColumn("updated_at", F.col("created_at"))
    )
    rows = df.collect()
    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    for r in rows:
        assert r["created_at"] == r["updated_at"]
        assert abs((now - r["created_at"]).total_seconds()) < 600
    # one timestamp per query evaluation, not per row
    assert len({r["created_at"] for r in rows}) == 1
