"""Jar-gated connector factories: absent jars must fail loudly with the
exact dependency, never half-work."""

from __future__ import annotations

import pytest

from data_iceberg_sandbox_spark.sources.kafka import (
    ConnectorUnavailable,
    avro_available,
    kafka_available,
    kafka_stream,
)


def test_kafka_gate_reports_missing_jar(spark):
    if kafka_available(spark):
        pytest.skip("kafka connector present in this image")
    with pytest.raises(ConnectorUnavailable, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "tx")


def test_avro_gate_detects(spark):
    # informational: either state is valid, the gate just must not lie
    assert avro_available(spark) in (True, False)
