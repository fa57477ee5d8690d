"""Parquet-native bloom filters via the `bloom.columns` table property:
bloom bytes actually written, bad columns fail loud, property carried
through rewrites."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.tables.laketable import LakeTable


def _data(spark, n=50_000):
    # scattered high-cardinality key: min/max stats are useless for a
    # point lookup on it — exactly the bloom case
    return spark.range(0, n).withColumn(
        "k", (F.col("id") * 2654435761) % 1000003
    )


def _data_bytes(t: LakeTable) -> int:
    man = t.manifest()
    return sum(
        os.path.getsize(os.path.join(t.root, f)) for f in man.files
    )


def test_bloom_bytes_written_and_content_identical(spark, scratch):
    df = _data(spark).coalesce(1)
    plain = LakeTable(spark, os.path.join(scratch, "bloom_off"))
    plain.create(df)
    bloomed = LakeTable(spark, os.path.join(scratch, "bloom_on"))
    bloomed.create(
        df,
        properties={"bloom.columns": "k", "bloom.ndv.k": "50000"},
    )
    extra = _data_bytes(bloomed) - _data_bytes(plain)
    # a 50k-NDV ~1%-FPR split-block bloom is ~64 KiB; anything clearly
    # positive proves the option reached the parquet writer
    assert extra > 16_384, f"bloom bytes missing (delta={extra})"
    assert (
        bloomed.read().exceptAll(plain.read()).count() == 0
        and plain.read().exceptAll(bloomed.read()).count() == 0
    )
    # the pushed point-lookup still returns the right row
    probe = bloomed.read().filter(F.col("k") == 2654435761 * 7 % 1000003)
    assert [r["id"] for r in probe.collect()] == [7]


def test_bloom_bad_column_fails_loud(spark, scratch):
    t = LakeTable(spark, os.path.join(scratch, "bloom_bad"))
    with pytest.raises(ValueError, match="bloom.columns"):
        t.create(_data(spark), properties={"bloom.columns": "nope"})


def test_bloom_on_partition_column_fails_loud(spark, scratch):
    # partitionBy strips partition columns from the data files, so a
    # bloom on one would validate but silently write zero bloom bytes
    t = LakeTable(spark, os.path.join(scratch, "bloom_part"))
    df = _data(spark).withColumn("cat", F.col("id") % 4)
    with pytest.raises(ValueError, match="partition columns"):
        t.create(
            df,
            partition_by=["cat"],
            properties={"bloom.columns": "cat"},
        )


def test_bloom_property_survives_compact(spark, scratch):
    df = _data(spark).coalesce(1)
    t = LakeTable(spark, os.path.join(scratch, "bloom_compact"))
    t.create(df, properties={"bloom.columns": "k", "bloom.ndv.k": "50000"})
    before = _data_bytes(t)
    t.compact(target_file_size_bytes=max(1, before))
    # the rewrite reads cur.properties, so the compacted files carry
    # blooms too: size stays in the bloomed ballpark, content intact
    plain = LakeTable(spark, os.path.join(scratch, "bloom_compact_ref"))
    plain.create(df)
    assert _data_bytes(t) - _data_bytes(plain) > 16_384
    assert t.read().count() == 50_000
