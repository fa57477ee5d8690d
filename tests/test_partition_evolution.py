"""Partition-spec evolution: metadata-only commits, mixed-layout reads,
interplay with MoR deletes, time travel, and compaction unification."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.tables.laketable import LakeTable


def _mk(spark, scratch, name, partition_by=None):
    t = LakeTable(spark, os.path.join(scratch, name))
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("bucket")
    )
    t.create(df, partition_by=partition_by)
    return t


def test_evolution_is_metadata_only_and_reads_merge(spark, scratch):
    t = _mk(spark, scratch, "pe1")
    files = set(t.manifest().files)
    t.evolve_partition_spec(["bucket"])
    assert set(t.manifest().files) == files
    t.append(
        spark.range(100, 140).select(
            F.col("id"), (F.col("id") % 4).cast("string").alias("bucket")
        )
    )
    got = {r["id"] for r in t.read().collect()}
    assert got == set(range(140))
    # partition values recovered from the hive dirs of the new layout
    assert t.read().filter(F.col("bucket") == "2").count() == 25 + 10


def test_evolution_rejects_unknown_columns(spark, scratch):
    t = _mk(spark, scratch, "pe2")
    with pytest.raises(ValueError):
        t.evolve_partition_spec(["nope"])


def test_evolution_with_mor_delete_across_layouts(spark, scratch):
    t = _mk(spark, scratch, "pe3", partition_by=["bucket"])
    t.evolve_partition_spec([])
    t.append(
        spark.range(100, 120).select(
            F.col("id"), (F.col("id") % 4).cast("string").alias("bucket")
        )
    )
    # the delete must suppress matching rows in BOTH layouts
    t.delete_keys_mor(
        spark.createDataFrame([(5,), (105,)], "id: long")
    )
    got = {r["id"] for r in t.read().collect()}
    assert got == set(range(120)) - {5, 105}


def test_evolution_time_travel_and_compact_unify(spark, scratch):
    t = _mk(spark, scratch, "pe4")
    v_flat = t.current_version()
    t.evolve_partition_spec(["bucket"])
    t.append(
        spark.range(100, 110).select(
            F.col("id"), (F.col("id") % 4).cast("string").alias("bucket")
        )
    )
    assert t.read(version=v_flat).count() == 100  # pre-evolution snapshot
    t.compact()
    layouts = {
        tuple(s.split("=", 1)[0] for s in f.split("/") if "=" in s)
        for f in t.manifest().files
    }
    assert layouts == {("bucket",)}
    assert t.read().count() == 110
