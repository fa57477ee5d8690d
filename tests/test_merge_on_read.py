"""Merge-on-read equality deletes (Iceberg v2 analog): sidecar commits,
sequence-number scoping, time travel, rollback, GC, and the
appends-only incremental-read guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.tables.laketable import (
    IncrementalReadError,
    LakeTable,
)


def _mk(spark, scratch, name, n=100):
    t = LakeTable(spark, os.path.join(scratch, name))
    t.create(spark.range(0, n).withColumn("v", F.col("id") % 10))
    return t


def _keys(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id: long")


def test_mor_delete_is_metadata_only_and_filters_reads(spark, scratch):
    t = _mk(spark, scratch, "mor1")
    files = set(t.manifest().files)
    t.delete_keys_mor(_keys(spark, [3, 5, 7]))
    assert set(t.manifest().files) == files  # no data file rewritten
    assert len(t.manifest().delete_files) == 1
    got = {r["id"] for r in t.read().collect()}
    assert got == set(range(100)) - {3, 5, 7}


def test_mor_sequence_scoping_append_reinserts(spark, scratch):
    t = _mk(spark, scratch, "mor2")
    t.delete_keys_mor(_keys(spark, [1]))
    t.append(spark.range(1, 2).withColumn("v", F.lit(99)))
    rows = {(r["id"], r["v"]) for r in t.read().collect() if r["id"] == 1}
    assert rows == {(1, 99)}  # the re-inserted row survives
    # a LATER delete of the same key removes the re-inserted row too
    t.delete_keys_mor(_keys(spark, [1]))
    assert t.read().filter(F.col("id") == 1).count() == 0


def test_mor_time_travel_and_rollback(spark, scratch):
    t = _mk(spark, scratch, "mor3")
    v1 = t.current_version()
    t.delete_keys_mor(_keys(spark, [0, 2, 4]))
    v2 = t.current_version()
    assert t.read(version=v1).count() == 100  # pre-delete snapshot intact
    assert t.read(version=v2).count() == 97
    t.append(spark.range(100, 110).withColumn("v", F.lit(0)))
    t.rollback(v2)
    assert t.read().count() == 97  # rollback restores MoR state verbatim


def test_mor_compact_materializes_and_multi_column_keys(spark, scratch):
    t = _mk(spark, scratch, "mor4")
    t.delete_keys_mor(
        spark.createDataFrame([(6, 6), (7, 7)], "id: long, v: long")
    )
    # (6,6) matches row id=6 (v=6%10=6); (7,7) matches id=7 (v=7)
    assert t.read().count() == 98
    t.compact()
    assert not t.manifest().delete_files
    assert t.read().count() == 98


def test_mor_expire_gc_keeps_live_sidecars(spark, scratch):
    t = _mk(spark, scratch, "mor5")
    t.delete_keys_mor(_keys(spark, [1]))
    sidecar = next(iter(t.manifest().delete_files))
    for i in range(6):
        t.append(spark.range(200 + i, 201 + i).withColumn("v", F.lit(0)))
    t.expire_snapshots(retain_last=2)
    # the sidecar is still referenced by the retained manifests
    assert os.path.isdir(os.path.join(t.root, sidecar))
    assert t.read().filter(F.col("id") == 1).count() == 0
    # materialize, then expire everything that references the sidecar
    t.compact()
    for i in range(6):
        t.append(spark.range(300 + i, 301 + i).withColumn("v", F.lit(0)))
    t.expire_snapshots(retain_last=2)
    assert not os.path.isdir(os.path.join(t.root, sidecar))


def test_mor_incremental_read_rejects_delete_commits(spark, scratch):
    t = _mk(spark, scratch, "mor6")
    v1 = t.current_version()
    t.delete_keys_mor(_keys(spark, [1]))
    with pytest.raises(IncrementalReadError):
        t.read_incremental(v1)


def test_mor_rejects_unknown_key_columns_and_guards_drops(spark, scratch):
    t = _mk(spark, scratch, "mor7")
    with pytest.raises(ValueError):
        t.delete_keys_mor(
            spark.createDataFrame([(1,)], "nope: long")
        )


def test_mor_upsert_one_commit_updates_and_inserts(spark, scratch):
    t = _mk(spark, scratch, "mor8")
    v0 = t.current_version()
    files = set(t.manifest().files)
    src = spark.createDataFrame(
        [(5, 555), (150, 150)], "id: long, v: long"
    )  # id=5 exists (update), id=150 is new (insert)
    t.upsert_keys_mor(src, ["id"])
    assert t.current_version() == v0 + 1  # ONE commit
    assert files <= set(t.manifest().files)  # no existing file rewritten
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[5] == 555 and got[150] == 150 and len(got) == 101
    # cardinality contract: duplicate source keys refuse loudly
    from data_iceberg_sandbox_spark.tables.laketable import (
        MergeCardinalityError,
    )

    with pytest.raises(MergeCardinalityError):
        t.upsert_keys_mor(
            spark.createDataFrame([(1, 1), (1, 2)], "id: long, v: long"),
            ["id"],
        )
    # a later MoR delete removes the upserted version too
    t.delete_keys_mor(_keys(spark, [5]))
    assert t.read().filter(F.col("id") == 5).count() == 0
