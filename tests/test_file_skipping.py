"""Manifest-stats file skipping: pruned scans touch fewer files and
return exactly the filtered result."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.tables.laketable import LakeTable


def _mk_range_table(spark, scratch, name):
    """8 files, id ranges disjoint per file (repartitionByRange)."""
    t = LakeTable(spark, os.path.join(scratch, name))
    df = spark.range(0, 8000).withColumn("v", F.col("id") % 7)
    t.create(df.repartitionByRange(8, "id"))
    return t


def test_stats_recorded_per_file(spark, scratch):
    t = _mk_range_table(spark, scratch, "fs1")
    man = t.manifest()
    assert len(man.files) == 8
    assert set(man.file_stats) == set(man.files)
    for stats in man.file_stats.values():
        assert "id" in stats and stats["id"][0] <= stats["id"][1]


def test_pruned_scan_skips_files_and_stays_correct(spark, scratch):
    t = _mk_range_table(spark, scratch, "fs2")
    prune = [("id", ">=", 7000)]
    assert t.files_scanned(prune) <= 2  # range-partitioned → 1-2 tail files
    got = t.read(prune=prune).filter(F.col("id") >= 7000)
    assert got.count() == 1000
    assert got.agg(F.min("id")).collect()[0][0] == 7000


def test_equality_prune(spark, scratch):
    t = _mk_range_table(spark, scratch, "fs3")
    prune = [("id", "=", 4242)]
    assert t.files_scanned(prune) == 1
    assert t.read(prune=prune).filter(F.col("id") == 4242).count() == 1


def test_prune_survives_append_and_compact(spark, scratch):
    t = _mk_range_table(spark, scratch, "fs4")
    t.append(
        spark.range(8000, 9000)
        .withColumn("v", F.col("id") % 7)
        .repartitionByRange(2, "id")
    )
    man = t.manifest()
    assert set(man.file_stats) == set(man.files)  # stats carried + extended
    assert t.files_scanned([("id", ">=", 8500)]) <= 2
    t.compact(target_file_size_bytes=1 << 30)
    man2 = t.manifest()
    assert set(man2.file_stats) == set(man2.files)
    assert t.read(prune=[("id", "<", 100)]).filter(F.col("id") < 100).count() == 100


def test_conservative_without_stats_on_strings(spark, scratch):
    t = LakeTable(spark, os.path.join(scratch, "fs5"))
    df = spark.range(100).withColumn(
        "name", F.concat(F.lit("user_"), F.lpad(F.col("id").cast("string"), 3, "0"))
    )
    t.create(df.repartitionByRange(4, "id"))
    n = t.files_scanned([("name", ">=", "user_090")])
    assert 1 <= n <= 4
    assert (
        t.read(prune=[("name", ">=", "user_090")])
        .filter(F.col("name") >= "user_090")
        .count()
        == 10
    )


def test_zorder_prunes_on_both_columns(spark, scratch):
    """rewrite_zorder tiles the (x, y) plane: single-column predicates
    prune on EITHER column and a corner predicate touches ~1 tile —
    where a 1-D sort only serves its leading column. Content preserved
    exactly."""
    t = LakeTable(spark, os.path.join(scratch, "fz1"))
    df = spark.range(0, 20000).select(
        (F.col("id") % 100).alias("x"),
        (F.col("id") / 100).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    t.create(df.repartition(8))  # scattered: every file spans both ranges
    pa, pb = [("x", "<=", 5)], [("y", "<=", 5)]
    assert t.files_scanned(pa) == 8 and t.files_scanned(pb) == 8
    total = sum(
        os.path.getsize(os.path.join(t.root, f)) for f in t.manifest().files
    )
    t.rewrite_zorder(["x", "y"], target_file_size_bytes=max(1, total // 16))
    n_files = len(t.manifest().files)
    assert n_files >= 8
    # each single-column predicate prunes (a 1-D x-sort would leave the
    # y predicate scanning everything), the corner predicate hits ~1 tile
    assert t.files_scanned(pa) <= n_files // 2
    assert t.files_scanned(pb) <= n_files // 2
    assert t.files_scanned(pa + pb) <= max(1, n_files // 4)
    got = t.read(prune=pa + pb).filter((F.col("x") <= 5) & (F.col("y") <= 5))
    assert got.count() == 6 * 6  # id = y*100 + x: one row per (x, y) cell
    assert t.read().count() == 20000
