"""Lakehouse layer round-out: metadata tables, rollback, write-audit-
publish, type widening."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.tables.laketable import CommitConflict, LakeTable


@pytest.fixture
def t(spark, scratch, request):
    table = LakeTable(spark, os.path.join(scratch, f"adv_{request.node.name}"))
    table.create(spark.range(10).withColumn("v", F.col("id") * 2))
    return table


def test_snapshots_df_and_files_df(spark, t):
    t.append(spark.range(10, 20).withColumn("v", F.col("id")))
    snaps = t.snapshots_df()
    assert [r["operation"] for r in snaps.orderBy("version").collect()] == [
        "create",
        "append",
    ]
    files = t.files_df()
    assert files.count() > 0
    assert files.filter(F.col("size_bytes") <= 0).count() == 0


def test_rollback_restores_and_keeps_history(spark, t):
    t.append(spark.range(10, 20).withColumn("v", F.col("id")))
    assert t.read().count() == 20
    t.rollback(1)
    assert t.read().count() == 10
    ops = [m.operation for m in t.snapshots()]
    assert ops[-1] == "rollback_to_v1"
    # the rolled-past snapshot is still time-travelable
    assert t.read(version=2).count() == 20


def test_write_audit_publish(spark, t):
    bad_batch = spark.range(100, 110).withColumn("v", F.lit(-1).cast("long"))
    token = t.stage_append(bad_batch)
    # readers see nothing until publish
    assert t.read().count() == 10
    # audit the staged snapshot
    audit = t.read_staged(token)
    assert audit.count() == 20
    n_bad = audit.filter(F.col("v") < 0).count()
    assert n_bad == 10  # audit catches them; choose to publish anyway
    t.publish(token)
    assert t.read().count() == 20
    assert [m.operation for m in t.snapshots()][-1] == "publish_staged_append"


def test_publish_conflicts_against_moved_pointer(spark, t):
    token = t.stage_append(
        spark.range(100, 105).withColumn("v", F.lit(0).cast("long"))
    )
    t.append(spark.range(200, 205).withColumn("v", F.lit(1).cast("long")))
    with pytest.raises(CommitConflict):
        t.publish(token)


def test_alter_column_type_widens(spark, scratch):
    table = LakeTable(spark, os.path.join(scratch, "widen"))
    table.create(
        spark.range(5).select(
            F.col("id").cast("int").alias("id"), F.lit(1.5).cast("float").alias("x")
        )
    )
    table.alter_column_type("id", "long").alter_column_type("x", "double")
    schema = dict((f.name, f.dataType.typeName()) for f in table.read().schema.fields)
    assert schema == {"id": "long", "x": "double"}
    assert table.read().agg(F.sum("id")).collect()[0][0] == 10
    with pytest.raises(ValueError, match="cannot narrow"):
        table.alter_column_type("id", "int")


def test_rewrite_sorted_improves_file_skipping(spark, scratch):
    t = LakeTable(spark, os.path.join(scratch, "sorted_rw"))
    scrambled = (
        spark.range(10_000)
        .withColumn("k", F.abs(F.xxhash64("id")) % 10_000)
        .repartition(8)
    )
    t.create(scrambled)
    pred = [("k", "<", 100)]
    before = t.files_scanned(pred)
    t.rewrite_sorted(["k"], target_file_size_bytes=20_000)
    after = t.files_scanned(pred)
    # every pre-rewrite file spans ~the full k range; post-rewrite the
    # range-partitioned sort makes file [min,max] disjoint
    assert before >= 4, before
    assert after <= 2, after
    assert t.read().count() == 10_000
    assert t.manifest().properties["sort.order"] == "k"
    assert [m.operation for m in t.snapshots()][-1] == "rewrite-sorted"


def test_tags_pin_snapshots_through_expiry(spark, scratch):
    from data_iceberg_sandbox_spark.tables.laketable import NoSuchTable

    t = LakeTable(spark, os.path.join(scratch, "tags"))
    t.create(spark.range(5).withColumn("v", F.col("id")))
    t.overwrite(spark.range(5).withColumn("v", F.col("id") + 1))
    t.overwrite(spark.range(5).withColumn("v", F.col("id") + 2))
    t.tag("baseline", 1)
    removed = t.expire_snapshots(retain_last=1)
    assert 1 not in removed and 2 in removed  # tagged v1 kept, v2 expired
    assert {r["v"] for r in t.read_tag("baseline").collect()} == {0, 1, 2, 3, 4}
    t.drop_tag("baseline")
    with pytest.raises(NoSuchTable):
        t.read_tag("baseline")


def test_tag_lock_serializes_writers(spark, scratch, monkeypatch):
    """Two concurrent tag writers must both land (no lost update), and a
    held lock must surface as CommitConflict, not a silent overwrite."""
    import threading

    from data_iceberg_sandbox_spark.tables import laketable as lt_mod

    t = LakeTable(spark, os.path.join(scratch, "tag_lock"))
    t.create(spark.range(3).withColumn("v", F.col("id")))
    t.overwrite(spark.range(3).withColumn("v", F.col("id") + 1))

    threads = [
        threading.Thread(target=t.tag, args=(f"tag{i}", 1)) for i in range(8)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert {f"tag{i}" for i in range(8)} <= set(t.tags())

    # a held lock times out as CommitConflict (shrunk deadline)
    monkeypatch.setattr(lt_mod, "TAGS_LOCK_TIMEOUT_SEC", 0.1)
    lock = t._tags_path + ".lock"
    fd = os.open(lock, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    try:
        with pytest.raises(CommitConflict):
            t.tag("blocked", 1)
    finally:
        os.close(fd)
        os.remove(lock)
    t.tag("after", 1)  # lock released -> works again
    assert t.tags()["after"] == 1
