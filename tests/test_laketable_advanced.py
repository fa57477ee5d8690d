"""Lakehouse layer round-out: metadata tables, rollback, write-audit-
publish, type widening."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.tables.laketable import (
    CommitConflict,
    LakeTable,
    NoSuchTable,
)


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


def test_incremental_read_appends_only(spark, scratch):
    from data_iceberg_sandbox_spark.tables.laketable import (
        IncrementalReadError,
    )

    t = LakeTable(spark, os.path.join(scratch, "incr"))
    base = spark.range(0, 100).withColumnRenamed("id", "k")
    t.create(base)
    t.append(spark.range(100, 150).withColumnRenamed("id", "k"))
    t.append(spark.range(150, 180).withColumnRenamed("id", "k"))
    # catch-up from v1: exactly the two appends, never the base
    got = sorted(r["k"] for r in t.read_incremental(1).collect())
    assert got == list(range(100, 180))
    # sub-range (v2 -> v3]: just the second append
    got = sorted(r["k"] for r in t.read_incremental(2, 3).collect())
    assert got == list(range(150, 180))
    # empty range
    assert t.read_incremental(3).count() == 0
    # a rewrite commit inside the range fails loud
    t.delete_where(F.col("k") < 10)
    with pytest.raises(IncrementalReadError):
        t.read_incremental(1)
    # ... but a range ending before the rewrite still works
    assert t.read_incremental(1, 3).count() == 80
    # metadata-only commits pass through (no file delta)
    t2 = LakeTable(spark, os.path.join(scratch, "incr_meta"))
    t2.create(base)
    t2.add_column("extra", "double")
    t2.append(
        spark.range(200, 210)
        .withColumnRenamed("id", "k")
        .withColumn("extra", F.lit(1.5))
    )
    got = sorted(r["k"] for r in t2.read_incremental(1).collect())
    assert got == list(range(200, 210))


def test_remove_orphan_files(spark, scratch):
    import time as _time

    t = LakeTable(spark, os.path.join(scratch, "orphans"))
    t.create(spark.range(0, 50).withColumnRenamed("id", "k"))
    t.append(spark.range(50, 80).withColumnRenamed("id", "k"))
    # simulate a crashed write: data files on disk, no manifest commit
    orphan_dir = os.path.join(t.root, "data", "deadbeefcafe")
    os.makedirs(orphan_dir)
    spark.range(0, 5).write.mode("overwrite").parquet(
        os.path.join(orphan_dir, "tmp")
    )
    before = t.read().count()
    # cutoff in the future → everything unreferenced is old enough
    removed = t.remove_orphan_files(
        older_than_ms=int(_time.time() * 1000) + 60_000
    )
    assert removed and all("deadbeefcafe" in f for f in removed)
    assert not os.path.isdir(orphan_dir)
    assert t.read().count() == before  # live data untouched
    # young unreferenced files survive (in-flight commit protection)
    young = os.path.join(t.root, "data", "inflight0000")
    os.makedirs(young)
    spark.range(0, 3).write.mode("overwrite").parquet(
        os.path.join(young, "tmp")
    )
    assert t.remove_orphan_files() == []  # default cutoff: newest snapshot
    assert os.path.isdir(young)


def test_merge_conditional_clauses(spark, scratch):
    t = LakeTable(spark, os.path.join(scratch, "merge_cond"))
    t.create(
        spark.createDataFrame(
            [(1, "keep", 10.0), (2, "del", 20.0), (3, "upd", 30.0),
             (4, "nullcond", 40.0)],
            "k INT, tag STRING, v DOUBLE",
        )
    )
    src = spark.createDataFrame(
        [(2, "del", 99.0), (3, "upd", 99.0), (4, None, 99.0),
         (5, "new-hi", 200.0), (6, "new-lo", 1.0)],
        "k INT, tag STRING, v DOUBLE",
    )
    t.merge_conditional(
        src,
        on=["k"],
        delete_when=F.col("s.tag") == "del",     # k=2 deleted; k=4 NULL cond -> kept
        update_when=F.col("t.v") < 35.0,          # k=3 updated; k=4 not (40 >= 35)
        insert_when=F.col("v") > 100.0,           # k=5 inserted; k=6 not
    )
    rows = {r.k: (r.tag, r.v) for r in t.read().collect()}
    assert set(rows) == {1, 3, 4, 5}
    assert rows[1] == ("keep", 10.0)      # untouched
    assert rows[3] == ("upd", 99.0)       # updated
    assert rows[4] == ("nullcond", 40.0)  # NULL delete-cond + failed update-cond -> target kept
    assert rows[5] == ("new-hi", 200.0)   # conditional insert


def test_merge_conditional_duplicate_source_fails(spark, scratch):
    from data_iceberg_sandbox_spark.tables.laketable import MergeCardinalityError

    t = LakeTable(spark, os.path.join(scratch, "merge_cond_dup"))
    t.create(spark.createDataFrame([(1, 1.0)], "k INT, v DOUBLE"))
    src = spark.createDataFrame([(1, 2.0), (1, 3.0)], "k INT, v DOUBLE")
    with pytest.raises(MergeCardinalityError):
        t.merge_conditional(src, on=["k"])


def test_merge_conditional_update_exclude(spark, scratch):
    t = LakeTable(spark, os.path.join(scratch, "merge_cond_excl"))
    t.create(
        spark.createDataFrame(
            [(1, "orig", 10.0)], "k INT, created_by STRING, v DOUBLE"
        )
    )
    src = spark.createDataFrame(
        [(1, "writer2", 99.0)], "k INT, created_by STRING, v DOUBLE"
    )
    t.merge_conditional(src, on=["k"], update_exclude=("created_by",))
    row = t.read().collect()[0]
    assert row.v == 99.0           # updated
    assert row.created_by == "orig"  # excluded column keeps target value


def test_read_staged_applies_mor_deletes(spark, t):
    """A WAP audit on a table with merge-on-read deletes must see the
    parent's delete sidecars applied (Iceberg wap.branch semantics):
    old-file rows stay suppressed, while the staged batch — including a
    re-insert of a deleted key — is visible (its sequence postdates the
    sidecar)."""
    t.delete_keys_mor(spark.createDataFrame([(3,), (7,)], "id long"))
    assert t.read().count() == 8
    token = t.stage_append(
        spark.createDataFrame([(7, -7), (100, 200)], "id long, v long")
    )
    audit = t.read_staged(token)
    ids = sorted(r["id"] for r in audit.collect())
    # 10 originals − {3,7} deleted + staged {7, 100}
    assert ids == [0, 1, 2, 4, 5, 6, 7, 8, 9, 100]
    assert audit.filter(F.col("id") == 7).collect()[0]["v"] == -7
    t.publish(token)
    assert sorted(r["id"] for r in t.read().collect()) == ids


def test_branch_write_read_fast_forward(spark, t):
    """Branch lifecycle: appends on a branch are invisible to main,
    read_branch sees fork content + branch batches, fast_forward lands
    them as one main snapshot and deletes the ref."""
    t.create_branch("ingest")
    t.branch_append(
        "ingest", spark.createDataFrame([(100, 1), (101, 2)], "id long, v long")
    )
    t.branch_append("ingest", spark.createDataFrame([(102, 3)], "id long, v long"))
    assert t.read().count() == 10  # main unchanged
    assert t.read_branch("ingest").count() == 13
    t.fast_forward("ingest")
    assert t.read().count() == 13
    assert [m.operation for m in t.snapshots()][-1] == "fast_forward_branch:ingest"
    with pytest.raises(NoSuchTable):
        t.read_branch("ingest")  # ref deleted on land


def test_branch_fast_forward_conflicts_when_main_moves(spark, t):
    t.create_branch("b")
    t.branch_append("b", spark.createDataFrame([(200, 0)], "id long, v long"))
    t.append(spark.createDataFrame([(300, 0)], "id long, v long"))  # main moves
    with pytest.raises(CommitConflict):
        t.fast_forward("b")
    t.drop_branch("b")


def test_branch_sees_fork_mor_deletes(spark, t):
    """A branch forked after MoR deletes must read with the fork's
    sidecars applied; a branch re-insert of a deleted key is visible
    (its sequence postdates the sidecar) — read_staged semantics."""
    t.delete_keys_mor(spark.createDataFrame([(4,)], "id long"))
    t.create_branch("fix")
    t.branch_append("fix", spark.createDataFrame([(4, -4)], "id long, v long"))
    ids = sorted(r["id"] for r in t.read_branch("fix").collect())
    assert ids == [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
    assert t.read_branch("fix").filter(F.col("id") == 4).collect()[0]["v"] == -4
    t.fast_forward("fix")
    assert t.read().filter(F.col("id") == 4).collect()[0]["v"] == -4


def test_branch_duplicate_create_conflicts(spark, t):
    t.create_branch("dup")
    with pytest.raises(CommitConflict):
        t.create_branch("dup")


def test_two_branches_first_ff_wins(spark, t):
    """Two branches forked from the same snapshot: the first
    fast-forward lands; the second now targets a moved main and must
    conflict (its work is preserved on the branch for a manual rebase
    or drop) — the multi-writer contract at branch granularity."""
    t.create_branch("a")
    t.create_branch("b")
    t.branch_append("a", spark.createDataFrame([(400, 0)], "id long, v long"))
    t.branch_append("b", spark.createDataFrame([(500, 0)], "id long, v long"))
    t.fast_forward("a")
    assert t.read().count() == 11
    with pytest.raises(CommitConflict):
        t.fast_forward("b")
    assert t.read_branch("b").filter(F.col("id") == 500).count() == 1  # preserved
    t.drop_branch("b")


def test_orphan_gc_protects_staged_and_branch_refs(spark, scratch):
    """ADVICE r11: staged WAP manifests and branch refs are referenced
    metadata — their data files must survive GC at any cutoff; only an
    explicitly expired stage becomes collectable; publish-after-GC of a
    live stage reads back intact."""
    import time as _time

    far = int(_time.time() * 1000) + 3_600_000
    t = LakeTable(spark, os.path.join(scratch, "orph_wap"))
    t.create(spark.range(0, 40).withColumnRenamed("id", "k"))
    token = t.stage_append(spark.range(40, 60).withColumnRenamed("id", "k"))
    t.create_branch("wip")
    t.branch_append("wip", spark.range(60, 70).withColumnRenamed("id", "k"))
    # live stage + live branch: nothing collectable even far-future
    assert t.remove_orphan_files(older_than_ms=far) == []
    # the staged snapshot still publishes cleanly after the GC pass
    t.publish(token)
    assert t.read().count() == 60
    assert t.read_branch("wip").count() == 50
    # an abandoned stage becomes collectable only after expire_staged
    tok2 = t.stage_append(spark.range(70, 90).withColumnRenamed("id", "k"))
    assert t.remove_orphan_files(older_than_ms=far) == []
    t.expire_staged(tok2)
    removed = t.remove_orphan_files(older_than_ms=far)
    assert removed, "expired stage's files were not collected"
    assert t.read().count() == 60  # committed data untouched
    from data_iceberg_sandbox_spark.tables.laketable import NoSuchTable

    try:
        t.expire_staged("nosuchtoken")
        raise AssertionError("expire_staged of unknown token must raise")
    except NoSuchTable:
        pass


def test_orphan_gc_protects_mor_delete_sidecars(spark, scratch):
    """r12 review: GC's live set must include merge-on-read delete
    sidecars — deleting one would crash every later read (or resurrect
    the deleted rows)."""
    import time as _time

    far = int(_time.time() * 1000) + 3_600_000
    t = LakeTable(spark, os.path.join(scratch, "orph_mor"))
    t.create(spark.range(0, 100).withColumnRenamed("id", "k"))
    t.delete_keys_mor(
        spark.createDataFrame([(5,), (6,), (7,)], "k: long")
    )
    before = t.read().count()
    assert before == 97
    assert t.remove_orphan_files(older_than_ms=far) == []
    assert t.read().count() == 97  # sidecar intact, rows stay deleted


def test_commit_reclaims_dead_writer_manifest_slot(spark, scratch):
    """r12 review: a v(N+1).json left by a writer that died between the
    manifest write and the pointer swing must not wedge the table —
    after the staleness grace it is reclaimed; meanwhile snapshots()
    never lists the uncommitted debris."""
    import data_iceberg_sandbox_spark.tables.laketable as lt

    t = LakeTable(spark, os.path.join(scratch, "wedge"))
    t.create(spark.range(0, 10).withColumnRenamed("id", "k"))
    # simulate the dead writer: manifest slot v2 taken, pointer still v1
    debris = t._manifest_path(2)
    with open(t._manifest_path(1), encoding="utf-8") as f:
        body = f.read()
    with open(debris, "w", encoding="utf-8") as f:
        f.write(body.replace('"version": 1', '"version": 2'))
    assert [m.version for m in t.snapshots()] == [1]  # debris invisible
    # young debris = possibly a live racer -> still conflicts
    try:
        t.append(spark.range(10, 20).withColumnRenamed("id", "k"))
        raise AssertionError("young debris slot must conflict")
    except CommitConflict:
        pass
    # age it past the grace window -> next commit reclaims the slot
    old = __import__("time").time() - lt.STALE_MANIFEST_GRACE_SEC - 5
    os.utime(debris, (old, old))
    t.append(spark.range(10, 20).withColumnRenamed("id", "k"))
    assert t.current_version() == 2
    assert t.read().count() == 20


def test_drop_table_refuses_namespace(spark, scratch):
    from data_iceberg_sandbox_spark.tables.laketable import LakeCatalog

    cat = LakeCatalog(spark, os.path.join(scratch, "wh"))
    cat.create_namespace("fin")
    cat.table("fin.tx").create(spark.range(0, 5).withColumnRenamed("id", "k"))
    try:
        cat.drop_table("fin")
        raise AssertionError("dropping a namespace must raise")
    except ValueError:
        pass
    assert cat.table_exists("fin.tx")
    cat.drop_table("fin.tx")
    assert not cat.table_exists("fin.tx")


def test_read_incremental_accepts_wap_publish(spark, scratch):
    """r12 review: publish_staged_append is appends-only by
    construction and must flow through the incremental changelog."""
    t = LakeTable(spark, os.path.join(scratch, "inc_wap"))
    t.create(spark.range(0, 10).withColumnRenamed("id", "k"))
    tok = t.stage_append(spark.range(10, 25).withColumnRenamed("id", "k"))
    t.publish(tok)
    inc = t.read_incremental(1)
    assert inc.count() == 15
    assert {r["k"] for r in inc.collect()} == set(range(10, 25))


def test_reclaimed_slot_fence_competitor_swung(spark, scratch):
    """r13 ADVICE (high): a slow writer whose v(N+1) slot was reclaimed
    by a competitor must NOT delete the competitor's committed manifest
    on CAS failure — the old unfenced cleanup corrupted the table."""
    import json as _json

    from data_iceberg_sandbox_spark.tables.laketable import Manifest

    t = LakeTable(spark, os.path.join(scratch, "fence_a"))
    t.create(spark.range(0, 5).withColumnRenamed("id", "k"))
    cur = t.manifest()
    mpath = t._manifest_path(2)
    competitor = Manifest(
        version=2,
        parent=1,
        operation="append",
        timestamp_ms=cur.timestamp_ms + 1,
        schema_json=cur.schema_json,
        partition_by=cur.partition_by,
        files=cur.files,
        properties=cur.properties,
        file_stats=cur.file_stats,
        delete_files={},
        file_seq={f: 1 for f in cur.files},
        writer="competitor",
    ).to_json()

    real_cv = LakeTable.current_version

    def hijack(self):
        # simulate the competitor reclaiming our slot and swinging
        # the pointer, exactly between our manifest write and CAS
        if os.path.exists(mpath):
            with open(mpath, "w", encoding="utf-8") as f:
                f.write(competitor)
            with open(self._current_path, "w", encoding="utf-8") as f:
                f.write("2")
            t.current_version = real_cv.__get__(t)
        return real_cv(self)

    t.current_version = hijack.__get__(t)
    with pytest.raises(CommitConflict):
        t.append(spark.range(5, 9).withColumnRenamed("id", "k"))
    # competitor's committed manifest survives; table reads fine
    assert os.path.exists(mpath)
    with open(mpath, encoding="utf-8") as f:
        assert _json.loads(f.read())["writer"] == "competitor"
    assert t.current_version() == 2
    assert t.read().count() == 5


def test_reclaimed_slot_fence_competitor_not_swung(spark, scratch):
    """r13 ADVICE (high), lost-commit half: if the competitor reclaimed
    the slot but has not swung yet, the slow writer must raise instead
    of acknowledging a commit whose files the slot does not reference."""
    from data_iceberg_sandbox_spark.tables.laketable import Manifest

    t = LakeTable(spark, os.path.join(scratch, "fence_b"))
    t.create(spark.range(0, 5).withColumnRenamed("id", "k"))
    cur = t.manifest()
    mpath = t._manifest_path(2)
    competitor = Manifest(
        version=2,
        parent=1,
        operation="append",
        timestamp_ms=cur.timestamp_ms + 1,
        schema_json=cur.schema_json,
        partition_by=cur.partition_by,
        files=cur.files,
        properties=cur.properties,
        file_stats=cur.file_stats,
        delete_files={},
        file_seq={f: 1 for f in cur.files},
        writer="competitor",
    ).to_json()

    real_cv = LakeTable.current_version

    def hijack(self):
        if os.path.exists(mpath):
            with open(mpath, "w", encoding="utf-8") as f:
                f.write(competitor)  # slot reclaimed, pointer NOT swung
            t.current_version = real_cv.__get__(t)
        return real_cv(self)

    t.current_version = hijack.__get__(t)
    with pytest.raises(CommitConflict):
        t.append(spark.range(5, 9).withColumnRenamed("id", "k"))
    # pointer untouched — the slow writer did not swing onto the
    # competitor's manifest
    assert t.current_version() == 1
    assert t.read().count() == 5


def test_tags_lock_fenced_release(spark, scratch):
    """r13: a lock taken over mid-hold must not be removed by the
    original (stalled) holder's release."""
    t = LakeTable(spark, os.path.join(scratch, "fence_lock"))
    t.create(spark.range(0, 3).withColumnRenamed("id", "k"))
    lock = t._tags_path + ".lock"
    with t._tags_lock():
        with open(lock, "w", encoding="utf-8") as f:
            f.write("foreign-holder")  # competitor took the lock over
    assert os.path.exists(lock)  # fenced release left it alone
    os.remove(lock)
    with t._tags_lock():  # lock still usable afterwards
        pass
    assert not os.path.exists(lock)


def test_concurrent_appends_lose_nothing(spark, scratch):
    """r13 fence work, end-to-end: N threads race appends with retry on
    CommitConflict; every acknowledged commit's rows must be readable
    (no lost commits), the manifest chain must be a single line from
    v1 to the final version, and no acknowledged version may be
    orphaned (the corruption modes the writer fence closes)."""
    import threading

    from data_iceberg_sandbox_spark.tables.laketable import CommitConflict

    t = LakeTable(spark, os.path.join(scratch, "race_appends"))
    t.create(spark.range(0, 10).withColumnRenamed("id", "k"))
    N_THREADS, N_APPENDS = 4, 3
    acked: list[int] = []
    errors: list[str] = []
    lock = threading.Lock()

    def writer(tid: int) -> None:
        for j in range(N_APPENDS):
            lo = 1000 * (tid * N_APPENDS + j + 1)
            df = spark.range(lo, lo + 10).withColumnRenamed("id", "k")
            for _attempt in range(60):
                try:
                    t.append(df)
                    with lock:
                        acked.append(lo)
                    break
                except CommitConflict:
                    continue
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}")
                    return
            else:
                with lock:
                    errors.append(f"thread {tid} exhausted retries")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(N_THREADS)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(acked) == N_THREADS * N_APPENDS
    # every acknowledged batch is present exactly once
    ks = [r["k"] for r in t.read().collect()]
    assert len(ks) == len(set(ks)) == 10 + 10 * len(acked)
    for lo in acked:
        assert lo in set(ks)
    # manifest chain is a single unbroken line
    mans = t.snapshots()
    versions = sorted(m.version for m in mans)
    assert versions == list(range(1, len(acked) + 2))
    by_v = {m.version: m for m in mans}
    for v in versions[1:]:
        assert by_v[v].parent == v - 1
