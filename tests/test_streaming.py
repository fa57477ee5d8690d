"""Streaming pipeline behaviors: genuine multi-micro-batch incremental
processing, emit-on-update convergence, backfill repair."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.sources.registry import load_table
from data_iceberg_sandbox_spark.streaming.fraud_stream import (
    SCRATCH,
    repair_null_enrichment,
    run_fraud_alerts_stream,
)
from tests.conftest import SF_SMOKE


def test_append_stream_epoch_retry_is_idempotent(spark, scratch):
    """A micro-batch retried after a successful table commit (failure
    between commit and checkpoint write) must be skipped: the epoch
    marker commits atomically with the data."""
    from data_iceberg_sandbox_spark.tables.laketable import LakeTable

    root = os.path.join(scratch, "append_epoch")
    t = LakeTable(spark, root)
    batch = spark.range(5).withColumn("v", F.col("id") * 2)

    def append_batch(batch_df, epoch):  # mirrors run_append_stream's sink
        marker = {"streaming.last_epoch": str(epoch)}
        if not t.exists():
            t.create(batch_df, properties=marker)
        else:
            last = t.manifest().properties.get("streaming.last_epoch")
            if last is not None and epoch <= int(last):
                return
            t.append(batch_df, extra_properties=marker)

    append_batch(batch, 0)
    append_batch(batch, 1)
    append_batch(batch, 1)  # retry of an already-committed epoch
    assert t.read().count() == 10  # not 15
    append_batch(batch, 2)
    assert t.read().count() == 15


def test_multi_batch_incremental_merge(spark):
    root = os.path.join(SCRATCH, "test_incremental")
    t = run_fraud_alerts_stream(
        spark, SF_SMOKE, root, threshold=100.0, n_files=8, files_per_trigger=2
    )
    # >1 snapshot == the MV was maintained incrementally, not one-shot
    assert len(t.snapshots()) > 1
    ops = {m.operation for m in t.snapshots()}
    assert "merge" in ops or "create" in ops


def test_emit_on_update_convergence(spark):
    """Same pipeline, different micro-batch slicing → identical MV."""
    a = run_fraud_alerts_stream(
        spark, SF_SMOKE, os.path.join(SCRATCH, "conv_a"), 100.0, 8, 2
    ).read()
    b = run_fraud_alerts_stream(
        spark, SF_SMOKE, os.path.join(SCRATCH, "conv_b"), 100.0, 4, 4
    ).read()
    assert a.count() == b.count()
    assert a.subtract(b).count() == 0 and b.subtract(a).count() == 0


def test_backfill_repairs_only_orphans(spark):
    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    t = run_fraud_alerts_stream(
        spark,
        SF_SMOKE,
        os.path.join(SCRATCH, "test_backfill"),
        100.0,
        enrich=True,
        customer_df=customer.filter(F.col("c_custkey") % 2 == 0),
        nation_df=nation,
    )
    before = t.read()
    n_orphans = before.filter(F.col("client_id").isNull()).count()
    assert n_orphans > 0  # the scenario is non-trivial at sf0.001
    repair_null_enrichment(t, customer, nation)
    after = t.read()
    assert after.filter(F.col("client_id").isNull()).count() == 0
    assert after.count() == before.count()


def test_streaming_ingest_into_branch_then_fast_forward(spark, scratch):
    """Streaming WAP composition: micro-batches land on a BRANCH
    (invisible to main readers while the stream runs), the branch is
    audited as a whole, then fast-forwarded — the Iceberg
    `spark.wap.branch` streaming-ingest pattern. Multi-batch is real
    (maxFilesPerTrigger=2 over an 8-file backlog); main must still be
    at the fork while every batch accumulates on the branch."""
    from data_iceberg_sandbox_spark.streaming.fraud_stream import (
        events_stream,
        stage_event_files,
    )
    from data_iceberg_sandbox_spark.tables.laketable import LakeTable

    staged = stage_event_files(spark, SF_SMOKE, "branch_ingest")
    batch_events = spark.read.parquet(staged)
    seed = batch_events.limit(0)

    t = LakeTable(spark, os.path.join(scratch, "stream_branch"))
    t.create(seed)
    t.create_branch("stream")

    n_batches = [0]

    def to_branch(batch_df, epoch):
        t.branch_append("stream", batch_df)
        n_batches[0] += 1
        assert t.read().count() == 0  # main never sees in-flight batches

    q = (
        events_stream(spark, staged, files_per_trigger=2)
        .writeStream.foreachBatch(to_branch)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(scratch, "stream_branch_ckpt")
        )
        .start()
    )
    q.awaitTermination(120)
    assert n_batches[0] > 1, "backlog must replay as multiple micro-batches"

    total = batch_events.count()
    assert t.read_branch("stream").count() == total  # audit: no loss, no dup
    t.fast_forward("stream")
    assert t.read().count() == total
    # exactly-once content, not just counts: branch landing == batch read
    assert t.read().exceptAll(batch_events).count() == 0
    assert batch_events.exceptAll(t.read()).count() == 0


def test_stream_stream_join_bucket_boundaries(spark, scratch):
    """r13 bucketed state keys: pairs landing exactly ON the 5-minute
    range edge, straddling a bucket boundary, or sharing a second-
    truncated timestamp must all match the batch range self-join —
    the adversarial cases for the floor(ts/300) key + previous-bucket
    replication."""
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    from data_iceberg_sandbox_spark.sources.registry import pin_table
    from data_iceberg_sandbox_spark.streaming.fraud_stream import (
        run_stream_stream_join,
    )

    base = datetime(2026, 1, 1, 0, 0, 0)

    def ev(eid, uid, sec, micro=0):
        return Row(
            event_id=eid,
            ts=base + timedelta(seconds=sec, microseconds=micro),
            user_id=uid,
            event_type="click",
            value=1.0,
            props="{}",
        )

    rows = [
        # exactly +300.000000s: included (<=); same bucket edge
        ev(1, 1, 0), ev(2, 1, 300),
        # +300s from a microsecond offset: 0.5 -> 300.5 (included),
        # buckets 0 -> 1 (previous-bucket replica must catch it)
        ev(3, 2, 0, 500000), ev(4, 2, 300, 500000),
        # one microsecond past the range: excluded
        ev(5, 3, 0), ev(6, 3, 300, 1),
        # equal timestamps: ts_b > ts_a strict, no pair either way
        ev(7, 4, 100), ev(8, 4, 100),
        # bucket straddle: 299s -> 301s (buckets 0 -> 1, gap 2s)
        ev(9, 5, 299), ev(10, 5, 301),
        # chain within one user across three buckets
        ev(11, 6, 250), ev(12, 6, 550), ev(13, 6, 850),
    ]
    sf_fake = os.path.join(scratch, "ssj_edges")
    os.makedirs(sf_fake, exist_ok=True)
    df = spark.createDataFrame(rows)
    pin_table(spark, sf_fake, "events", df)

    t = run_stream_stream_join(
        spark, sf_fake, os.path.join(scratch, "ssj_edges_tbl")
    )
    got = {(r["event_a"], r["event_b"]) for r in t.read().collect()}

    a = df.select(
        F.col("event_id").alias("ea"), "user_id", F.col("ts").alias("ta")
    )
    b = df.select(
        F.col("event_id").alias("eb"),
        F.col("user_id").alias("ub"),
        F.col("ts").alias("tb"),
    )
    want = {
        (r["ea"], r["eb"])
        for r in a.join(
            b,
            (F.col("user_id") == F.col("ub"))
            & (F.col("tb") > F.col("ta"))
            & (F.col("tb") <= F.col("ta") + F.expr("INTERVAL 5 MINUTES")),
        ).collect()
    }
    assert got == want
    assert (1, 2) in got and (3, 4) in got and (9, 10) in got
    assert (11, 12) in got and (12, 13) in got and (11, 13) not in got
    assert (5, 6) not in got and (7, 8) not in got
