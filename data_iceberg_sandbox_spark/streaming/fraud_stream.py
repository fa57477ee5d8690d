"""Structured Streaming re-expression of the reference streaming pipeline
(SURVEY §2.1 S10-S14, §2.6 W1-W5).

Reference chain (/root/reference/): Kafka Avro source
(src_kafka_credit_card_transactions.sql:1-12, earliest offsets) →
RisingWave MV `mv_fraud_alerts` = 1-minute TUMBLE + SUM + HAVING
(mv_fraud_alerts.sql:3-17) → MV `mv_fraud_alerts_client` = two-hop
LEFT JOIN enrichment against seed + Iceberg side input
(mv_fraud_alerts_client.sql:11-17) → append-only Iceberg/Kafka sinks
(sink_iceberg_fraud_alerts_client.sql, sink_kafka...sql).

Spark-first mapping:
- source: file stream over a staged multi-file copy of `events`
  (`maxFilesPerTrigger` → genuine multi-micro-batch incremental
  processing; Kafka is a config swap, gated on the connector jar);
- MV maintenance (W2, emit-on-update): `outputMode("update")` windowed
  aggregation + ``foreachBatch`` MERGE into a LakeTable keyed
  (user_id, window_start) — each micro-batch upserts its updated
  cumulative sums, exactly RisingWave's emit-on-update observable
  behavior. The HAVING filter applies per emission; once a group
  crosses the threshold it appears and later updates revise it.
- enrichment (W5/S11): stream-static join — the static side is re-read
  per micro-batch, so dim changes apply to *future* batches;
- retroactive backfill (streaming-usecase.md:278-291, the card_999
  scenario): RisingWave revises *past* join results when dim rows
  arrive. Stream-static joins cannot; `repair_null_enrichment` runs the
  documented periodic repair MERGE re-joining rows whose enrichment is
  NULL (P8 predicate) — divergence documented in SURVEY §7.
- watermark: the reference keeps window state forever (no watermark);
  update-mode without watermark matches that. At 100 TB/unbounded
  streams, pass `watermark=` to bound state — a stated trade-off.

Scale notes: the windowed agg carries partial aggregation before the
(user_id, window) shuffle; state is per-group O(1); the MERGE per batch
shuffles only updated groups (micro-batch-sized, AQE broadcasts it
against the big target side of the COW join).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from ..tables.laketable import LakeTable
from ..operators.fraud import FRAUD_THRESHOLD

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SCRATCH = os.path.join(_REPO_ROOT, ".scratch", "streaming")


import functools
from contextlib import contextmanager


def with_bounded_shuffle(fn):
    """Decorator form of bounded_shuffle for the stream runners (all
    take `spark` first)."""

    @functools.wraps(fn)
    def wrapper(spark, *args, **kwargs):
        with bounded_shuffle(spark):
            return fn(spark, *args, **kwargs)

    return wrapper


@contextmanager
def bounded_shuffle(spark: SparkSession, n: int = 8):
    """Cap shuffle/state partitioning for a streaming run, then restore.

    A state-store stage materializes `shuffle.partitions` state files
    PER micro-batch; at test/driver scale a default-200 session turns a
    2 s pipeline into minutes of file churn. Production jobs set this
    per workload — these runners do the same, scoped, so they behave
    under any caller's session.

    `n` is a CAP, not a pin: a caller that explicitly sized the session
    smaller (bench runs 4 for a 17 MB workload) knows its box better
    than this default — honoring it is worth ~1.5× stream throughput
    (measured r3: 8 partitions 14.6k ev/s vs 4 partitions 22.2k on the
    bench stream; unconditionally pinning 8 caused the r2 regression
    15.8k → 11.8k flagged in VERDICT)."""
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key, None)  # None = never explicitly set
    eff = min(n, int(old)) if old is not None else n
    spark.conf.set(key, str(eff))
    try:
        yield
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            # restore "unset" — leaving 8 pinned would silently cap the
            # caller's batch parallelism for the session's lifetime
            spark.conf.unset(key)


def epoch_guarded_write(
    table: LakeTable, df: DataFrame, epoch: int, stats_off: bool = True
) -> None:
    """Exactly-once foreachBatch append: the epoch id commits atomically
    WITH the data (a table property on the same manifest), so a
    micro-batch retried after a successful commit — the failure window
    between table commit and checkpoint write — is detected
    (epoch <= last applied) and skipped instead of double-applied.
    ONE implementation for every streaming sink (r12 review: the guard
    was copy-pasted in three runners and had already drifted).

    ``stats_off`` keeps the ingest lane free of the per-commit stats
    re-scan (a continuously-appended sink rewrites files every batch;
    file skipping buys nothing until a terminal compaction)."""
    marker = {"streaming.last_epoch": str(epoch)}
    if not table.exists():
        props = {**marker, "stats.enabled": "false"} if stats_off else marker
        table.create(df, properties=props)
        return
    last = table.manifest().properties.get("streaming.last_epoch")
    if last is not None and epoch <= int(last):
        return  # already committed; this is a post-commit retry
    table.append(df, extra_properties=marker)


def staging_sig(
    spark: SparkSession, sf_dir: str, table: str, extra: str
) -> str | None:
    """Reuse signature for a staged copy of ``table``: the source
    parquet's (size, mtime_ns) plus caller params. None DISABLES the
    memo — when the source can't be statted, or when the registry
    entry is a pin_table overlay (r13 review: a pinned frame serves
    data the disk fingerprint does not describe, so a re-pin with an
    unchanged disk file would otherwise match a stale staging). The
    (size, mtime) term — not a row count — is what protects against
    driver testdata regeneration at the same SF (same count, different
    content)."""
    from ..sources.registry import is_pinned

    src = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if is_pinned(spark, sf_dir, table):
            return None
        st = os.stat(src)
    except OSError:
        return None
    return f"{extra}:{st.st_size}:{st.st_mtime_ns}"


def stage_event_files(
    spark: SparkSession, sf_dir: str, name: str, n_files: int = 8,
    time_ordered: bool = False,
) -> str:
    """Stage `events` as n parquet files so the file source yields real
    micro-batches (the self-contained analog of a Kafka topic's
    partitioned backlog, replayed from earliest — S10/W4).

    ``time_ordered=True`` stages contiguous event-time slices that the
    file source replays in slice order (files are committed one by one,
    strictly increasing mtime AND lexicographic path) — the
    near-ordered-arrival shape of a real log tail, which is what makes
    a BOUNDED watermark lossless for stateful consumers. The default
    (one shuffled write) replays in effectively random time order, the
    worst-case backlog."""
    out = os.path.join(
        SCRATCH, f"staged_{name}_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    events = load_table(spark, sf_dir, "events")
    # Staging memo (r13): the backlog is the analog of a Kafka topic
    # that already HOLDS its data — re-producing it on every run is
    # not part of the consumer's work (~15 s of a ~60 s sf10 drain).
    marker = out + ".staged"
    sig = staging_sig(
        spark, sf_dir, "events", f"{n_files}:{int(time_ordered)}"
    )
    if sig is not None:
        try:
            with open(marker, encoding="utf-8") as mf:
                if mf.read() == sig and os.path.isdir(out):
                    return out
        except OSError:
            pass
    if os.path.exists(marker):
        os.remove(marker)
    if os.path.isdir(out):
        shutil.rmtree(out)
    if not time_ordered:
        events.repartition(n_files).write.parquet(out)
        if sig is not None:
            with open(marker, "w", encoding="utf-8") as mf:
                mf.write(sig)
        return out
    os.makedirs(out, exist_ok=True)
    sliced = events.repartitionByRange(n_files, F.col("ts"))
    tmp = out + ".tmp"
    if os.path.isdir(tmp):  # debris of an interrupted prior staging run
        shutil.rmtree(tmp)
    sliced.write.parquet(tmp)
    # re-commit each range slice as one sequentially-named file so the
    # file source's (mtime, path) ordering equals event-time ordering
    parts = sorted(
        f for f in os.listdir(tmp) if f.endswith(".parquet")
    )
    now = time.time()
    for i, f in enumerate(parts):
        dst = os.path.join(out, f"{i:05d}.parquet")
        os.replace(os.path.join(tmp, f), dst)
        os.utime(dst, (now + i, now + i))  # strictly increasing mtime
    shutil.rmtree(tmp)
    if sig is not None:
        with open(marker, "w", encoding="utf-8") as mf:
            mf.write(sig)
    return out


def events_stream(spark: SparkSession, staged_dir: str, files_per_trigger: int = 2):
    schema = spark.read.parquet(staged_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(staged_dir)
    )


def windowed_alerts(stream: DataFrame, threshold: float, watermark: str | None = None):
    """W1 tumble + A1 sum + A3 having on the stream."""
    if watermark:
        stream = stream.withWatermark("ts", watermark)
    return (
        stream.groupBy(F.window("ts", "1 minute").alias("w"), "user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).alias("_total"))
        .filter(F.col("_total") > F.lit(threshold))
        .select(
            "user_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col("_total").cast("double").alias("total_amount"),
        )
    )


@with_bounded_shuffle
def run_fraud_alerts_stream(
    spark: SparkSession,
    sf_dir: str,
    table_root: str,
    threshold: float = FRAUD_THRESHOLD,
    n_files: int = 8,
    files_per_trigger: int = 2,
    enrich: bool = False,
    customer_df: DataFrame | None = None,
    nation_df: DataFrame | None = None,
) -> LakeTable:
    """Run the MV-maintenance pipeline to completion over the staged
    backlog; returns the result LakeTable (the 'materialized view').

    update-mode + foreachBatch MERGE keyed (user_id, window_start):
    emit-on-update semantics (W2). With `enrich`, each batch's updated
    alerts are stream-static joined (W5) before the upsert, mirroring
    mv_fraud_alerts_client.
    """
    # staging dir keyed by the result table so concurrent pipelines
    # (plain vs enriched, different callers) never clobber each other
    staged = stage_event_files(
        spark, sf_dir, os.path.basename(os.path.normpath(table_root)), n_files
    )
    if os.path.isdir(table_root):
        shutil.rmtree(table_root)
    result = LakeTable(spark, table_root)

    customer = customer_df if customer_df is not None else load_table(spark, sf_dir, "customer")
    nation = nation_df if nation_df is not None else load_table(spark, sf_dir, "nation")

    def upsert_batch(batch_df: DataFrame, _epoch: int) -> None:
        out = batch_df
        if enrich:
            out = (
                batch_df.join(customer, batch_df.user_id == customer.c_custkey, "left")
                .join(
                    F.broadcast(nation),
                    customer.c_nationkey == nation.n_nationkey,
                    "left",
                )
                .select(
                    F.col("c_custkey").alias("client_id"),
                    F.col("c_name").alias("client_name"),
                    F.col("n_name").alias("client_nation"),
                    "user_id",
                    "window_start",
                    "window_end",
                    "total_amount",
                )
            )
        if not result.exists():
            # stats off: a continuously-merged MV rewrites files every
            # micro-batch — the per-commit stats job (one extra Spark
            # pass per batch) buys nothing until a terminal compaction
            result.create(out, properties={"stats.enabled": "false"})
        else:
            # the plain aggregate is unique-keyed by construction; the
            # enriched form joins CALLER-SUPPLIED dims (customer_df /
            # nation_df) whose key uniqueness we cannot assume — keep
            # the cardinality check there
            result.merge(
                out,
                on=["user_id", "window_start"],
                assume_unique_source=not enrich,
            )

    alerts = windowed_alerts(events_stream(spark, staged, files_per_trigger), threshold)
    ckpt = table_root + "_ckpt"
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    q = (
        alerts.writeStream.outputMode("update")
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not result.exists():  # no alert crossed the threshold
        # the empty table must carry the SINK schema: with enrich=True
        # that is the 7-column enriched shape, not alerts' 4 columns —
        # otherwise repair_null_enrichment and the oracle comparison
        # crash on the missing enrichment columns (r12 review)
        schema = alerts.schema
        if enrich:
            schema = (
                spark.createDataFrame([], alerts.schema)
                .join(customer.limit(0), F.lit(False), "left")
                .join(F.broadcast(nation.limit(0)), F.lit(False), "left")
                .select(
                    F.col("c_custkey").alias("client_id"),
                    F.col("c_name").alias("client_name"),
                    F.col("n_name").alias("client_nation"),
                    "user_id",
                    "window_start",
                    "window_end",
                    "total_amount",
                )
                .schema
            )
        result.create(spark.createDataFrame([], schema))
    return result


@with_bounded_shuffle
def run_append_stream(spark: SparkSession, sf_dir: str, table_root: str) -> LakeTable:
    """S14 stream→table continuous insert / S12 append-only sink: the raw
    stream appended to a lakehouse table via foreachBatch.

    Exactly-once: the epoch id commits atomically WITH the data (a table
    property on the same manifest), so a micro-batch retried after a
    successful commit — failure window between table commit and
    checkpoint write — is detected (epoch <= last applied) and skipped
    instead of double-appended."""
    staged = stage_event_files(spark, sf_dir, "append", n_files=8)
    if os.path.isdir(table_root):
        shutil.rmtree(table_root)
    result = LakeTable(spark, table_root)

    def append_batch(batch_df: DataFrame, epoch: int) -> None:
        epoch_guarded_write(result, batch_df, epoch)

    ckpt = table_root + "_ckpt"
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    q = (
        events_stream(spark, staged, files_per_trigger=2)
        .writeStream.outputMode("append")
        .foreachBatch(append_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result


@with_bounded_shuffle
def run_mor_profile_stream(
    spark: SparkSession,
    sf_dir: str,
    table_root: str,
    files_per_trigger: int = 2,
) -> LakeTable:
    """Streaming keyed MV maintained by MERGE-ON-READ upserts: an
    update-mode per-user aggregate (count / exact decimal sum / max ts)
    where each micro-batch's changed rows land via
    ``LakeTable.upsert_keys_mor`` — one equality-delete sidecar + one
    data-file set per batch, ZERO rewrites of prior MV files. This is
    the CDC-style sink shape for high-churn keyed MVs at 100 TB: commit
    cost tracks the batch's changed-key count, not the MV size, and the
    read side resolves sidecars with sequence-scoped broadcast
    anti-joins. The table is returned UNMATERIALIZED (sidecars intact),
    so the oracle comparison exercises the MoR read path end to end;
    `compact()` is the maintenance hook that folds it flat. Converges
    to the one-shot batch groupBy — the same incremental-MV contract as
    the COW-merge runners."""
    staged = stage_event_files(spark, sf_dir, "morprof", n_files=8)
    if os.path.isdir(table_root):
        shutil.rmtree(table_root)
    result = LakeTable(spark, table_root)

    prof = (
        events_stream(spark, staged, files_per_trigger)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
    )

    def upsert_batch(batch_df: DataFrame, _epoch: int) -> None:
        if not result.exists():
            result.create(batch_df)
        elif batch_df.take(1):
            result.upsert_keys_mor(batch_df, ["user_id"])

    ckpt = table_root + "_ckpt"
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    q = (
        prof.writeStream.outputMode("update")
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result


@with_bounded_shuffle
def run_dedup_stream(spark: SparkSession, sf_dir: str, table_root: str) -> LakeTable:
    """Streaming deduplication: the backlog is staged TWICE (every event
    duplicated across different micro-batches), and
    ``dropDuplicates('event_id')`` with keyed state filters re-deliveries
    — the exactly-once ingest pattern for at-least-once transports. The
    drained table must equal the original events exactly.

    State note: unbounded key state here (matches the finite backlog);
    production pairs it with ``withWatermark`` so delivered keys age out.
    """
    staged = os.path.join(
        SCRATCH, f"staged_dup_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    if os.path.isdir(staged):
        shutil.rmtree(staged)
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.parquet(staged)
    ev.repartition(3).write.mode("append").parquet(staged)  # duplicate delivery

    if os.path.isdir(table_root):
        shutil.rmtree(table_root)
    result = LakeTable(spark, table_root)

    deduped = events_stream(spark, staged, files_per_trigger=2).dropDuplicates(
        ["event_id"]
    )

    def append_batch(batch_df: DataFrame, epoch: int) -> None:
        # dropDuplicates replays deterministically on restart, so a
        # post-commit retry would double-append without the shared
        # exactly-once guard (r12 review)
        epoch_guarded_write(result, batch_df, epoch)

    ckpt = table_root + "_ckpt"
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(append_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result


@with_bounded_shuffle
def run_session_window_stream(
    spark: SparkSession, sf_dir: str, table_root: str, gap: str = "1 hour"
) -> LakeTable:
    """Streaming session-window MV: native `session_window` aggregation
    maintained incrementally over the staged backlog.

    Session windows MERGE as late events bridge gaps, so the session's
    own key (start) is unstable — a keyed MERGE can strand superseded
    rows. Complete-mode + foreachBatch overwrite is the correct
    maintenance loop: each micro-batch rewrites the MV from the full
    session state, and the final table provably equals the one-shot
    batch session_window aggregate (the driver oracle). State is
    O(open sessions); at unbounded scale add a watermark and demote to
    append-mode emission of *closed* sessions — trade-off documented."""
    staged = stage_event_files(spark, sf_dir, "sessmv", n_files=8)
    if os.path.isdir(table_root):
        shutil.rmtree(table_root)
    result = LakeTable(spark, table_root)

    agg = (
        events_stream(spark, staged, files_per_trigger=2)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )

    def overwrite(batch_df: DataFrame, _epoch: int) -> None:
        if not result.exists():
            result.create(batch_df)
        else:
            result.overwrite(batch_df)

    ckpt = table_root + "_ckpt"
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(overwrite)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result


@with_bounded_shuffle
def run_sliding_window_stream(
    spark: SparkSession, sf_dir: str, table_root: str
) -> LakeTable:
    """Incremental sliding-window MV (10 min / 5 min): update-mode +
    foreachBatch MERGE keyed (window_start, event_type) — same
    maintenance loop as the tumbling MV, overlapping windows included."""
    staged = stage_event_files(spark, sf_dir, "sliding", n_files=8)
    if os.path.isdir(table_root):
        shutil.rmtree(table_root)
    result = LakeTable(spark, table_root)

    agg = (
        events_stream(spark, staged, files_per_trigger=2)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

    def upsert(batch_df: DataFrame, _epoch: int) -> None:
        if not result.exists():
            result.create(batch_df)
        else:
            result.merge(batch_df, on=["window_start", "event_type"], assume_unique_source=True)

    ckpt = table_root + "_ckpt"
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return result


def run_stream_stream_join(
    spark: SparkSession,
    sf_dir: str,
    table_root: str,
    minutes: int = 5,
    events_per_slice: int = 250_000,
) -> LakeTable:
    """Stream-stream inner join with event-time range condition: pairs of
    same-user events within N minutes, both sides watermarked — the
    canonical Spark stream-stream pattern (state bounded by watermark +
    the join's time constraint). Drained result must equal the batch
    range self-join.

    Watermark choice (reworked r11 — the 60-day out-wait-everything
    delay ground past 600 s at sf10 holding both 5M-row sides in state):
    the backlog is staged TIME-ORDERED (`stage_event_files
    time_ordered=True` — contiguous event-time slices replayed in slice
    order, a real log tail's near-ordered arrival), so every batch's
    minimum event time is ≥ the previous batch's maximum and NO input
    ever falls behind the watermark regardless of delay. A 10-minute
    delay (join range 5 min + margin) is then lossless by construction
    — drained-equals-batch stays hash-exact — while state holds minutes
    of data instead of the whole backlog. The reference keeps state
    forever (streaming-usecase.md — no watermarks); a production tail
    with genuinely disordered arrival would widen the delay to its
    observed disorder bound, trading state for completeness.

    Slice count scales with the backlog (~250k events per micro-batch,
    floor of 6 slices): with a handful of giant slices each batch spans
    a large share of the TIMELINE, and the watermark — which only
    advances between batches — lets state grow to the whole batch
    (5M rows/side at sf10; the r11 sweep measured that as a >600 s
    state-store grind). Bounded slices cap per-batch state at
    batch + 10-minute carryover regardless of SF; the time-ordered
    invariant (every slice's min ≥ previous slice's max) holds for any
    slice count, so drained-equals-batch is unaffected.

    Scale history (all sf10, same box): r11 unbucketed 250k/batch
    drained in 418 s; 1M/batch DNF — with state keyed on user ALONE,
    every insert probed the user's whole resident window, so fatter
    batches were quadratic. RocksDB A/B'd r12: DNF both ways (128
    store instances re-opened per batch swamp local mode). r12's
    backlog-scaled state parallelism + stats-off sink got 195 s.

    r13, the structural fix — coarse time-bucket state keys: state is
    keyed on (user, floor(ts / range)) with the right side replicated
    into its own and the PREVIOUS bucket (a pair's buckets differ by
    at most 1, see _run_stream_stream_join), so a probe touches only
    the two buckets that can satisfy the range instead of the user's
    entire resident state. That removes the quadratic term entirely —
    and flips the r11 slice economics: fat batches are now CHEAPER
    (fewer per-batch state-store commit rounds at ~equal insert
    work), so files_per_trigger targets ~8 micro-batches per drain
    instead of 40. Measured drains at sf10: r12 code 195 s →
    bucketed @40 batches 153 s → bucketed @9 batches 52.7 s (raw
    parquet sink; sweep: fpt=4 63.6 s, fpt=5 52.7 s, fpt=6 62.0 s,
    48 state partitions 227 s — oversubscription, delay=6 min 71 s —
    no win, kept 10 min margin). Batch A/B of the same bucketization:
    the 502M-pair self-join fell 131.6 s → 7.5 s, confirming the
    candidate-blowup diagnosis."""
    n_events = load_table(spark, sf_dir, "events").count()
    n_files = max(6, -(-n_events // events_per_slice))
    # ~8 micro-batches per drain (see scale history above); the
    # 6-file floor keeps the small-SF bench stream genuinely
    # multi-batch at 2 batches (fpt=3), its measured sweet spot
    fpt = 3 if n_files == 6 else max(1, n_files // 8)
    # backlog-scaled state parallelism: ~300k events per state
    # partition, floor 8 (the bench-stream sweet spot), capped by the
    # session value inside bounded_shuffle
    parts = max(8, n_events // 300_000)
    with bounded_shuffle(spark, n=parts):
        return _run_stream_stream_join(
            spark, sf_dir, table_root, minutes, n_files, fpt
        )


def _run_stream_stream_join(
    spark: SparkSession,
    sf_dir: str,
    table_root: str,
    minutes: int,
    n_files: int,
    fpt: int,
) -> LakeTable:
    staged = stage_event_files(
        spark, sf_dir, "ssj", n_files=n_files, time_ordered=True
    )
    if os.path.isdir(table_root):
        shutil.rmtree(table_root)
    result = LakeTable(spark, table_root)

    # Coarse time-bucket join key (r13 — the batch range-join
    # bucketization applied to the STATE key): with equality on
    # user alone, every left insert probes ALL stored right events of
    # that user still inside the watermark, and the range predicate
    # filters after the fact — per-user-per-window candidate blowup is
    # what made allUpdatesTimeMs ~60% of the 195 s sf10 drain. Keying
    # state by (user, floor(ts / range)) and replicating the right
    # side into its own and the PREVIOUS bucket (a pair's buckets can
    # differ by at most 1 — floor((x+w)/w) = floor(x/w)+1 on the
    # second-truncated timestamps, and ts_b ∈ (ts_a, ts_a+w] bounds
    # sec_b − sec_a to [0, w]) makes each probe touch only the ~two
    # buckets that can satisfy the range. Batch A/B of the same
    # rewrite: 131.6 s → 7.5 s for the 502M-pair self-join at sf10.
    # The range condition stays in the join, so watermark-based state
    # eviction is unchanged; the explode doubles right-side state rows
    # but each key's bucket is dense-time-local so totals still track
    # the watermark window.
    bucket_w = minutes * 60
    left = (
        events_stream(spark, staged, files_per_trigger=fpt)
        .select(
            F.col("event_id").alias("event_a"),
            F.col("user_id").alias("user_a"),
            F.col("ts").alias("ts_a"),
        )
        .withWatermark("ts_a", "10 minutes")
        .withColumn(
            "bucket_a", F.floor(F.unix_timestamp(F.col("ts_a")) / bucket_w)
        )
    )
    _bb = F.floor(F.unix_timestamp(F.col("ts_b")) / bucket_w)
    right = (
        events_stream(spark, staged, files_per_trigger=fpt)
        .select(
            F.col("event_id").alias("event_b"),
            F.col("user_id").alias("user_b"),
            F.col("ts").alias("ts_b"),
        )
        .withWatermark("ts_b", "10 minutes")
        .withColumn("bucket_b", F.explode(F.array(_bb, _bb - 1)))
    )
    pairs = left.join(
        right,
        (F.col("user_a") == F.col("user_b"))
        & (F.col("bucket_a") == F.col("bucket_b"))
        & (F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr(f"INTERVAL {minutes} MINUTES")),
        "inner",
    ).select("event_a", "event_b", F.col("user_a").alias("user_id"), "ts_a", "ts_b")

    def append_batch(batch_df: DataFrame, epoch: int) -> None:
        # stats off inside the helper: the per-commit stats pass
        # re-scans the freshly written files — measured ~25% of each
        # batch's sink cost here
        epoch_guarded_write(result, batch_df, epoch)

    ckpt = table_root + "_ckpt"
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)
    q = (
        pairs.writeStream.outputMode("append")
        .foreachBatch(append_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not result.exists():
        result.create(spark.createDataFrame([], pairs.schema))
    return result


def repair_null_enrichment(
    result: LakeTable, customer: DataFrame, nation: DataFrame
) -> LakeTable:
    """The periodic repair MERGE reproducing RisingWave's retroactive dim
    backfill (streaming-usecase.md:278-291): rows whose enrichment came
    up NULL (P8 predicate) are re-joined against the current dims and
    upserted by (user_id, window_start)."""
    cur = result.read()
    orphans = cur.filter(F.col("client_id").isNull()).select(
        "user_id", "window_start", "window_end", "total_amount"
    )
    if not orphans.take(1):
        # nothing to repair: skip the O(MV size) copy-on-write MERGE
        # rewrite and the spurious snapshot most scheduled repair
        # cycles would otherwise commit (r12 review)
        return result
    repaired = (
        orphans.join(customer, orphans.user_id == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .select(
            F.col("c_custkey").alias("client_id"),
            F.col("c_name").alias("client_name"),
            F.col("n_name").alias("client_nation"),
            "user_id",
            "window_start",
            "window_end",
            "total_amount",
        )
    )
    result.merge(repaired, on=["user_id", "window_start"], assume_unique_source=True)
    return result
