"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed end-to-end (plan + execute + materialize every
result row into the ``noop`` sink — the standard Spark benchmark action;
``count()`` would add a 2-stage aggregation exchange of its own, ~65 ms
of pure harness overhead per query on this box). A warmup pass on
sf0.001 first touches the JVM/codegen paths so per-query numbers
reflect steady state.

Medians protocol (r14): each query runs SPARK_GRAFT_BENCH_RUNS times
(default 5, min 3) and the headline ``value`` is the sum of per-query
MEDIANS; the full run arrays (Spark and DuckDB) plus a suite-level
[sum-of-min, sum-of-max] spread band ship in the payload so a
round-over-round ratio claim is only meaningful when it exceeds the
recorded spread. BENCH_r01-r13's ``value`` was sum-of-best-of-3; the
best-of view is kept under ``value_best_of_runs`` for continuity.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_iceberg_sandbox_spark.session import get_spark_session

HEADLINE = [
    "flagship_fraud_enriched",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q7_volume_shipping",
    "a4_tumble_agg",
    "w_rank_topk",
    "sessionize_events",
    "asof_latest_order",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality_score",
    "corpus_token_stats",
]


def _host_probes() -> tuple[float | None, float | None]:
    """Cheap host-state probes (~0.6 s total; see payload comment).

    parallel_efficiency = spin_time / wall for N concurrent busy-spins
    (N = min(advertised cores, 16)); ~1.0 on a quiet box, ~0.5 in the
    degraded-core window r14 documented. membw_gbps = one write + one
    reduce pass over a 256 MB numpy buffer — catches the
    large-allocation page-fault pathology this sandbox exhibited in the
    r14 continuation (0.3 GB/s on multi-GB temporaries vs ~2 GB/s
    healthy)."""
    par = bw = None
    try:
        # plain subprocess spinners, NOT multiprocessing: forking a
        # driver that hosts a JVM (py4j threads, sockets) is the
        # classic rare-hang, and a hung probe would stall the whole
        # bench — no payload field is worth that. Fresh `python -c`
        # children import nothing heavy; the measured window is the
        # spin duration reported by each child, so startup skew only
        # shows up in the wall term (which is the point).
        import subprocess

        n_workers = min(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 16)
        spin = 0.25
        code = (
            "import time; t0=time.perf_counter()\n"
            f"while time.perf_counter()-t0 < {spin}: pass\n"
        )
        t0 = time.perf_counter()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            for _ in range(n_workers)
        ]
        for p in procs:
            p.wait(timeout=30)
        wall = time.perf_counter() - t0
        # subtract one measured interpreter startup so the ratio
        # reflects contention, not exec overhead
        t1 = time.perf_counter()
        subprocess.run(
            [sys.executable, "-c", "pass"],
            check=False,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
            timeout=30,
        )
        startup = time.perf_counter() - t1
        busy = wall - startup
        if busy > 0:
            par = round(min(spin / busy, 1.0), 3)
    except Exception:  # noqa: BLE001 — probes must never fail the bench
        pass
    try:
        import numpy as np

        n = 32 * 1024 * 1024  # 256 MB of float64
        t0 = time.perf_counter()
        arr = np.ones(n)
        arr.sum()
        dt = time.perf_counter() - t0
        if dt > 0:
            bw = round((n * 8 * 2 / dt) / 1e9, 2)  # write + read pass
        del arr
    except Exception:  # noqa: BLE001
        pass
    return par, bw


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # anchored float pattern (r13 review: [0-9.]+ admitted 'sf.cache' /
    # 'sf1.0.bak' whose group crashed float() before any timing)
    m = re.search(r"sf([0-9]+(?:\.[0-9]+)?)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    headline = HEADLINE
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:  # comma-separated override for quick/partial runs
        headline = [n.strip() for n in subset.split(",") if n.strip()]
        unknown = [n for n in headline if n not in queries]
        if unknown:
            # fail LOUD (r13 review): a typo'd override used to bench
            # nothing and exit 0 with a vacuously green record
            raise SystemExit(
                f"SPARK_GRAFT_BENCH_QUERIES names not in the registry: "
                f"{unknown}"
            )
    names = [n for n in headline if n in queries]
    if "--self-test-broken" in sys.argv:
        # prove fault isolation end-to-end: a query that always raises
        # must show up under "errors" while the rest still get timed
        def _broken(spark, sf_dir):
            raise RuntimeError("bench self-test: deliberately broken query")

        queries["__broken__"] = _broken
        names.append("__broken__")

    # Local-bench sizing scales with the SF under test — exactly what a
    # cluster deployment does (conf sized by executor count / data
    # volume, AQE on at real scale):
    #   sf<=0.1 (17 MB): the cluster default (128 MB splits) serializes
    #     every scan onto one core — 4 MB splits give each core work
    #     while keeping the pinned cache at a handful of partitions; 4
    #     post-shuffle partitions keep stage scheduling overhead ~0. AQE
    #     off: at 17 MB its per-stage re-optimization rounds cost more
    #     than they save (measured ~10-15%; it cannot change these
    #     already-broadcast plans). Note (ADVICE r2): with AQE off, q17 —
    #     whose docstring defers its per-partkey aggregate join sizing to
    #     AQE — would run the conservative shuffle-join shape; q17 is not
    #     in HEADLINE, so no timed number depends on AQE sizing.
    #   sf>=1 (175 MB+): wide aggs/joins move real row volume, so the
    #     post-shuffle width rises toward the core count and splits grow
    #     so the scan task count stays O(cores), not O(hundreds).
    # Both knobs stay env-overridable for tuning sweeps.
    # r15 (VERDICT #1): the width band is capped by $SPARK_GRAFT_CPUS so
    # the driver's lower-core-count run genuinely sizes down instead of
    # running the 32-core constants — at sf0.1 the data-derived band (4)
    # is already below any plausible core count, so the headline numbers
    # stay comparable; the scaling probe's ≈1 ratios there are explained
    # by floor_decomposition_sec, not by core-blind sizing.
    _cpus_env = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 4
    )
    if sf >= 10:
        _shuffle, _split = 32, "32m"
    elif sf >= 1:
        _shuffle, _split = 8, "8m"
    else:
        _shuffle, _split = 4, "4m"
    _shuffle = min(_shuffle, max(2, _cpus_env))
    _shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", _shuffle))
    _split = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", _split)
    spark = get_spark_session(
        app_name="bench",
        shuffle_partitions=_shuffle,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": _split,
            "spark.sql.files.openCostInBytes": "262144",
            "spark.scheduler.mode": "FAIR",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    # warmup: run each headline once at the smallest SF to JIT/codegen
    for n in names:
        try:
            queries[n](spark, "/root/testdata/sf0.001").count()
        except Exception:
            pass

    # Buffer pool: pin the base tables in memory once — every query's
    # scan subtree is plan-identical to the cached frame, so Spark's
    # CacheManager substitutes the in-memory columnar relation. This is
    # the resident-engine shape (DuckDB equally serves these 17 MB from
    # its buffer manager / OS page cache); at cluster scale the analog
    # is hot-table caching on the executors.
    #
    # BALANCE the pin: the testdata parquet is written as a single row
    # group per table, so byte-range splits collapse onto ONE task — a
    # cache built straight off the scan holds all of lineitem in one
    # partition and every downstream query runs single-threaded (we
    # measured the r9 suite doing exactly that: 600k-row agg 0.158 s
    # skewed vs 0.065 s balanced). A one-time round-robin repartition at
    # pin time (~40k rows/partition, capped at 16 — the measured sweet
    # spot; 32+ partitions re-pay per-task overhead) is the cluster
    # analog of caching a hot table with sane partitioning.
    # Keyed layout (registry.pin_balanced): each fact hash-clustered by
    # its canonical key — the bucketed-table shape — so orderkey joins
    # and per-user windows start exchange-free. Cap 16 / 40k-row slices:
    # the measured sf0.1 sweet spot (32+ partitions re-pay per-task
    # overhead at this scale).
    from data_iceberg_sandbox_spark.sources.registry import pin_balanced as _pb

    # slice cap scales with the advertised core count (r15, VERDICT #1):
    # 16 is the measured sf0.1 sweet spot on 32 cores (32+ slices re-pay
    # per-task overhead); a smaller box pins fewer slices instead of
    # running the 32-core constant.
    _pin_slices = min(_cpus_env, 16)
    _pinned = _pb(spark, sf_dir, cpus=_pin_slices, min_rows_per_slice=40_000)

    def materialize(df) -> None:
        # noop sink: executes the full plan and materializes every result
        # row without a driver transfer or an extra count-agg stage
        df.write.format("noop").mode("overwrite").save()

    # Bench fairness (r15, VERDICT "What's wrong" #1): a query that
    # registers its OWN cache (the dedup family's multiply-consumed
    # candidate frames) would otherwise serve run N from run N−1's
    # materialized blocks — the median then measures cache-hit
    # re-execution, not the declared plan. Between timed runs, if the
    # previous run left any persistent RDD beyond the base-table pin,
    # we clear the SQL CacheManager entirely, drop orphaned blocks, and
    # re-pin the base tables (all untimed): the next run re-registers
    # its caches and materializes them INSIDE its own timing window, so
    # the median measures the declared plan — cache-cold per run with
    # intra-run DAG reuse intact. Surgically unpersisting just the
    # query's buffer RDD was probed and REJECTED: CachedRDDBuilder
    # memoizes the buffer RDD, so an external unpersist leaves it at
    # StorageLevel NONE forever and every later consumer recomputes —
    # that times the NO-cache plan, not the declared one (probe: 0
    # cached partitions after re-consume, steady recompute per action).
    # The base-table pin stays warm across runs (symmetric across
    # rounds and with DuckDB's warmed page cache; see the pin comment
    # above). Leftover locally-checkpointed RDDs are unpersisted too —
    # a localCheckpoint is per-invocation (no plan-matched reuse across
    # runs, so the orphaned blocks are pure leak, never a speedup). For
    # queries that register no cache this is one py4j probe per run.
    _jpersist = spark.sparkContext._jsc.getPersistentRDDs

    def _persistent_ids() -> set[int]:
        return {int(i) for i in _jpersist().keySet().toArray()}

    _known_ids = _persistent_ids()

    def reset_nonpinned_caches() -> None:
        nonlocal _known_ids, _pinned
        if _persistent_ids() <= _known_ids:
            return
        try:
            spark.catalog.clearCache()
            jmap = _jpersist()
            for rid in list(jmap.keySet().toArray()):
                try:
                    jmap.get(rid).unpersist(True)
                except Exception:  # noqa: BLE001 — best-effort block drop
                    pass
            _pinned = _pb(
                spark, sf_dir, cpus=_pin_slices, min_rows_per_slice=40_000
            )
            _known_ids = _persistent_ids()
        except Exception:  # noqa: BLE001 — fairness must not abort timing
            pass

    # Fixed-floor probe: Spark charges a per-action scheduling/driver
    # round-trip cost even for a 1-row noop write. Median of 10 is the
    # box's floor; multiplied by each query's job count below it bounds
    # how much of the sequential total is irreducible harness latency
    # rather than plan work (VERDICT r3/r4 ask).
    floor_samples = []
    for _ in range(10):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floor_samples.append(time.perf_counter() - t0)
    floor_sec = round(sorted(floor_samples)[len(floor_samples) // 2], 4)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # Medians protocol (VERDICT r13 #3): N runs per query (default 5),
    # report the MEDIAN and keep the full run array in the payload so
    # round-over-round ratio claims can be checked against the recorded
    # spread instead of single-shot noise (r13's four captures of the
    # same code spanned 1.40-1.66x — unanswerable at the margin). The
    # min ("best") is still recorded for continuity with BENCH_r01-r13,
    # whose `value` was sum-of-best-of-3. Per-query try/except: one
    # broken query must never abort the suite (BENCH_r04 lost ALL
    # signal to a single erroring query).
    n_runs = max(3, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    times: dict[str, float] = {}
    times_best: dict[str, float] = {}
    runs_per_query: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    jobs_per_query: dict[str, int] = {}

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    for n in names:
        group = f"bench:{n}"
        try:
            sc.setJobGroup(group, n)
            # warm pass AT THE TARGET SF (r14): the sf0.001 warmup above
            # compiles the small-SF plan, but the first sf0.1 execution
            # still pays C2-JIT/codegen on the real-volume loops — the
            # first capture under the medians protocol showed run 0 of
            # EVERY query 2-20x slower than runs 1-4 (dedup_minhash 3.76s
            # vs 0.16s steady). One untimed run makes the recorded run
            # arrays steady-state, same protocol as tools/bench_sf_*.py.
            materialize(queries[n](spark, sf_dir))
            jobs_before_last = 0
            samples: list[float] = []
            for run in range(n_runs):
                # every timed run starts cache-cold for query-registered
                # caches (see reset_nonpinned_caches above) — including
                # run 0, whose warm pass would otherwise have pre-built
                # them
                reset_nonpinned_caches()
                if run == n_runs - 1:
                    # Steady-state job count = jobs of the LAST timed run
                    # only (id-diff). Run 1 can schedule extra one-time
                    # jobs (memoized plan-build collects, cache misses),
                    # so dividing the group total by n_runs silently
                    # floors — and floor_decomposition_sec is a
                    # load-bearing number in the 2x-gate argument.
                    jobs_before_last = len(tracker.getJobIdsForGroup(group))
                t0 = time.perf_counter()
                materialize(queries[n](spark, sf_dir))
                dt = time.perf_counter() - t0
                if os.environ.get("SPARK_GRAFT_BENCH_DEBUG"):
                    print(f"  [run {run}] {n}: {dt:.3f}", file=sys.stderr)
                samples.append(dt)
            runs_per_query[n] = [round(x, 4) for x in samples]
            times[n] = round(_median(samples), 4)
            times_best[n] = round(min(samples), 4)
            jobs_per_query[n] = (
                len(tracker.getJobIdsForGroup(group)) - jobs_before_last
            )
        except Exception as e:  # noqa: BLE001 — isolate, report, continue
            errors[n] = f"{type(e).__name__}: {e}"[:300]
    sequential_total = round(sum(times.values()), 4)
    sequential_best = round(sum(times_best.values()), 4)
    # Conservative suite-level spread bound: sum of per-query minima /
    # maxima. Any two captures of the same code should land inside it.
    suite_min = round(sum(min(r) for r in runs_per_query.values()), 4)
    suite_max = round(sum(max(r) for r in runs_per_query.values()), 4)
    total_jobs = sum(jobs_per_query.values())
    floor_total = round(floor_sec * total_jobs, 4)
    names = [n for n in names if n not in errors]

    # Throughput view: the suite issued concurrently (FAIR scheduler, one
    # SparkSession) — the realistic multi-tenant shape; wall-clock amortizes
    # Spark's fixed per-query scheduling latency across the fleet of cores.
    # Best-of-2: a single concurrent wall on a shared box swings ±50%.
    # Concurrent-phase failures go to their OWN dict: a query that timed
    # fine sequentially but failed under concurrency would otherwise sit
    # in both `queries` and `errors`, leaving the JSON ambiguous about
    # whether its sequential number is trustworthy (it is).
    concurrent_errors: dict[str, str] = {}

    def _run_isolated(n: str) -> None:
        try:
            materialize(queries[n](spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — isolate, report, continue
            concurrent_errors.setdefault(n, f"{type(e).__name__}: {e}"[:300])

    concurrent_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=min(8, len(names) or 1)) as ex:
            list(ex.map(_run_isolated, names))
        concurrent_wall = min(concurrent_wall, time.perf_counter() - t0)
    concurrent_wall = round(concurrent_wall, 4)

    # Transparency: time DuckDB on the IDENTICAL oracle SQL immediately
    # after the Spark batch phase (same process, same box state — NOT
    # after the streaming/load phases have churned all cores), so the
    # spark/duckdb ratio is same-conditions.
    duckdb_sequential = None
    duckdb_suite_min = duckdb_suite_max = None
    duckdb_queries: dict[str, float] = {}
    duckdb_runs: dict[str, list[float]] = {}
    try:
        import duckdb

        oracles = entry_mod.oracle_sql()
        con = duckdb.connect()
        for t in (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        ):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        dtot = 0.0
        for n in names:
            if n not in oracles:
                continue
            try:
                con.execute(oracles[n]).fetchall()  # warm (page cache/JIT)
                samples = []
                for _ in range(n_runs):
                    t0 = time.perf_counter()
                    con.execute(oracles[n]).fetchall()
                    samples.append(time.perf_counter() - t0)
                duckdb_runs[n] = [round(x, 4) for x in samples]
                dmed = _median(samples)
                dtot += dmed
                duckdb_queries[n] = round(dmed, 4)
            except Exception:  # one broken oracle must not kill the ratio
                pass
        if duckdb_queries:
            duckdb_sequential = round(dtot, 4)
            duckdb_suite_min = round(
                sum(min(r) for r in duckdb_runs.values()), 4
            )
            duckdb_suite_max = round(
                sum(max(r) for r in duckdb_runs.values()), 4
            )
        # else: every oracle errored — leave None rather than publish a
        # 0.0 s "total" that reads as an infinite Spark slowdown
        # (r14 sweep)
    except Exception:
        pass

    # streaming throughput sanity (reference-derived target: >=10k events/s
    # through the tumble+sum+having MV pipeline, BASELINE.md)
    stream_eps = None
    try:
        from data_iceberg_sandbox_spark.sources.registry import load_table
        from data_iceberg_sandbox_spark.streaming.fraud_stream import (
            SCRATCH,
            run_fraud_alerts_stream,
        )

        n_events = load_table(spark, sf_dir, "events").count()
        # best-of-2 like the batch timings: a single stream run on a
        # shared box swings ±30% (micro-batch scheduling vs GC pauses)
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            run_fraud_alerts_stream(
                spark, sf_dir, os.path.join(SCRATCH, f"bench_mv{i}"), 100.0, 8, 2
            )
            best = min(best, time.perf_counter() - t0)
        stream_eps = round(n_events / best, 1)
    except Exception:
        pass

    # batch-load throughput: the reference's 200k-row ETL load
    # (create_table.py + infra/README.md:81-82) as generate → partitioned
    # lakehouse create, end to end
    load_rows_per_sec = None
    try:
        import shutil

        from data_iceberg_sandbox_spark.sources.datagen import generate_clients
        from data_iceberg_sandbox_spark.tables.laketable import LakeTable

        root = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".scratch", "bench_load"
        )
        if os.path.isdir(root):
            shutil.rmtree(root)
        t0 = time.perf_counter()
        LakeTable(spark, root).create(
            generate_clients(spark, 0, 200_000),
            partition_by=["category"],
            # ingest-optimized: skip the per-file stats job (file skipping
            # is for scan-heavy tables; a raw load lane opts out)
            properties={"stats.enabled": "false"},
        )
        load_rows_per_sec = round(200_000 / (time.perf_counter() - t0), 1)
    except Exception:
        pass

    host_parallel_efficiency, host_membw_gbps = _host_probes()

    payload = {
        "metric": (
            "headline_suite_sec (sequential sum of per-query medians of "
            f"{n_runs} runs; concurrent wall in extras)"
        ),
        "value": sequential_total,
        "unit": "sec",
        # Protocol version (r15, VERDICT #9): 1 = sum of best-of-3
        # (BENCH_r01–r13), 2 = sum of per-query medians of 5 with
        # cache-cold timed runs (r14+; r14 lacked this field and the
        # between-run cache reset — docs/BENCH_NOTES.md maps the
        # statistics). PERF consumers must not compare `value` across
        # protocol versions; `value_best_of_runs` is the v1-comparable
        # statistic.
        "protocol_version": 2,
        # CPU-scaling contract (r15, VERDICT #1): the RESOLVED runtime
        # master and parallelism, so the driver's lower-core-count run
        # can verify $SPARK_GRAFT_CPUS is honored instead of suspecting.
        "master": sc.master,
        "default_parallelism": sc.defaultParallelism,
        "shuffle_partitions": _shuffle,
        "pin_slice_cap": _pin_slices,
        "queries": times,
        "runs_per_query_count": n_runs,
        "query_runs": runs_per_query,
        "queries_best": times_best,
        "value_best_of_runs": sequential_best,
        "suite_spread_sec": [suite_min, suite_max],
        "sf": sf,
        "concurrent_wall_sec": concurrent_wall,
        "concurrency": min(8, len(names) or 1),
        "n_queries": len(names),
        "errors": errors or None,
        "concurrent_errors": concurrent_errors or None,
        "floor_sec_per_action": floor_sec,
        "jobs_per_query": jobs_per_query,
        "total_jobs": total_jobs,
        "floor_decomposition_sec": floor_total,
        "streaming_events_per_sec": stream_eps,
        "batch_load_rows_per_sec": load_rows_per_sec,
        "duckdb_sequential_sec_same_sql": duckdb_sequential,
        "duckdb_queries": duckdb_queries or None,
        "duckdb_query_runs": duckdb_runs or None,
        "duckdb_suite_spread_sec": (
            [duckdb_suite_min, duckdb_suite_max]
            if duckdb_suite_min is not None
            else None
        ),
        # Methodology (timing action, concurrent-wall rationale, floor
        # decomposition, DuckDB comparison protocol): docs/BENCH_NOTES.md.
        "notes": "methodology: docs/BENCH_NOTES.md",
        # Host-state probes (ADD-only fields, r14 ledger item 6): the
        # r14 sessions hit a degraded box twice (see ROUND14_NOTES
        # "Benchmarking-protocol findings" and the OPTIMIZATION_r14
        # box-state section) — these two numbers let a reader judge
        # whether a capture's absolutes are comparable across rounds.
        # parallel_efficiency: 1.0 = the advertised cores deliver; the
        # degraded r14 window measured ~0.5. membw_gbps: sequential
        # touch+reduce bandwidth over a 256 MB buffer; the r14b window
        # measured large-allocation page-fault pathology (~0.3 GB/s on
        # >1 GB temporaries) that inflated Arrow kernels 10x.
        "host_parallel_efficiency": host_parallel_efficiency,
        "host_membw_gbps": host_membw_gbps,
    }
    line = json.dumps(payload)
    # Durable copy: the driver captures stdout and has truncated this line
    # before (BENCH_r06.json parsed:null) — the in-repo file is the record.
    # Self-test runs (the pytest contract check) are NOT a record and must
    # not clobber it.
    if "--self-test-broken" not in sys.argv:
        try:
            out = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_last.json"
            )
            with open(out, "w") as fh:
                fh.write(line + "\n")
        except OSError:
            pass
    print(line)


if __name__ == "__main__":
    main()
