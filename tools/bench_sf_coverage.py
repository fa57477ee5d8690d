"""Scale datapoint for EVERY queries() name (VERDICT r9 item 7).

The medians files cover the ~91 steady-state batch queries; this tool
sweeps the remainder — lifecycle table ops, streaming micro-batch
specs, eager/driver-bounded ops, and the cheap relational surface — so
every name in ``queries()`` has one honest sf10 datapoint.

Honesty rules (same family as docs/BENCH_NOTES.md):

- Every name records ``build_sec`` — wall time of ``queries[n](spark,
  sf_dir)`` itself. For plain batch queries that is plan construction
  (~ms); for lifecycle ops it INCLUDES the scratch-table build, and
  for eager ops (e.g. PCA power iteration) it includes the driver-side
  iterations. Large build_sec is reported, never hidden.
- ``spark_median`` is the median of N repeat noop-sink actions on the
  returned frame — the steady-state read. For lifecycle/streaming
  names this times re-reading the already-built table/result, NOT the
  build; ``e2e_first_sec`` (= build + first action) is the number to
  quote for the op itself and the tool says so via ``class``.
- DuckDB ratio is published only for batch names whose oracle reads
  the same base parquet (work-equivalent). Lifecycle/streaming oracles
  reconstruct expected RESULTS from base tables — result-equivalent,
  not work-equivalent — so a ratio would be meaningless; those rows
  carry ``ratio_skip_reason`` instead.
- Single-session capture, balanced pin, separate labeled output file —
  never merged into BENCH_SF_MEDIANS.json absolutes.

Usage: python tools/bench_sf_coverage.py out.json [name ...]
  (no names = every queries() name absent from bench_sf_medians.QUERIES)
Env: SF_DIR (default .scratch/sf10), RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Oracles intractable at sf10 (single-node recursive/quadratic
# formulations) — Spark side still runs; the skip reason is published.
DUCK_SKIP: dict[str, str] = {
    "canonicalize_corpus": "recursive union-find CTE collapses at sf10",
    "duplicate_clusters": "recursive min-label-propagation CTE over the "
    "candidate graph is quadratic-ish at sf10; verified hash-exact at "
    "sf0.01 instead",
}

DUCK_SLOW_CUTOFF = 20.0  # one sample only past this (seconds)


def classify(name: str) -> str:
    if name.startswith("stream_"):
        return "streaming-e2e"
    lifecycle = {
        "s2_create_partitioned", "s3_append", "s4_merge_upsert",
        "s5_keyed_upsert", "s7_csv_seed", "d5_schema_evolution",
        "d6_time_travel", "d7_compact", "d8_expire_snapshots",
    }
    if name in lifecycle or name.startswith("d_"):
        return "lifecycle-e2e"
    return "batch"


def main() -> None:
    out_path = sys.argv[1]
    only = sys.argv[2:]
    sf_dir = os.environ.get("SF_DIR", ".scratch/sf10")
    runs = int(os.environ.get("RUNS", "3"))

    from data_iceberg_sandbox_spark.session import get_spark_session
    from data_iceberg_sandbox_spark.sources.registry import TABLES, pin_balanced

    import __spark_entry__ as entry_mod
    import tools.bench_sf_medians as med_mod

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    if only:
        unknown = sorted(set(only) - set(queries))
        if unknown:
            # a typo'd repair invocation must fail loudly, not exit 0 with
            # an empty sweep (ADVICE r10)
            raise SystemExit(f"unknown query names: {unknown}")
        names = list(only)
    else:
        covered = set(med_mod.QUERIES)
        names = [n for n in queries if n not in covered]

    # Resume (RESUME=1): load the existing out file and keep every row it
    # already holds — the spark phase skips names with a spark_median (or
    # recorded error), the oracle phase skips rows that already carry a
    # duckdb_median / ratio_skip_reason. A multi-hour sf10 sweep can then
    # survive wall-clock cutoffs across invocations instead of silently
    # overwriting earlier captures.
    resume: dict[str, dict] = {}
    if os.environ.get("RESUME") and os.path.exists(out_path):
        with open(out_path, encoding="utf-8") as f:
            resume = json.load(f).get("per_query", {})
        for n in only:  # explicitly requested names always re-run
            resume.pop(n, None)

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "80g")
    spark = get_spark_session(
        app_name="bench_coverage",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    pinned = pin_balanced(spark, sf_dir)  # noqa: F841 — keeps caches alive

    def action(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    med = lambda xs: round(statistics.median(xs), 3)  # noqa: E731
    per: dict[str, dict] = dict(resume)

    def dump() -> None:  # incremental: partial sweeps survive a cutoff
        payload = {
            "note": "coverage sweep for names absent from "
            "BENCH_SF_MEDIANS.json; single labeled session — do not merge "
            "absolutes across files. See module docstring for class "
            "semantics (lifecycle/streaming/eager rows publish "
            "e2e_first_sec, not a DuckDB ratio). Incrementally written; "
            "names without a duckdb_median may still be awaiting the "
            "oracle phase.",
            "sf_dir": sf_dir,
            "runs": runs,
            "per_query": per,
        }
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=1)

    spark_timeout = float(os.environ.get("QUERY_TIMEOUT", "600"))

    def run_spark_side(n: str, res: dict) -> None:
        t0 = time.perf_counter()
        df = queries[n](spark, sf_dir)
        res["build_sec"] = round(time.perf_counter() - t0, 3)
        res["e2e_first_sec"] = round(res["build_sec"] + action(df), 3)
        res["spark_runs"] = [round(action(df), 3) for _ in range(runs)]
        res["spark_median"] = med(res["spark_runs"])

    for n in names:
        prev = per.get(n)
        if prev and ("spark_median" in prev or "error" in prev):
            continue  # resumed row
        cls = classify(n)
        row: dict = {"class": cls}
        # Per-query wall deadline (QUERY_TIMEOUT, default 600s): one
        # intractable-at-sf10 op must cost the sweep its own budget, not
        # block the remaining names (r11: stream_stream_range_join's
        # 60-day-watermark state grind). On expiry: cancel every job,
        # stop active streams, record the timeout as the row's result.
        import threading

        res: dict = {}
        err: list = []

        def work(n=n, res=res, err=err) -> None:
            try:
                run_spark_side(n, res)
            except Exception as exc:  # noqa: BLE001 — published per row
                err.append(f"{type(exc).__name__}: {exc}"[:300])

        w = threading.Thread(target=work, daemon=True)
        w.start()
        w.join(spark_timeout)
        if w.is_alive():
            row["error"] = f"spark side exceeded {spark_timeout:.0f}s (killed)"
            try:
                for q in spark.streams.active:
                    q.stop()
                spark.sparkContext.cancelAllJobs()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass
            w.join(30)
        elif err:
            row["error"] = err[0]
        else:
            row.update(res)
        if "error" in row:
            per[n] = row
            dump()
            print(f"spark {n}: ERROR {row['error']}", file=sys.stderr, flush=True)
            continue
        # post-hoc eager detection: if plan construction did the real
        # work (driver-bounded iterations, eager CC rounds), the repeat
        # action times only the residual frame and a DuckDB ratio would
        # flatter it — reclass and publish e2e_first_sec instead (the
        # embedding_pca_power_iteration rule from bench_sf_medians).
        if cls == "batch" and row["build_sec"] > max(1.0, 5 * row["spark_median"]):
            row["class"] = cls = "eager-e2e"
        per[n] = row
        dump()
        print(
            f"spark {n} [{cls}]: build {row['build_sec']} runs {row['spark_runs']}",
            file=sys.stderr, flush=True,
        )

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    def duck_run_with_timeout(sql: str, seconds: float) -> float:
        """One timed execute, interrupted from a watchdog thread if it
        exceeds `seconds` (some sf10 oracles — e.g. the SemDeDup n×k
        crossJoin replay — are intractable single-node; the honest record
        is 'oracle exceeded Ns', not a hung sweep)."""
        import threading

        done = threading.Event()

        def watchdog() -> None:
            if not done.wait(seconds):
                con.interrupt()

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
        finally:
            done.set()
        return time.perf_counter() - t0

    duck_timeout = float(os.environ.get("DUCK_TIMEOUT", "300"))
    for n in names:
        row = per.get(n)
        if row is None or "error" in row:
            continue
        if "duckdb_median" in row or "ratio_skip_reason" in row:
            continue  # resumed row
        if row["class"] != "batch":
            row["ratio_skip_reason"] = (
                f"{row['class']}: oracle reconstructs results from base "
                "tables (result-equivalent, not work-equivalent); "
                "e2e_first_sec is the honest op cost"
            )
            continue
        sql = oracles.get(n)
        if not sql:
            row["ratio_skip_reason"] = "no SQL oracle (rows-only op)"
            continue
        if n in DUCK_SKIP:
            row["ratio_skip_reason"] = f"DUCK_SKIP: {DUCK_SKIP[n]}"
            continue
        try:
            first = duck_run_with_timeout(sql, duck_timeout)
            samples = [first]
            if first <= DUCK_SLOW_CUTOFF:
                for _ in range(runs):
                    samples.append(duck_run_with_timeout(sql, duck_timeout))
        except Exception as exc:
            msg = f"duckdb error: {exc}"[:200]
            if "INTERRUPT" in str(exc).upper():
                msg = f"duckdb oracle exceeded {duck_timeout:.0f}s (interrupted)"
            row["ratio_skip_reason"] = msg
            dump()
            print(f"duckdb {n}: SKIP {msg}", file=sys.stderr, flush=True)
            continue
        row["duckdb_runs"] = [round(s, 3) for s in samples]
        row["duckdb_median"] = med(samples)
        row["ratio_median"] = (
            round(row["spark_median"] / row["duckdb_median"], 2)
            if row["duckdb_median"]
            else None
        )
        dump()
        print(f"duckdb {n}: {row['duckdb_runs']}", file=sys.stderr, flush=True)

    dump()
    ratios = {
        n: r.get("ratio_median") for n, r in per.items() if "ratio_median" in r
    }
    print(json.dumps({"n": len(per), "ratios": ratios}))


if __name__ == "__main__":
    main()
