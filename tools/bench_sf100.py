"""Scale datapoint at sf100 (r14): does the sf10 story hold at 10x?

Protocol differs from the pinned medians tools ON PURPOSE and is
labeled: at ~18 GB the balanced in-memory pin no longer reflects a
sane single-box deployment (the cache alone would dominate the heap),
so BOTH engines read the same parquet through the OS page cache —
the cold-ish cluster shape. AQE stays ON (the cluster default; at this
volume its skew/sizing decisions are part of the system under test),
maxPartitionBytes=128m so the ~12 GB lineitem scans as ~90 tasks on 32
cores. The size-gated broadcast class (_bcast_if_small) gets its first
genuinely-oversized exercise here: sf100 customer/supplier are far past
the gate, so the hint must vanish and the joins must plan as SMJ.

Each engine: one untimed warm pass (page cache + JIT), then RUNS timed
runs; medians + full run arrays recorded. DuckDB oracles run under a
watchdog (DUCK_TIMEOUT, default 600 s) — an intractable single-node
oracle is recorded as such, never a hung capture.

Usage: python tools/bench_sf100.py out.json name1 name2 ...
Env: SF_DIR (default .scratch/sf100), RUNS (default 5).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SF_DIR", ".scratch/sf100")
    runs = int(os.environ.get("RUNS", "5"))

    from data_iceberg_sandbox_spark.session import get_spark_session
    from data_iceberg_sandbox_spark.sources.registry import TABLES

    import __spark_entry__ as entry_mod

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    missing = [n for n in names if n not in queries]
    if missing:
        raise SystemExit(f"names not in the registry: {missing}")

    # 32g, NOT bigger (r14): an 80g heap produced seconds-long G1 pauses
    # that swamped the sf10 runs (q3 run array [4.3, 5.9, 23.5] at 80g vs
    # [1.7, 1.9, 1.8] at 32g, same protocol) and competed with the page
    # cache the scan protocol depends on. Shuffles past 32g spill — the
    # cluster-realistic behavior this protocol is meant to exercise.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark_session(
        app_name="bench_sf100",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "128m",
            "spark.sql.adaptive.enabled": "true",
        },
    )

    def run_once(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    per: dict[str, dict] = {}

    def dump() -> None:
        med_tot = sum(
            v["spark_median"] for v in per.values() if "spark_median" in v
        )
        payload = {
            "note": (
                "sf100 scale datapoint, SCAN protocol (no pin, AQE on, "
                "128m splits) on BOTH engines through the OS page cache "
                "— see module docstring; separate session/protocol from "
                "every BENCH_SF_MEDIANS* file, do not merge absolutes."
            ),
            "sf_dir": sf_dir,
            "runs": runs,
            "suite_spark_median_total": round(med_tot, 2),
            "per_query": per,
        }
        with open(out_path, "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=1)

    spark_timeout = float(os.environ.get("QUERY_TIMEOUT", "900"))
    for n in names:
        row: dict = {}
        res: dict = {}
        err: list = []

        def work(n=n, res=res, err=err) -> None:
            try:
                t0 = time.perf_counter()
                df = queries[n](spark, sf_dir)
                res["build_sec"] = round(time.perf_counter() - t0, 3)
                # two warm passes: the first pays page cache + shuffle
                # setup, the second JIT — with only one, ObjectAgg-heavy
                # plans (agg_stats) still showed a multi-run settle tail
                res["warm_sec"] = round(run_once(df), 3)
                res["warm2_sec"] = round(run_once(df), 3)
                res["spark_runs"] = [round(run_once(df), 3) for _ in range(runs)]
                res["spark_median"] = round(
                    statistics.median(res["spark_runs"]), 3
                )
                # min alongside median: this box shows episodic
                # multi-second interference windows (63.9 s q1 run on a
                # verified-idle box, GC-bean delta 0.4 s, THP/steal
                # ruled out) that can corrupt 3 of 5 runs; the min of a
                # published run array is the interference-robust
                # capability statistic. Judge both against the arrays.
                res["spark_min"] = min(res["spark_runs"])
            except Exception as exc:  # noqa: BLE001 — published per row
                err.append(f"{type(exc).__name__}: {exc}"[:300])

        w = threading.Thread(target=work, daemon=True)
        w.start()
        w.join(spark_timeout)
        if w.is_alive():
            row["error"] = f"spark side exceeded {spark_timeout:.0f}s (killed)"
            try:
                spark.sparkContext.cancelAllJobs()
            except Exception:  # noqa: BLE001 — best-effort teardown
                pass
            w.join(30)
        elif err:
            row["error"] = err[0]
        else:
            row.update(res)
        per[n] = row
        dump()
        print(f"spark {n}: {row}", file=sys.stderr, flush=True)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_timeout = float(os.environ.get("DUCK_TIMEOUT", "600"))

    def duck_once(sql: str) -> float:
        done = threading.Event()

        def watchdog() -> None:
            if not done.wait(duck_timeout):
                con.interrupt()

        t = threading.Thread(target=watchdog, daemon=True)
        t.start()
        t0 = time.perf_counter()
        try:
            con.execute(sql).fetchall()
        finally:
            done.set()
        return time.perf_counter() - t0

    for n in names:
        row = per[n]
        if "error" in row:
            continue
        sql = oracles.get(n)
        if not sql:
            row["ratio_skip_reason"] = "no SQL oracle"
            dump()
            continue
        try:
            row["duckdb_warm_sec"] = round(duck_once(sql), 3)
            row["duckdb_runs"] = [round(duck_once(sql), 3) for _ in range(runs)]
            row["duckdb_median"] = round(
                statistics.median(row["duckdb_runs"]), 3
            )
            row["duckdb_min"] = min(row["duckdb_runs"])
            row["ratio_median"] = (
                round(row["spark_median"] / row["duckdb_median"], 2)
                if row["duckdb_median"]
                else None
            )
            row["ratio_min"] = (
                round(row["spark_min"] / row["duckdb_min"], 2)
                if row.get("spark_min") and row["duckdb_min"]
                else None
            )
        except Exception as exc:  # noqa: BLE001 — published per row
            msg = f"duckdb error: {exc}"[:200]
            if "INTERRUPT" in str(exc).upper():
                msg = f"duckdb oracle exceeded {duck_timeout:.0f}s (interrupted)"
            row["ratio_skip_reason"] = msg
        dump()
        print(f"duckdb {n}: {row.get('duckdb_runs', row.get('ratio_skip_reason'))}",
              file=sys.stderr, flush=True)

    print(json.dumps({n: per[n].get("ratio_median") for n in names}))


if __name__ == "__main__":
    main()
