"""Supplemental medians capture for queries added AFTER a committed
full capture — same protocol as tools/bench_sf_medians.py (cached base
tables, warm pass, N runs, both engines in ONE session), written to a
SEPARATE labeled file so absolute numbers from different box states are
never mixed in one table (the round-8 honesty rule).

Usage: python tools/bench_medians_subset.py out.json name1 name2 ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SF_DIR", ".scratch/sf10")
    runs = int(os.environ.get("RUNS", "5"))

    from data_iceberg_sandbox_spark.session import get_spark_session
    from data_iceberg_sandbox_spark.sources.registry import TABLES, pin_balanced

    import __spark_entry__ as entry_mod

    queries, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "80g")
    spark = get_spark_session(
        app_name="bench_medians_subset",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    # Balanced pin (see registry.pin_balanced): row-group-bound scan
    # parallelism made the r9 subset captures run document/embedding
    # queries ≤5-way; same fix as the full-capture tool.
    pinned = pin_balanced(spark, sf_dir)

    def run_once(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    spark_times = {}
    for n in names:
        df = queries[n](spark, sf_dir)
        run_once(df)
        spark_times[n] = [round(run_once(df), 3) for _ in range(runs)]
        print(f"spark {n}: {spark_times[n]}", file=sys.stderr, flush=True)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    duck_times = {}
    for n in names:
        sql = oracles.get(n)
        if not sql:
            continue
        con.execute(sql).fetchall()
        duck_times[n] = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            duck_times[n].append(round(time.perf_counter() - t0, 3))
        print(f"duckdb {n}: {duck_times[n]}", file=sys.stderr, flush=True)

    med = lambda xs: round(statistics.median(xs), 3)  # noqa: E731
    per = {}
    for n in names:
        row = {"spark_median": med(spark_times[n]), "spark_runs": spark_times[n]}
        if n in duck_times:
            row["duckdb_median"] = med(duck_times[n])
            row["duckdb_runs"] = duck_times[n]
            row["ratio_median"] = round(
                row["spark_median"] / row["duckdb_median"], 2
            ) if row["duckdb_median"] else None
        per[n] = row
    payload = {
        "note": "supplemental capture; separate session/box-state from "
        "BENCH_SF_MEDIANS.json — do not merge absolutes across files",
        "sf_dir": sf_dir,
        "runs": runs,
        "per_query": per,
    }
    with open(out_path, "w", encoding="utf-8") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({k: v.get("ratio_median") for k, v in per.items()}))


if __name__ == "__main__":
    main()
