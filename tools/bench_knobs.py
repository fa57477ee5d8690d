"""Controlled knob experiment on the scan-agg residual (VERDICT r7 item 4).

q1/q3/q5/q16 sit at 4-5x DuckDB at sf10 with clean plans; the named
residual is exchange + partial-agg row decode over the CACHED base
tables (bench protocol pins tables with .cache(), so parquet-scan knobs
like maxPartitionBytes are irrelevant to the hot path — measured anyway
in one config to prove it). This sweeps the knobs that act on that
path, one fresh JVM per config because most are static core confs:

  - spark.sql.inMemoryColumnarStorage.compressed (decompress-per-scan)
  - spark.sql.inMemoryColumnarStorage.batchSize (vectorization width)
  - spark.io.compression.codec lz4 vs zstd (shuffle block codec)
  - spark.shuffle.compress off (local-disk shuffle: compression is pure
    CPU; on a real cluster keep it on — network-bound)
  - spark.sql.shuffle.partitions 8 vs 32 (tiny agg outputs)
  - off-heap column vectors + execution memory

Usage:
  python tools/bench_knobs.py sweep [sf_dir] [runs]   # all configs
  python tools/bench_knobs.py one <name> <conf_json> [sf_dir] [runs]

Writes docs/BENCH_KNOBS.json (sweep mode) with per-config medians and
the delta vs baseline; applied to session.py only if >=20% on a
headline query (the verdict's bar), else recorded as saturation.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q16_supplier_part_counts",
]

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},
    "cache_uncompressed": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
    },
    "cache_batch64k": {
        "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
    },
    "cache_uncomp_batch64k": {
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
        "spark.sql.inMemoryColumnarStorage.batchSize": "65536",
    },
    "shuffle_zstd": {
        "spark.io.compression.codec": "zstd",
    },
    "shuffle_nocompress": {
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
    },
    "shuffle_parts8": {
        "_shuffle_partitions": "8",
    },
    "offheap_vectors": {
        "spark.memory.offHeap.enabled": "true",
        "spark.memory.offHeap.size": "8g",
        "spark.sql.columnVector.offheap.enabled": "true",
    },
    # control: proves parquet-side knobs don't touch the cached hot path
    "parquet_1g_parts": {
        "spark.sql.files.maxPartitionBytes": "1073741824",
    },
}


def run_one(name: str, conf: dict[str, str], sf_dir: str, runs: int) -> None:
    from data_iceberg_sandbox_spark.session import get_spark_session
    from data_iceberg_sandbox_spark.sources.registry import TABLES, load_table

    import __spark_entry__ as entry_mod

    conf = dict(conf)
    shuffle_parts = int(conf.pop("_shuffle_partitions", 0)) or int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    conf.setdefault("spark.sql.adaptive.enabled", "false")
    spark = get_spark_session(
        app_name=f"bench_knobs_{name}",
        shuffle_partitions=shuffle_parts,
        extra_conf=conf,
    )
    pinned = []
    for t in TABLES:
        try:
            df = load_table(spark, sf_dir, t).cache()
            df.count()
            pinned.append(df)
        except Exception:
            pass

    queries = entry_mod.queries()
    out: dict[str, dict] = {}
    for qn in QUERIES:
        df = queries[qn](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[qn] = {
            "median": round(statistics.median(samples), 3),
            "min": min(samples),
            "runs": samples,
        }
        print(f"  {name}/{qn}: {samples}", file=sys.stderr, flush=True)
    print(json.dumps({"config": name, "conf": conf, "queries": out}))


def sweep(sf_dir: str, runs: int) -> None:
    results: dict[str, dict] = {}
    for name, conf in CONFIGS.items():
        print(f"== config {name} ==", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "one",
                name,
                json.dumps(conf),
                sf_dir,
                str(runs),
            ],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        line = [
            ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
        ]
        if proc.returncode != 0 or not line:
            print(proc.stderr[-2000:], file=sys.stderr)
            results[name] = {"error": proc.returncode}
            continue
        results[name] = json.loads(line[-1])

    base = results.get("baseline", {}).get("queries", {})
    table = {}
    for name, r in results.items():
        if "queries" not in r:
            continue
        row = {}
        for qn, v in r["queries"].items():
            b = base.get(qn, {}).get("median")
            row[qn] = {
                "median": v["median"],
                "delta_vs_baseline_pct": round(100 * (v["median"] / b - 1), 1)
                if b
                else None,
            }
        table[name] = row
    payload = {
        "sf_dir": sf_dir,
        "runs": runs,
        "queries": QUERIES,
        "configs": {n: CONFIGS[n] for n in results},
        "results": results,
        "delta_table": table,
    }
    out_path = os.path.join(REPO, "docs", "BENCH_KNOBS.json")
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({"wrote": out_path, "delta_table": table}, indent=1))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    if mode == "one":
        run_one(
            sys.argv[2],
            json.loads(sys.argv[3]),
            sys.argv[4] if len(sys.argv) > 4 else ".scratch/sf10",
            int(sys.argv[5]) if len(sys.argv) > 5 else 5,
        )
    else:
        sweep(
            sys.argv[2] if len(sys.argv) > 2 else ".scratch/sf10",
            int(sys.argv[3]) if len(sys.argv) > 3 else 5,
        )
