"""Interleaved A/B timing for two plan variants of one query — the
measurement protocol for a box with episodic multi-second interference
(ROUND14_NOTES "Benchmarking-protocol findings"): variants alternate
A,B,A,B,… in ONE session so interference windows hit both arms, and the
MIN over reps is reported beside the median as the interference-robust
capability statistic.

Usage: python tools/ab_interleaved.py out.json <variants_module> [reps]
  <variants_module> is a python file defining VARIANTS: dict[str, fn]
  where fn(spark, sf_dir) -> DataFrame.
Env: SF_DIR (default .scratch/sf10), REPS (default 7).
"""

from __future__ import annotations

import importlib.util
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path, mod_path = sys.argv[1], sys.argv[2]
    reps = int(os.environ.get("REPS", sys.argv[3] if len(sys.argv) > 3 else 7))
    sf_dir = os.environ.get("SF_DIR", ".scratch/sf10")

    spec = importlib.util.spec_from_file_location("ab_variants", mod_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    variants = mod.VARIANTS

    from data_iceberg_sandbox_spark.session import get_spark_session
    from data_iceberg_sandbox_spark.sources.registry import pin_balanced

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_spark_session(
        app_name="ab_interleaved",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    pin_balanced(spark, sf_dir)

    dfs = {name: fn(spark, sf_dir) for name, fn in variants.items()}
    for name, df in dfs.items():  # warm both plans (JIT/codegen)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        df.write.format("noop").mode("overwrite").save()

    runs: dict[str, list[float]] = {name: [] for name in dfs}
    for rep in range(reps):
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"rep{rep}:{name}")
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs[name].append(round(dt, 3))
            print(f"rep{rep} {name}: {dt:.3f}", flush=True)

    payload = {
        "sf_dir": sf_dir,
        "reps": reps,
        "protocol": "interleaved same-session; min is interference-robust",
        "variants": {
            name: {
                "runs": rs,
                "min": min(rs),
                "median": round(statistics.median(rs), 3),
            }
            for name, rs in runs.items()
        },
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps(payload["variants"], indent=1))


if __name__ == "__main__":
    main()
