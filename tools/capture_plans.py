"""Capture `.explain("formatted")` output for named queries into text
files (the r14 optimization deliverable: plans/r14/<query>_{before,after}.txt).

Usage:
  python tools/capture_plans.py <out_dir> <suffix> <query1> [query2 ...]
  python tools/capture_plans.py plans/r14 after tpch_q3_shipping_priority ...

Runs against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) with the
same session sizing bench.py uses, so the captured plan is the plan the
bench times. Plan construction only — nothing is executed beyond the
small collects some plan builders do (dim folds, size probes).

SPARK_GRAFT_FORCE_DIR_BYTES=<n>: monkeypatch the join ladder's
`_dir_bytes` probe to report <n> for EVERY data-scaled dim — the
tier-demo mode used to show the >512 MB SHUFFLE_HASH band (and the
past-both-caps unhinted band) in a committed plan without generating a
multi-hundred-GB dataset; the capture header records the override.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_iceberg_sandbox_spark.plans.inspect import formatted_plan  # noqa: E402
from data_iceberg_sandbox_spark.session import get_spark_session  # noqa: E402


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"not in the registry: {unknown}")

    forced = os.environ.get("SPARK_GRAFT_FORCE_DIR_BYTES")
    if forced:
        import data_iceberg_sandbox_spark.operators.tpch as tpch_mod

        tpch_mod._dir_bytes = lambda sf, n, _v=float(forced): _v
    pin = os.environ.get("SPARK_GRAFT_CAPTURE_PIN")

    spark = get_spark_session(
        app_name="capture_plans",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
        ),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"
            ),
            "spark.sql.adaptive.enabled": os.environ.get(
                "SPARK_GRAFT_AQE", "false"
            ),
        },
    )
    if pin:
        # reproduce the bench/A-B session exactly: pinned base tables
        # change scan statistics, which changes join strategy choices
        # (SPARK_GRAFT_CAPTURE_PIN=1)
        from data_iceberg_sandbox_spark.sources.registry import pin_balanced

        pin_balanced(spark, sf_dir)

    for n in names:
        df = queries[n](spark, sf_dir)
        text = formatted_plan(df)
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            hdr = f"== {n} ({suffix}) sf_dir={sf_dir}"
            if forced:
                hdr += f" [tier demo: _dir_bytes forced to {forced}]"
            if pin:
                hdr += " [pinned base tables, the bench session shape]"
            fh.write(hdr + " ==\n")
            fh.write(text)
            if not text.endswith("\n"):
                fh.write("\n")
        print(f"{path}: {len(text.splitlines())} plan lines", flush=True)


if __name__ == "__main__":
    main()
