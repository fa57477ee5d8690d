"""Chunked wrapper for bench_sf_medians: one FRESH JVM per chunk.

Why: the single-session capture accumulates heap/codegen/GC pressure
across its ~100 queries × 6 runs — measured r10, mid-suite queries ran
2-4× slower than the same queries in a small session (q1 spread
0.77-5.0 s within one 5-run set; corr 2.1 s clean vs 6-10 s
mid-session), which overstates per-query ratios without changing the
plans at all. Running ~a dozen queries per subprocess keeps every
measurement near the clean-session number while the protocol inside
each chunk (balanced keyed pin, warm pass, N runs, DuckDB same-process
on the byte-identical SQL) is unchanged. The merged file records the
chunking so absolute numbers are read per-session, as always.

Usage: python tools/bench_sf_medians_chunked.py [sf_dir] [runs] [out.json] [chunk_size]
Defaults: .scratch/sf10, 5, BENCH_SF_MEDIANS.json, 12.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scratch/sf10"
    runs = sys.argv[2] if len(sys.argv) > 2 else "5"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_SF_MEDIANS.json"
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    import tools.bench_sf_medians as med_mod

    total = len(med_mod.QUERIES)
    per_query: dict[str, dict] = {}
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_sf_medians.py")
    n_chunks = 0
    for i in range(0, total, chunk):
        j = min(i + chunk, total)
        n_chunks += 1
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            part = tf.name
        print(f"--- chunk {i}:{j} ---", file=sys.stderr, flush=True)
        try:
            subprocess.run(
                [sys.executable, tool, sf_dir, runs, part, f"{i}:{j}"],
                check=True,
            )
            with open(part) as fh:
                data = json.load(fh)
        except BaseException:
            # Dump what earlier chunks already captured before re-raising
            # (ADVICE r10: a failing chunk used to discard the whole merge
            # AND leak its temp file).
            if per_query:
                with open(out_path + ".partial", "w") as fh:
                    json.dump({"per_query": per_query}, fh, indent=1)
                print(f"partial merge saved to {out_path}.partial",
                      file=sys.stderr)
            raise
        finally:
            try:
                os.unlink(part)
            except OSError:
                pass
        for name, row in data["per_query"].items():
            row["chunk"] = n_chunks
            per_query[name] = row

    ratios = [
        r["ratio_median"] for r in per_query.values() if r.get("ratio_median")
    ]
    # matched subset (r14 sweep — see bench_sf_medians.py: the full spark
    # total over the duckdb subset total was a mixed-denominator ratio)
    matched_spark = round(
        sum(
            v["spark_median"]
            for v in per_query.values()
            if "duckdb_median" in v
        ),
        2,
    )
    payload = {
        "note": f"captured in {n_chunks} fresh JVM sessions of ≤{chunk} "
        "queries each (see module docstring: single-session heap pressure "
        "inflated mid-suite queries 2-4×); protocol inside each chunk is "
        "identical to the single-session tool",
        "sf_dir": sf_dir,
        "runs": int(runs),
        "suite_spark_median_total": round(
            sum(v["spark_median"] for v in per_query.values()), 2
        ),
        "suite_spark_median_total_matched": matched_spark,
        "suite_duckdb_median_total": round(
            sum(v.get("duckdb_median", 0) for v in per_query.values()), 2
        ),
        "ratio_of_totals": None,
        # all-DuckDB-error chunks leave no ratios: emit nulls, never
        # discard the captured per-query data (ADVICE r10)
        "per_query_ratio_median": (
            round(statistics.median(ratios), 2) if ratios else None
        ),
        "per_query_ratio_geomean": (
            round(math.exp(sum(math.log(r) for r in ratios) / len(ratios)), 2)
            if ratios
            else None
        ),
        "per_query": per_query,
    }
    if payload["suite_duckdb_median_total"]:
        payload["ratio_of_totals"] = round(
            matched_spark / payload["suite_duckdb_median_total"], 2
        )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
    print(json.dumps({k: v for k, v in payload.items() if k != "per_query"}))


if __name__ == "__main__":
    main()
