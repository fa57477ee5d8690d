"""bench.py contract (VERDICT r4 item 2): the driver's only perf signal
is one JSON line on stdout — a broken query must degrade to an `errors`
entry, never abort the suite (round 4 lost its entire bench signal to a
single erroring query). Runs the real script in a subprocess on a
two-query subset at the smallest SF."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_full_json_despite_broken_query():
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_QUERIES": "dedup_exact,w_rank_topk",
        # CPU-scaling contract (r15, VERDICT r14 #1): a non-default core
        # count must show up in the payload's resolved master/sizing
        "SPARK_GRAFT_CPUS": "6",
    }
    env.pop("SPARK_GRAFT_MASTER", None)
    env.pop("SPARK_GRAFT_SHUFFLE_PARTITIONS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--self-test-broken"],
        env=env,
        capture_output=True,
        text=True,
        timeout=480,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    d = json.loads(line)
    assert d["errors"] == {
        "__broken__": "RuntimeError: bench self-test: deliberately broken query"
    }
    assert set(d["queries"]) == {"dedup_exact", "w_rank_topk"}
    assert all(v > 0 for v in d["queries"].values())
    assert d["value"] > 0 and d["unit"] == "sec"
    assert d["floor_sec_per_action"] > 0
    assert d["total_jobs"] >= 2
    # medians protocol (VERDICT r13 #3): run arrays recorded, headline
    # value = sum of per-query medians, spread band brackets it
    n_runs = d["runs_per_query_count"]
    assert n_runs >= 3
    for q, runs in d["query_runs"].items():
        assert len(runs) == n_runs
        s = sorted(runs)
        med = s[n_runs // 2] if n_runs % 2 else (s[n_runs // 2 - 1] + s[n_runs // 2]) / 2
        assert abs(d["queries"][q] - med) < 1e-3
        assert d["queries_best"][q] == min(runs)
    lo, hi = d["suite_spread_sec"]
    assert lo <= d["value"] <= hi + 1e-6
    assert abs(d["value_best_of_runs"] - lo) < 1e-3
    # CPU-scaling contract + protocol version (r15, VERDICT r14 #1/#9):
    # the payload carries the RUNTIME master/parallelism so the driver's
    # lower-core-count run can verify $SPARK_GRAFT_CPUS is honored, and
    # the statistic is versioned so PERF never again compares
    # best-of-3 against median-of-5
    assert d["protocol_version"] == 2
    assert d["master"] == "local[6]"
    assert d["default_parallelism"] == 6
    assert 2 <= d["shuffle_partitions"] <= 6
    assert d["pin_slice_cap"] == 6
