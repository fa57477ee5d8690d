"""r14 adversarial-sweep regressions (VERDICT r13 #8: the harness/tools/
bench protocol was the last unswept surface)."""

from __future__ import annotations

import json

import duckdb
import pandas as pd
import pytest


def test_driver_history_survives_malformed_correctness_file(monkeypatch, tmp_path):
    """A CORRECTNESS_r*.json holding a JSON list (truncated round /
    error payload) used to raise AttributeError out of queries() —
    the driver then lost the ENTIRE surface to one bad history file."""
    import __spark_entry__ as entry_mod

    good = tmp_path / "CORRECTNESS_r01.json"
    good.write_text(json.dumps({
        "q_ok": {"rows_match": True, "schema_match": True, "hash_match": True}
    }))
    bad = tmp_path / "CORRECTNESS_r02.json"
    bad.write_text(json.dumps(["not", "a", "dict"]))

    import glob as glob_mod

    monkeypatch.setattr(
        glob_mod, "glob", lambda pat: [str(good), str(bad)]
    )
    last_green, seen = entry_mod._driver_history()
    assert last_green == {"q_ok": 1}
    assert seen == {"q_ok"}


def test_canon_pairing_is_permutation_invariant():
    """The harness sorts both frames by stringified values before the
    cell-wise compare; a permuted frame with duplicate rows and float
    columns must compare equal to itself (deterministic pairing)."""
    from tests.oracle_harness import compare

    class FakeSparkDF:
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    pdf = pd.DataFrame(
        {"k": [1, 1, 2, 2, 3], "v": [10.0, 10.0, 9.5, -0.5, float("nan")]}
    )
    con = duckdb.connect()
    con.register("t", pdf.sample(frac=1.0, random_state=7))
    compare(FakeSparkDF(pdf), con, "SELECT k, v FROM t", "perm_invariance")


def test_canon_mismatch_still_fails():
    from tests.oracle_harness import compare

    class FakeSparkDF:
        def __init__(self, pdf):
            self._pdf = pdf

        def toPandas(self):
            return self._pdf

    pdf = pd.DataFrame({"k": [1, 2], "v": [10.0, 9.5]})
    con = duckdb.connect()
    con.register("t", pdf)
    with pytest.raises(AssertionError):
        compare(
            FakeSparkDF(pd.DataFrame({"k": [1, 2], "v": [10.0, 9.6]})),
            con,
            "SELECT k, v FROM t",
            "mismatch",
        )
