"""r13 (VERDICT #1): every data-scaled broadcast hint must be
size-gated — an oversized dim table drops the hint so AQE can pick a
shuffle join instead of blowing driver/broadcast capacity at SF100+.
Bounded dims (nation/region folds) stay hinted."""

from __future__ import annotations

import os

import pytest

import data_iceberg_sandbox_spark.operators.tpch as tpch_mod
from data_iceberg_sandbox_spark.operators.tpch import _bcast_if_small, _dir_bytes

SF = "/root/testdata/sf0.001"


def _analyzed(df):
    return df._jdf.queryExecution().analyzed().toString()


def test_gate_unit_small_applies_and_oversized_declines(spark, tmp_path):
    df = spark.range(10)
    # small table: hint applied
    small = tmp_path / "sf_small"
    os.makedirs(small)
    (small / "customer.parquet").write_bytes(b"x" * 100)
    hinted = _bcast_if_small(df, str(small), "customer")
    assert hinted is not df and "Hint" in _analyzed(hinted)
    # past the broadcast cap but under the per-partition build bound
    # (sparse file — no real disk): the r14 middle tier hints
    # SHUFFLE_HASH instead of dropping to an unhinted sort-merge. The
    # bound scales with shuffle_partitions (the test session's 8 would
    # leave no band between the two caps — itself correct: a tiny
    # session shouldn't hash-build a >512 MB dim), so pin a
    # cluster-like 32 for the tier assertions.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        mid = tmp_path / "sf_mid"
        os.makedirs(mid)
        with open(mid / "customer.parquet", "wb") as f:
            f.truncate(513 * 1024 * 1024)
        assert _dir_bytes(str(mid), "customer") > 512 << 20
        mid_hinted = _bcast_if_small(df, str(mid), "customer")
        assert mid_hinted is not df
        assert "SHUFFLE_HASH" in _analyzed(mid_hinted).upper()
        # past BOTH caps: unhinted (AQE/SMJ)
        big = tmp_path / "sf_big"
        os.makedirs(big)
        with open(big / "customer.parquet", "wb") as f:
            f.truncate((64 << 20) * 32 + 1)
        assert _bcast_if_small(df, str(big), "customer") is df
        # missing table: fail closed, no hint of any tier
        assert _bcast_if_small(df, str(tmp_path / "nope"), "customer") is df
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize(
    "qname",
    [
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier",
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
    ],
)
def test_oversized_dims_drop_all_data_scaled_hints(spark, qname, monkeypatch):
    """With every table reported oversized, the analyzed plans of the
    flagged TPC-H queries must carry NO broadcast hint on the
    data-scaled dims. Bounded literal folds (_inline_nations maps) are
    not hint nodes, so the check is simply: zero hints — except q9,
    whose 25-row nation join legitimately keeps its hint."""
    import __spark_entry__ as m

    q = m.queries()
    fn = getattr(q[qname], "__wrapped__", q[qname])  # bypass the plan memo
    monkeypatch.setattr(tpch_mod, "_dir_bytes", lambda sf, n: float("inf"))
    plan = _analyzed(fn(spark, SF))
    allowed = 1 if qname == "tpch_q9_product_profit" else 0
    got = plan.count("ResolvedHint")
    assert got <= allowed, f"{qname}: {got} hints survive oversized gate\n{plan}"


def test_normal_size_keeps_hints(spark):
    """At testdata scale the hints all apply — the gate must not
    regress the small-SF plans the bench measures."""
    import __spark_entry__ as m

    q = m.queries()
    fn = getattr(q["tpch_q5_local_supplier"], "__wrapped__", q["tpch_q5_local_supplier"])
    plan = _analyzed(fn(spark, SF))
    assert plan.count("ResolvedHint") == 2  # supplier + customer
