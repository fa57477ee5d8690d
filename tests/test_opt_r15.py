"""Round-15 optimization guards.

Covers the r15 harness-contract work (VERDICT r14 #1) and the ADVICE r14
follow-up on the quantize storage op's plan shape.
"""
import os
import re

import pytest

from data_iceberg_sandbox_spark.session import get_spark_session, resolve_master


@pytest.fixture(scope="session")
def spark():
    s = get_spark_session(
        app_name="tests-r15",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield s


def test_resolve_master_honors_cpus_env(monkeypatch):
    """The CPU-scaling contract (VERDICT r14 #1): the master string a new
    session would use must follow $SPARK_GRAFT_CPUS. Pure-function test —
    getOrCreate on a live session silently ignores a new master, so this
    is the only way the suite can assert the contract without forking."""
    monkeypatch.delenv("SPARK_GRAFT_MASTER", raising=False)
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "7")
    assert resolve_master() == "local[7]"
    # explicit arg wins over env
    assert resolve_master("local[2]") == "local[2]"
    # explicit master env wins over the cpus-derived default
    monkeypatch.setenv("SPARK_GRAFT_MASTER", "local[3]")
    assert resolve_master() == "local[3]"


def test_shj_if_medium_hints_only_the_middle_band(spark, tmp_path):
    """r15 VERDICT #6 class: `_shj_if_medium` must hint SHUFFLE_HASH
    ONLY when the bounding table sits between the broadcast cap and the
    per-build-partition bound — below it the frame stays UNHINTED (the
    full ladder's broadcast tier measured worse at headline scale:
    plans/r15/ab_q7_ladder.json), above it unhinted too (memory-unsafe:
    plans/r15/ab_q10q12_shj_rejected.json), and a missing table fails
    closed."""
    from data_iceberg_sandbox_spark.operators.tpch import _shj_if_medium

    df = spark.range(10)

    def analyzed(d):
        return d._jdf.queryExecution().analyzed().toString()

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        small = tmp_path / "sf_small"
        os.makedirs(small)
        (small / "orders.parquet").write_bytes(b"x" * 100)
        assert _shj_if_medium(df, str(small), "orders") is df
        mid = tmp_path / "sf_mid"
        os.makedirs(mid)
        with open(mid / "orders.parquet", "wb") as f:
            f.truncate(513 * 1024 * 1024)
        hinted = _shj_if_medium(df, str(mid), "orders")
        assert hinted is not df
        assert "SHUFFLE_HASH" in analyzed(hinted).upper()
        big = tmp_path / "sf_big"
        os.makedirs(big)
        with open(big / "orders.parquet", "wb") as f:
            f.truncate((64 << 20) * 32 + 1)
        assert _shj_if_medium(df, str(big), "orders") is df
        assert _shj_if_medium(df, str(tmp_path / "nope"), "orders") is df
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_word_shingles_binds_words_once(spark):
    """VERDICT r14 "what's wrong" #6: word_shingles re-evaluated the
    split expression per shingle index (O(words²) — array HOFs have no
    CSE across the lambda boundary). The r15 fix binds the words array
    as a lambda variable via a one-element-array transform. Guard both
    the semantics (old-form equivalence incl. short/empty/NULL docs and
    the full-text-single-shingle case) and the plan shape (one split —
    the variable binding — instead of one per HOF argument)."""
    from pyspark.sql import functions as F

    from data_iceberg_sandbox_spark.functions.text import (
        word_shingles,
        words,
    )

    def old_shingles(text, n=5):
        w = words(text)
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(w) - (n - 1), F.lit(1))
        )
        return F.transform(
            starts, lambda i: F.array_join(F.slice(w, i, n), " ")
        )

    rows = [
        ("a b c d e f g h",),
        ("one two",),
        ("",),
        (None,),
        ("exactly five words right here",),
    ]
    df = spark.createDataFrame(rows, ["t"])
    old = df.select(old_shingles(F.col("t")).alias("s")).collect()
    new = df.select(word_shingles(F.col("t")).alias("s")).collect()
    assert new == old
    plan = (
        df.select(word_shingles(F.col("t")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("split(") == 1


def test_quantize_storage_op_scale_stays_a_materialized_column(spark):
    """ADVICE r14: the r14 plan guard covered only
    embedding_quantize_int8_check; the storage op builds its own lambda
    and could regress to the inlined-scale O(d²) form without tripping
    that test if it ever stopped sharing `_quantize_base`. Same
    assertions on the storage op's plan: one array_max (the scale
    subtree evaluated once), and the quantize lambda divides by the
    materialized `_s` attribute, never by the scale expression tree."""
    from data_iceberg_sandbox_spark.operators.similarity import (
        embedding_quantize_int8,
    )

    df = embedding_quantize_int8(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("array_max") == 1
    q_lambda = re.search(r"round\(\(lambda [^)]*\)", plan)
    assert q_lambda and "_s#" in q_lambda.group(0), q_lambda
