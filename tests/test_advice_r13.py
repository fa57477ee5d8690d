"""r13 ADVICE regression tests: cube NULL/empty domains, fraud
threshold quantization on the oracle's decimal grid, and
keep-on-unknown liveness in the scan-layer memo eviction."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F

from data_iceberg_sandbox_spark.sources.registry import (
    evict_stopped_sessions,
    pin_table,
)


def _native_cube(li):
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sq"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "n",
            F.col("sq").cast("double").alias("sum_qty"),
        )
    )


def _multiset(df):
    rows = [
        (r["l_returnflag"], r["l_linestatus"], r["n"], r["sum_qty"])
        for r in df.collect()
    ]
    return sorted(rows, key=lambda t: tuple(("", x) if x is None else ("v", x) for x in t))


def test_cube_counts_null_domain_matches_native(spark, tmp_path):
    """Genuine NULL grouping values must survive the one-shuffle rewrite
    as their own groups — output multiset equals native .cube."""
    from data_iceberg_sandbox_spark.operators.advanced import cube_counts

    sf_fake = str(tmp_path / "sf_cube_null")
    os.makedirs(sf_fake, exist_ok=True)
    li = spark.createDataFrame(
        [
            Row(l_returnflag="A", l_linestatus="F", l_quantity=1.0),
            Row(l_returnflag="A", l_linestatus=None, l_quantity=2.0),
            Row(l_returnflag=None, l_linestatus="F", l_quantity=4.0),
            Row(l_returnflag=None, l_linestatus=None, l_quantity=8.0),
            Row(l_returnflag="R", l_linestatus="O", l_quantity=16.0),
        ],
        "l_returnflag string, l_linestatus string, l_quantity double",
    )
    pin_table(spark, sf_fake, "lineitem", li)
    assert _multiset(cube_counts(spark, sf_fake)) == _multiset(_native_cube(li))


def test_cube_counts_empty_input_matches_native(spark, tmp_path):
    """Empty input → one grand-total row with n=0, the SQL-standard /
    DuckDB-oracle shape, not (NULL, NULL, NULL, NULL). (Spark's native
    .cube returns ZERO rows on empty input — a known divergence from
    the standard; the oracle is the gate, so we match DuckDB.)"""
    from data_iceberg_sandbox_spark.operators.advanced import cube_counts

    sf_fake = str(tmp_path / "sf_cube_empty")
    os.makedirs(sf_fake, exist_ok=True)
    li = spark.createDataFrame(
        [], "l_returnflag string, l_linestatus string, l_quantity double"
    )
    pin_table(spark, sf_fake, "lineitem", li)
    got = cube_counts(spark, sf_fake).collect()
    assert len(got) == 1
    r = got[0]
    assert (
        r["l_returnflag"] is None
        and r["l_linestatus"] is None
        and r["n"] == 0
        and r["sum_qty"] is None
    )


def test_fraud_threshold_grid_aligned_decimal(spark, tmp_path):
    """thr quantization must floor the DECIMAL rendering, not the float
    product: at threshold=0.0003 (float*1e4 = 2.9999…) a group summing
    exactly 0.0003 must be EXCLUDED (strict >), matching the oracle's
    `> 0.0003` decimal literal; 0.0004 must be included."""
    from datetime import datetime

    from data_iceberg_sandbox_spark.operators.fraud import fraud_alerts

    sf_fake = str(tmp_path / "sf_fraud_grid")
    os.makedirs(sf_fake, exist_ok=True)
    ts = datetime(2026, 1, 1, 0, 0, 30)
    ev = spark.createDataFrame(
        [
            Row(ts=ts, user_id=1, value=0.0003),  # == threshold: excluded
            Row(ts=ts, user_id=2, value=0.0004),  # > threshold: included
        ],
        "ts timestamp, user_id bigint, value double",
    )
    pin_table(spark, sf_fake, "events", ev)
    got = {r["user_id"] for r in fraud_alerts(spark, sf_fake, 0.0003).collect()}
    assert got == {2}
    # off-grid threshold still floors down (r12 behavior preserved)
    got = {r["user_id"] for r in fraud_alerts(spark, sf_fake, 0.00025).collect()}
    assert got == {1, 2}


def test_evict_keeps_entries_with_unknowable_liveness():
    """A key whose .sparkContext RAISES (Spark Connect) must be kept;
    only a positive stopped signal (_jsc is None) evicts."""

    class _Ctx:
        def __init__(self, jsc):
            self._jsc = jsc

    class _Classic:
        def __init__(self, jsc):
            self.sparkContext = _Ctx(jsc)

    class _Connect:
        @property
        def sparkContext(self):
            raise RuntimeError("sparkContext is not supported in Connect")

    live, stopped, connect = _Classic(object()), _Classic(None), _Connect()
    memo = {live: {"a": 1}, stopped: {"b": 2}, connect: {"c": 3}}
    evict_stopped_sessions(memo)
    assert live in memo and connect in memo
    assert stopped not in memo


def test_per_flag_distinct_bitmap_exact(spark):
    """r13 bitmap rework of the shared exact-distinct helper: exact on
    negative/boundary keys, and an unexpected flag value shows up as
    its own row (loud) instead of requiring a closed domain."""
    from pyspark.sql import functions as F

    from data_iceberg_sandbox_spark.functions.distinct import (
        per_flag_distinct,
    )

    rows = [
        ("A", -70000), ("A", -32769), ("A", -32768), ("A", -1), ("A", -1),
        ("A", 0), ("A", 32768), ("N", 0), ("N", 0), ("N", 7),
        ("ZZ", 1), ("ZZ", 1), ("ZZ", 2),
    ]
    df = spark.createDataFrame(rows, "flag string, k long")
    got = {
        r["flag"]: r["n"]
        for r in per_flag_distinct(df, "flag", "k", ("A", "N"), out="n").collect()
    }
    want = {
        r["flag"]: r["n"]
        for r in df.groupBy("flag")
        .agg(F.countDistinct("k").alias("n"))
        .collect()
    }
    assert got == want == {"A": 6, "N": 2, "ZZ": 2}


def test_iceberg_jar_branch_selected_when_jar_present(tmp_path, monkeypatch):
    """r13 (VERDICT #7): the real-Iceberg session branch has no jar in
    this image, so assert it at the conf layer — a detected
    iceberg-spark-runtime jar must wire SparkCatalog + extensions, and
    its absence must leave the conf clean (laketable serves the
    lifecycle)."""
    import glob as glob_mod

    from data_iceberg_sandbox_spark import session as sess

    with_jar = sess.build_session_conf(jar="/x/iceberg-spark-runtime-3.5_2.12.jar")
    assert (
        with_jar["spark.sql.catalog.lake"]
        == "org.apache.iceberg.spark.SparkCatalog"
    )
    assert "IcebergSparkSessionExtensions" in with_jar["spark.sql.extensions"]
    assert with_jar["spark.sql.catalog.lake.type"] == "hadoop"
    assert with_jar["spark.sql.catalog.lake.warehouse"]

    without = sess.build_session_conf(jar=None)
    assert not any(k.startswith("spark.sql.catalog.") for k in without)
    assert "spark.sql.extensions" not in without

    # detector: picks up an iceberg-spark-runtime*.jar on the pyspark
    # jars path (glob mocked — no jar ships in this image)
    fake = str(tmp_path / "iceberg-spark-runtime-3.5_2.12-1.6.0.jar")
    monkeypatch.setattr(
        glob_mod, "glob", lambda pat: [fake] if "iceberg-spark-runtime" in pat else []
    )
    assert sess.iceberg_runtime_jar() == fake
    monkeypatch.setattr(glob_mod, "glob", lambda pat: [])
    assert sess.iceberg_runtime_jar() is None


def test_is_pinned_flags_overlays(spark, tmp_path):
    """r13 review: consumers that fingerprint the on-disk file must be
    able to detect pin_table overlays."""
    import os as _os

    from data_iceberg_sandbox_spark.sources.registry import (
        is_pinned,
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    load_table(spark, sf, "region")
    assert not is_pinned(spark, sf, "region")
    sf_fake = str(tmp_path / "pin_sf")
    _os.makedirs(sf_fake, exist_ok=True)
    pin_table(spark, sf_fake, "events", spark.range(3).withColumnRenamed("id", "x"))
    assert is_pinned(spark, sf_fake, "events")
    assert not is_pinned(spark, sf_fake, "lineitem")


def test_agg_approx_band_is_a_real_instrument(spark):
    """r13 review follow-up: the mean±sd band that grades the median
    sketch must actually be able to FAIL — a garbage 'median' value
    outside the band yields False (the replaced same-sketch IQR check
    was monotone-by-construction and could never fire)."""
    from pyspark.sql import functions as F

    from data_iceberg_sandbox_spark.sources.registry import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    pd_ = F.col("l_extendedprice").cast("double")
    m = li.groupBy("l_returnflag").agg(
        (F.sum(pd_) / F.count(pd_)).alias("mean_p"),
        F.sqrt(
            F.greatest(
                F.sum(pd_ * pd_) / F.count(pd_)
                - (F.sum(pd_) / F.count(pd_)) * (F.sum(pd_) / F.count(pd_)),
                F.lit(0.0),
            )
        ).alias("sd_p"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("ap50"),
    )
    rows = m.collect()
    assert rows
    for r in rows:
        lo, hi = r["mean_p"] - r["sd_p"], r["mean_p"] + r["sd_p"]
        assert lo <= r["ap50"] <= hi  # real sketch passes
        assert not (lo <= 0.0 <= hi)  # garbage value fails
        assert not (lo <= 10 * r["mean_p"] <= hi)


def test_pca_degenerate_corpora(spark, tmp_path):
    """r13 review: empty corpus → zero rows (oracle parity); all-zero
    corpus → 64 NULL loadings (the oracle's 0/0 normalization is NULL),
    not ZeroDivisionError."""
    from pyspark.sql import Row

    from data_iceberg_sandbox_spark.operators.similarity import (
        DIM,
        embedding_pca_power_iteration,
    )

    sf_a = str(tmp_path / "pca_empty")
    os.makedirs(sf_a, exist_ok=True)
    pin_table(
        spark, sf_a, "embeddings",
        spark.createDataFrame([], "vec_id bigint, embedding array<float>"),
    )
    assert embedding_pca_power_iteration(spark, sf_a).count() == 0

    sf_b = str(tmp_path / "pca_zero")
    os.makedirs(sf_b, exist_ok=True)
    pin_table(
        spark, sf_b, "embeddings",
        spark.createDataFrame(
            [Row(vec_id=i, embedding=[0.0] * DIM) for i in range(3)],
            "vec_id bigint, embedding array<float>",
        ),
    )
    rows = embedding_pca_power_iteration(spark, sf_b).collect()
    assert len(rows) == DIM
    assert all(r["loading"] is None for r in rows)


def test_interval_tiers_cover_values_past_old_cap(spark, tmp_path):
    """r13 review: values >= 500 (real data reaches 560.21) were
    silently dropped from every tier on BOTH engines; the top tier is
    now open-ended and the fact bucket clamps into it."""
    from datetime import datetime

    from pyspark.sql import Row

    from data_iceberg_sandbox_spark.operators.timeseries import (
        interval_join_value_tiers,
    )

    sf_fake = str(tmp_path / "tiers_sf")
    os.makedirs(sf_fake, exist_ok=True)
    ts = datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [
            Row(event_id=1, ts=ts, user_id=1, event_type="click", value=10.0, props="{}"),
            Row(event_id=2, ts=ts, user_id=2, event_type="click", value=499.99, props="{}"),
            Row(event_id=3, ts=ts, user_id=3, event_type="click", value=560.21, props="{}"),
            Row(event_id=4, ts=ts, user_id=4, event_type="click", value=1e6, props="{}"),
        ]
    )
    pin_table(spark, sf_fake, "events", ev)
    got = {r["tier"]: r["n_events"] for r in interval_join_value_tiers(spark, sf_fake).collect()}
    assert got.get("whale") == 3  # 499.99, 560.21, 1e6 all counted
    assert got.get("micro") == 1
    assert sum(got.values()) == 4  # exhaustive: nothing silently dropped
