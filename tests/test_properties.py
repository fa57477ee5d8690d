"""Property-based tests (hypothesis) for the table layer's algebraic
guarantees. Spark jobs are slow per example, so examples are few and
frames small — the properties, not the volume, carry the value."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_iceberg_sandbox_spark.tables.laketable import LakeTable

ROWS = st.dictionaries(
    keys=st.integers(min_value=0, max_value=20),
    values=st.integers(min_value=-1000, max_value=1000),
    min_size=1,
    max_size=12,
)

_ix = [0]


def _mk(spark, scratch, rows: dict[int, int]) -> LakeTable:
    _ix[0] += 1
    t = LakeTable(spark, os.path.join(scratch, f"prop_{_ix[0]}"))
    t.create(spark.createDataFrame(list(rows.items()), "id: long, v: long"))
    return t


def _state(t: LakeTable) -> dict[int, int]:
    return {r["id"]: r["v"] for r in t.read().collect()}


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=ROWS, source=ROWS)
def test_merge_matches_dict_semantics(spark, scratch, target, source):
    """MERGE == dict.update: matched keys take source values, unmatched
    source keys insert, untouched target keys remain."""
    t = _mk(spark, scratch, target)
    t.merge(
        spark.createDataFrame(list(source.items()), "id: long, v: long"),
        on=["id"],
    )
    expected = dict(target)
    expected.update(source)
    assert _state(t) == expected


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=ROWS, source=ROWS)
def test_merge_is_idempotent(spark, scratch, target, source):
    t = _mk(spark, scratch, target)
    src = spark.createDataFrame(list(source.items()), "id: long, v: long")
    t.merge(src, on=["id"])
    once = _state(t)
    t.merge(src, on=["id"])
    assert _state(t) == once


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_compact_and_expire_preserve_content(spark, scratch, rows):
    t = _mk(spark, scratch, rows)
    t.append(
        spark.createDataFrame(
            [(k + 100, v) for k, v in rows.items()], "id: long, v: long"
        )
    )
    before = _state(t)
    t.compact()
    t.expire_snapshots(retain_last=1)
    assert _state(t) == before


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target=ROWS, source=ROWS, dthr=st.integers(-500, 500), uthr=st.integers(-500, 500))
def test_merge_conditional_matches_reference(spark, scratch, target, source, dthr, uthr):
    """merge_conditional == the dict reference: for matched keys, delete
    when source value > dthr (checked FIRST), else update only when the
    TARGET value < uthr; unmatched source keys insert when value >= 0."""
    from pyspark.sql import functions as F

    t = _mk(spark, scratch, target)
    t.merge_conditional(
        spark.createDataFrame(list(source.items()), "id: long, v: long"),
        on=["id"],
        delete_when=F.col("s.v") > dthr,
        update_when=F.col("t.v") < uthr,
        insert_when=F.col("v") >= 0,
    )
    expected = {}
    for k, v in target.items():
        if k in source:
            if source[k] > dthr:
                continue  # deleted
            expected[k] = source[k] if v < uthr else v
        else:
            expected[k] = v
    for k, v in source.items():
        if k not in target and v >= 0:
            expected[k] = v
    assert _state(t) == expected


# --- histogram-rank family vs the window forms -----------------------------

RANK_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-(2**40), max_value=2**40),  # key (wide range)
        st.integers(min_value=0, max_value=500),  # value
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=RANK_ROWS, n=st.integers(min_value=1, max_value=9))
def test_histogram_rank_family_equals_window_forms(spark, rows, n):
    """For arbitrary (possibly duplicate, wide-range) keys: rank ==
    row_number(), ntile == ntile(n), prefix == running sum — the three
    histogram-rank primitives agree with Spark's window forms on every
    generated frame (tiny target_cells forces multi-key cells)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W2

    from data_iceberg_sandbox_spark.functions.ranks import (
        histogram_ntile,
        histogram_prefix_sum,
        histogram_rank,
    )

    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)], "tid long, k long, v long"
    )
    w = W2.orderBy(F.col("k").asc(), F.col("tid").asc())
    want = df.select(
        "tid",
        F.row_number().over(w).alias("r"),
        F.ntile(n).over(w).alias("b"),
        F.sum("v").over(w.rowsBetween(W2.unboundedPreceding, 0)).alias("p"),
    )
    ranked, total = histogram_rank(
        df, F.col("k"), [F.col("tid").asc()], out="r", target_cells=4
    )
    assert total == len(rows)
    got_r = ranked.select("tid", "r")
    got_b = histogram_ntile(
        df, F.col("k"), n, [F.col("tid").asc()], out="b", target_cells=4
    ).select("tid", "b")
    got_p = histogram_prefix_sum(
        df, F.col("k"), [F.col("tid").asc()], F.col("v"), out="p", target_cells=4
    ).select("tid", "p")
    got = got_r.join(got_b, "tid").join(got_p, "tid")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R", None]),
            st.sampled_from(["F", "O", None]),
            st.floats(min_value=0.0, max_value=50.0, allow_nan=False),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_cube_rewrite_equals_native_cube_property(spark, tmp_path, rows):
    """r13 sentinel rewrite: on arbitrary (incl. NULL-heavy / empty)
    domains, cube_counts' multiset equals native .cube — except the
    empty input, where the rewrite follows the SQL standard (one n=0
    grand row) and native Spark emits nothing."""
    from pyspark.sql import functions as F

    from data_iceberg_sandbox_spark.operators.advanced import cube_counts
    from data_iceberg_sandbox_spark.sources.registry import pin_table

    _ix[0] += 1
    sf_fake = os.path.join(str(tmp_path), f"cube_prop_{_ix[0]}")
    os.makedirs(sf_fake, exist_ok=True)
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_linestatus string, l_quantity double"
    )
    pin_table(spark, sf_fake, "lineitem", li)
    got = sorted(
        (
            (r["l_returnflag"], r["l_linestatus"], r["n"], r["sum_qty"])
            for r in cube_counts(spark, sf_fake).collect()
        ),
        key=str,
    )
    if not rows:
        assert got == [(None, None, 0, None)]
        return
    want = sorted(
        (
            (r["l_returnflag"], r["l_linestatus"], r["n"], r["sum_qty"])
            for r in li.cube("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .collect()
        ),
        key=str,
    )
    assert got == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["x", "y", "z"]),
            st.one_of(
                st.none(),
                st.integers(min_value=-(2**40), max_value=2**40),
            ),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_bitmap_distinct_equals_count_distinct_property(spark, rows):
    """r13 bitmap helper: exact on arbitrary long keys (wide range,
    negatives, NULLs) for every flag group."""
    from pyspark.sql import functions as F

    from data_iceberg_sandbox_spark.functions.distinct import (
        per_flag_distinct,
    )

    df = spark.createDataFrame(rows, "flag string, k long")
    got = {
        r["flag"]: r["n"]
        for r in per_flag_distinct(df, "flag", "k", out="n").collect()
    }
    want = {
        r["flag"]: r["n"]
        for r in df.groupBy("flag").agg(F.countDistinct("k").alias("n")).collect()
    }
    assert got == want
