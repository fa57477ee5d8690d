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
