"""r14 optimization-round regression tests: operator internals changed
for performance must keep their output contracts on the domains the
rewrite's encoding touches."""

from __future__ import annotations

import os

from pyspark.sql import Row, functions as F


def _native_cube_multiset(li):
    rows = [
        (r["l_returnflag"], r["l_linestatus"], r["n"], r["sum_qty"])
        for r in (
            li.cube("l_returnflag", "l_linestatus")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                .cast("double")
                .alias("sum_qty"),
            )
            .collect()
        )
    ]
    return sorted(rows, key=str)


def test_cube_packed_key_roundtrips_unicode_and_empty(spark, tmp_path):
    """The r14 packed-codepoint group key must round-trip every
    SINGLE-codepoint value exactly — including non-ASCII (codepoint >
    255, where a byte-packed key would collide across column halves)
    and the empty string (ascii('')==0 would alias chr(0)) — and keep
    NULL its own group. Multiset equals native .cube on such a domain."""
    from data_iceberg_sandbox_spark.operators.advanced import cube_counts
    from data_iceberg_sandbox_spark.sources.registry import pin_table

    sf_fake = str(tmp_path / "sf_cube_uni")
    os.makedirs(sf_fake, exist_ok=True)
    li = spark.createDataFrame(
        [
            Row(l_returnflag="é", l_linestatus="F", l_quantity=1.0),
            Row(l_returnflag="€", l_linestatus="", l_quantity=2.0),
            Row(l_returnflag="", l_linestatus="€", l_quantity=4.0),
            Row(l_returnflag=None, l_linestatus="é", l_quantity=8.0),
            Row(l_returnflag="\x00", l_linestatus=None, l_quantity=16.0),
            Row(l_returnflag="é", l_linestatus="F", l_quantity=32.0),
        ],
        "l_returnflag string, l_linestatus string, l_quantity double",
    )
    pin_table(spark, sf_fake, "lineitem", li)
    got = sorted(
        (
            (r["l_returnflag"], r["l_linestatus"], r["n"], r["sum_qty"])
            for r in cube_counts(spark, sf_fake).collect()
        ),
        key=str,
    )
    assert got == _native_cube_multiset(li)
