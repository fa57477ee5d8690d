"""Bucketed co-located joins: pre-bucketing both fact tables on the join
key removes the shuffle entirely — the 100 TB strategy for repeated
large-fact joins (SURVEY guide: bucketing section)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.plans.inspect import exchange_count
from data_iceberg_sandbox_spark.sources.registry import load_table
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def bucketed(spark):
    # default warehouse (./spark-warehouse, gitignored) — warehouse.dir is
    # a static conf and cannot move per-test
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")
        (
            load_table(spark, SF_ORACLE, name)
            .write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(f"b_{name}")
        )
    yield
    for name in ("lineitem", "orders"):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_totalprice", "l_extendedprice"
    )
    assert exchange_count(joined) == 0, "bucketed join must not shuffle"
    # and it still computes the right thing
    plain = load_table(spark, SF_ORACLE, "lineitem").join(
        load_table(spark, SF_ORACLE, "orders"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    assert joined.count() == plain.count()


def test_bucketed_agg_has_no_shuffle(spark, bucketed):
    li = spark.table("b_lineitem")
    agg = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    assert exchange_count(agg) == 0, "bucketed groupBy must not shuffle"


def test_bucketed_colocated_join_query(spark):
    # the driver-facing query asserts <=1 Exchange itself (fail-loud);
    # here we additionally pin that the single exchange is the post-join
    # aggregate's, i.e. the join runs co-located on bucketed scans
    from data_iceberg_sandbox_spark.operators.lifecycle import (
        d_bucketed_colocated_join,
    )
    from data_iceberg_sandbox_spark.plans.inspect import (
        has_sort_merge_join,
        physical_plan,
    )

    df = d_bucketed_colocated_join(spark, SF_ORACLE)
    assert has_sort_merge_join(df), "bucketed demo must not broadcast"
    assert exchange_count(df) <= 1
    assert "BroadcastExchange" not in physical_plan(df)
    assert df.count() > 0
