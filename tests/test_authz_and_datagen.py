"""D9 access-control views (reference: PERMISSION_DENIED notebook
assertions, 03-Trino-query.ipynb:146-174) and the distributed
deterministic data generator (P11/S6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.sources.datagen import generate_clients
from data_iceberg_sandbox_spark.sources.registry import load_table
from data_iceberg_sandbox_spark.tables.authz import (
    AccessController,
    PermissionDenied,
    TablePolicy,
    mask_string,
)
from tests.conftest import SF_SMOKE


@pytest.fixture
def ctl():
    return AccessController()


def test_no_grant_is_denied(spark, ctl):
    df = load_table(spark, SF_SMOKE, "customer")
    with pytest.raises(PermissionDenied, match="anna has no grant"):
        ctl.secure_view("anna", "customer", df)


def test_column_projection_policy(spark, ctl):
    df = load_table(spark, SF_SMOKE, "customer")
    ctl.grant("anna", "customer", TablePolicy(columns=["c_custkey", "c_mktsegment"]))
    view = ctl.secure_view("anna", "customer", df)
    assert view.columns == ["c_custkey", "c_mktsegment"]


def test_row_filter_policy_pushes_down(spark, ctl):
    from data_iceberg_sandbox_spark.plans.inspect import pushed_filters

    df = load_table(spark, SF_SMOKE, "customer")
    ctl.grant(
        "anna",
        "customer",
        TablePolicy(row_filter=F.col("c_mktsegment") == "BUILDING"),
    )
    view = ctl.secure_view("anna", "customer", df)
    assert view.filter(F.col("c_mktsegment") != "BUILDING").count() == 0
    assert any("c_mktsegment" in f for f in pushed_filters(view))


def test_masking_policy(spark, ctl):
    df = load_table(spark, SF_SMOKE, "customer")
    ctl.grant(
        "anna",
        "customer",
        TablePolicy(masks={"c_name": mask_string(prefix_keep=8)("c_name")}),
    )
    view = ctl.secure_view("anna", "customer", df)
    names = [r["c_name"] for r in view.limit(5).collect()]
    assert all(n.endswith("***") and len(n) == 11 for n in names)


def test_revoke(spark, ctl):
    df = load_table(spark, SF_SMOKE, "customer")
    ctl.grant("anna", "customer")
    ctl.secure_view("anna", "customer", df)
    ctl.revoke("anna", "customer")
    with pytest.raises(PermissionDenied):
        ctl.secure_view("anna", "customer", df)


def test_datagen_deterministic_and_distributed(spark):
    a = generate_clients(spark, 0, 1000, partitions=8)
    b = generate_clients(spark, 0, 1000, partitions=3)
    assert a.count() == 1000
    ka = {(r["id"], r["name"], r["age"]) for r in a.collect()}
    kb = {(r["id"], r["name"], r["age"]) for r in b.collect()}
    assert ka == kb  # partitioning-independent determinism
    cats = {r["category"] for r in a.select("category").distinct().collect()}
    assert cats == {"young", "adult", "senior"}
    assert a.rdd.getNumPartitions() == 8
