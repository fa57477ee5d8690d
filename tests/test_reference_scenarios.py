"""Reference-scenario fidelity: the manual correctness narratives the
reference ships (SURVEY §5 — it has no automated tests, only executable
scenarios with expected outcomes) replayed against this engine with the
exact crafted data.

Scenario sources (/root/reference/):
- infra/streaming-usecase.md:57-74  — inserts chosen to straddle the
  >5000/1-minute fraud threshold ("Should return few alerts").
- infra/streaming-usecase.md:266-291 — card_999 is absent from the
  ownership dim, alerts surface with NULL enrichment, the dim row
  arrives later, enrichment is repaired ("Should now return rows with
  client 999 information").
- etl/src/apps/load_people/create_table.py:63-69,96-104 — re-loading an
  overlapping id range updates all columns except id, created_at.
- etl/src/apps/analytics/count_clients.py:21-44 — category counts
  upserted by (category, date) identifier fields on re-run.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.sources.seeds import credit_card_ownership
from data_iceberg_sandbox_spark.tables.laketable import LakeTable

TX_SCHEMA = "card_id: string, amount: decimal(28,4), ts: timestamp"


@pytest.fixture
def transactions(spark):
    """F2 threshold-straddling rows: card_456 concentrates 7x1000 inside
    one minute (alert); card_234 spreads 1200+1800 across minutes (no
    alert); card_999 crosses the threshold but has no ownership row."""
    rows = (
        [("card_456", 1000.0, f"2025-01-01 09:02:0{i}") for i in range(7)]
        + [
            ("card_234", 1200.0, "2025-01-01 10:00:00"),
            ("card_234", 1800.0, "2025-01-01 10:05:00"),
            ("card_123", 4999.0, "2025-01-01 11:00:00"),
            ("card_999", 6000.0, "2025-01-01 12:00:30"),
        ]
    )
    return spark.createDataFrame(
        [(c, a, t) for c, a, t in rows], "card_id: string, amount: double, ts: string"
    ).select(
        "card_id",
        F.col("amount").cast("decimal(28,4)").alias("amount"),
        F.col("ts").cast("timestamp").alias("ts"),
    )


def _fraud_alerts(tx, threshold=5000):
    return (
        tx.groupBy(F.window("ts", "1 minute").alias("w"), "card_id")
        .agg(F.sum("amount").alias("total_amount"))
        .filter(F.col("total_amount") > threshold)
        .select(
            "card_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "total_amount",
        )
    )


def test_threshold_straddling_alerts(spark, transactions):
    """'Should return few alerts': exactly card_456 (7000 in 09:02) and
    card_999 (6000 in 12:00); 4999 and spread-out sums stay silent."""
    alerts = {r["card_id"]: float(r["total_amount"]) for r in _fraud_alerts(transactions).collect()}
    assert alerts == {"card_456": 7000.0, "card_999": 6000.0}


def test_orphan_card_backfill(spark, transactions, scratch):
    """card_999 enrichment: NULL while the ownership row is missing, then
    repaired after the dim row arrives (mv_fraud_alerts_client chain)."""
    ownership_full = credit_card_ownership(spark, from_csv=False)
    ownership_v1 = ownership_full.filter(F.col("card_id") != "card_999")

    alerts = _fraud_alerts(transactions)

    def enrich(dim):
        return alerts.join(dim, "card_id", "left").select(
            "card_id", "client_id", "window_start", "total_amount"
        )

    t = LakeTable(spark, os.path.join(scratch, "ref_backfill"))
    t.create(enrich(ownership_v1))
    orphans = t.read().filter(F.col("client_id").isNull())
    assert [r["card_id"] for r in orphans.collect()] == ["card_999"]

    # the dim row arrives; the documented repair MERGE re-joins orphans
    repaired = (
        t.read()
        .filter(F.col("client_id").isNull())
        .drop("client_id")
        .join(ownership_full, "card_id", "left")
        .select("card_id", "client_id", "window_start", "total_amount")
    )
    t.merge(repaired, on=["card_id", "window_start"])
    final = {r["card_id"]: r["client_id"] for r in t.read().collect()}
    assert final["card_999"] == 999  # 'rows with client 999 information'
    assert final["card_456"] == 456


def test_overlapping_reload_upsert_rules(spark, scratch):
    """create_table.py merge semantics: matched rows update everything
    except id and created_at."""
    t = LakeTable(spark, os.path.join(scratch, "ref_reload"))
    load1 = spark.createDataFrame(
        [(i, f"name{i}", 30, "2024-01-01", "2024-01-01") for i in range(100)],
        "id: long, name: string, age: int, created_at: string, updated_at: string",
    )
    t.create(load1)
    load2 = spark.createDataFrame(
        [(i, f"NEW{i}", 31, "2024-02-01", "2024-02-01") for i in range(50, 150)],
        "id: long, name: string, age: int, created_at: string, updated_at: string",
    )
    t.merge(load2, on=["id"], update_exclude=("id", "created_at"))
    rows = {r["id"]: r for r in t.read().collect()}
    assert len(rows) == 150
    assert rows[10]["name"] == "name10" and rows[10]["created_at"] == "2024-01-01"
    r75 = rows[75]  # matched: updated but created_at preserved
    assert r75["name"] == "NEW75" and r75["age"] == 31
    assert r75["created_at"] == "2024-01-01" and r75["updated_at"] == "2024-02-01"
    assert rows[120]["created_at"] == "2024-02-01"  # fresh insert


def test_category_counts_upsert_on_rerun(spark, scratch):
    """count_clients.py: (category, date) keyed counts; re-running the
    job the same day replaces, a new day appends."""
    t = LakeTable(spark, os.path.join(scratch, "ref_counts"))

    def counts(n_young, n_adult, day):
        rows = [("young", n_young, day), ("adult", n_adult, day)]
        return spark.createDataFrame(rows, "category: string, len: long, date: string")

    t.create(
        counts(10, 90, "2024-01-01"),
        properties={"identifier.fields": "category,date"},
    )
    t.merge(counts(12, 95, "2024-01-01"))  # same-day rerun → replace
    t.merge(counts(3, 70, "2024-01-02"))  # next day → append
    out = {(r["category"], r["date"]): r["len"] for r in t.read().collect()}
    assert out == {
        ("young", "2024-01-01"): 12,
        ("adult", "2024-01-01"): 95,
        ("young", "2024-01-02"): 3,
        ("adult", "2024-01-02"): 70,
    }


def test_inlined_nation_lookup_keeps_left_join_null_semantics(spark):
    """The flagship's second enrichment hop folds nation into a literal
    map (fraud.py r5): `element_at` must behave exactly like the LEFT
    JOIN it replaced — NULL key → NULL, key absent from the dim → NULL,
    present key → the name. The testdata has no orphan users, so the
    orphan/NULL paths are exercised with synthesized keys here."""
    from data_iceberg_sandbox_spark.operators.tpch import _inline_nations

    keys, names, nmap = _inline_nations(spark, "/root/testdata/sf0.001")
    probe = spark.createDataFrame(
        [(keys[0],), (None,), (10_000,)], "c_nationkey: int"
    ).select(F.element_at(nmap, F.col("c_nationkey")).alias("n"))
    got = [r["n"] for r in probe.collect()]
    assert got == [names[keys[0]], None, None]
