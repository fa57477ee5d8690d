"""Duplicate-cluster resolution: validated against a local union-find
over the exact pair list."""

from __future__ import annotations

from data_iceberg_sandbox_spark.operators.dedup import jaccard_pairs
from data_iceberg_sandbox_spark.operators.pipeline import duplicate_clusters
from tests.conftest import SF_ORACLE


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_clusters_match_union_find(spark):
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(spark, SF_ORACLE, threshold=0.5).collect()
    ]
    assert pairs, "calibration: near-dup pairs exist at sf0.01"
    expected = _union_find(pairs)
    got = {
        r["doc_id"]: r["cluster_keeper"]
        for r in duplicate_clusters(spark, SF_ORACLE).collect()
    }
    assert got == expected
    keepers = {
        r["doc_id"]
        for r in duplicate_clusters(spark, SF_ORACLE).collect()
        if r["is_keeper"]
    }
    assert keepers == set(expected.values())


def test_distributed_cc_matches_union_find(spark):
    """The large-star/small-star path (forced via driver_edge_limit=0)
    must produce exactly the union-find clusters."""
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in jaccard_pairs(spark, SF_ORACLE, threshold=0.5).collect()
    ]
    expected = _union_find(pairs)
    got = {
        r["doc_id"]: r["cluster_keeper"]
        for r in duplicate_clusters(
            spark, SF_ORACLE, driver_edge_limit=0
        ).collect()
    }
    assert got == expected


def test_large_small_star_chain_converges_in_log_rounds(spark):
    """A 64-node path graph is the diameter-adversarial case: min-label
    propagation needs 63 rounds; large-star/small-star must collapse it
    to a single min-labeled star within O(log² n) — we bound at 12."""
    from data_iceberg_sandbox_spark.operators.pipeline import (
        _cc_large_small_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "doc_a: long, doc_b: long"
    )
    labels = _cc_large_small_star(chain, max_rounds=12)
    got = {r["doc_id"]: r["label"] for r in labels.collect()}
    assert got == {i: 0 for i in range(64)}


def test_mix_then_split_keeps_val_and_test(spark):
    """Sampling (mix) and split assignment are independent hash buckets:
    a source down-sampled to 30% must still contain val and test docs
    after composing mix -> split (the ADVICE r2 correlation defect)."""
    from pyspark.sql import functions as F

    from data_iceberg_sandbox_spark.operators.pipeline import (
        corpus_sample_mix,
        corpus_train_val_split,
    )

    mixed = corpus_sample_mix(spark, SF_ORACLE).select("doc_id")
    split = corpus_train_val_split(spark, SF_ORACLE)
    splits_of_sampled = {
        r["split"]
        for r in mixed.join(split, "doc_id")
        .filter(F.expr("CAST(substring(source, 4) AS INT) >= 10"))
        .select("split")
        .distinct()
        .collect()
    }
    assert splits_of_sampled == {"train", "val", "test"}
