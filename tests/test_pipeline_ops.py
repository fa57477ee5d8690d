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
