"""Invariant tests for operators/retrieval.py — properties the DuckDB
oracle can't catch because it mirrors the same formula (a shared
off-by-one in the chunk arithmetic would pass the oracle on both
sides)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_iceberg_sandbox_spark.operators.retrieval import (
    BM25_TOPK,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    bm25_rank,
    doc_chunk_sliding,
    tfidf_top_term,
)
from data_iceberg_sandbox_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def test_chunks_tile_every_document(spark):
    """Chunks must cover [0, n_tokens) exactly: stride-aligned starts,
    full windows except possibly the last, last chunk reaches the end,
    consecutive chunks overlap by window - stride."""
    chunks = doc_chunk_sliding(spark, SF_SMOKE).toPandas()
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"),
        )
        .toPandas()
        .set_index("doc_id")["n"]
    )
    assert set(chunks["doc_id"]) == set(docs.index)
    for doc_id, g in chunks.groupby("doc_id"):
        n = docs[doc_id]
        g = g.sort_values("chunk_idx").reset_index(drop=True)
        assert list(g["chunk_idx"]) == list(range(len(g)))
        assert (g["start_token"] == g["chunk_idx"] * CHUNK_STRIDE).all()
        # all but the last chunk are full windows
        assert (g["n_chunk_tokens"].iloc[:-1] == CHUNK_TOKENS).all()
        last = g.iloc[-1]
        assert last["start_token"] + last["n_chunk_tokens"] == n
        # one more chunk would start at or past the end
        assert (last["chunk_idx"] + 1) * CHUNK_STRIDE + 1 > n - CHUNK_TOKENS
        # chunk text round-trips the token count
        assert (
            g["chunk_text"].str.split(" ").str.len() == g["n_chunk_tokens"]
        ).all()


def test_bm25_topk_ordered_and_positive(spark):
    rows = bm25_rank(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= BM25_TOPK
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_tfidf_one_row_per_doc(spark):
    out = tfidf_top_term(spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
