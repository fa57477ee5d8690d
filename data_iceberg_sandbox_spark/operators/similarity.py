"""Similarity search over embedding columns ([EXT] scope, SURVEY §7
Phase 4): cosine top-k ANN plus scale-path variants.

Embeddings are ``array<float>`` (d=64 in testdata). Scores are computed
in double with order-deterministic folds (functions/vector.py) and
rounded to 6 dp, so Spark and DuckDB agree bit-for-bit; ranking
tie-breaks on vec_id.

Scale design (100 TB of vectors):
- brute-force top-k: query set broadcast (small), candidates streamed —
  one scan, no shuffle except the final per-query top-k (tiny). Linear
  in candidates; the right baseline and the oracle-checkable path.
- IVF (inverted-file): coarse centroids → partition vectors by nearest
  centroid (one broadcast-join pass); queries probe only `nprobe`
  nearest cells — scans shrink by ~n_centroids/nprobe. Approximate →
  rows-only check here; pytest proves nprobe=all degenerates to exact
  brute force.
- hyperplane LSH bucketing for near-dup pairs: sign-bit sketch over
  deterministic pseudo-random hyperplanes; only intra-bucket pairs are
  scored — O(n·2^bits-balanced) instead of O(n²).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vector import as_double, cosine, dot
from ..sources.registry import load_table
from .spec import QuerySpec

DIM = 64
_rng = random.Random(7)
# deterministic pseudo-random hyperplanes (box-muller from seeded uniform)
_HYPERPLANES: list[list[float]] = [
    [
        math.sqrt(-2.0 * math.log(_rng.random() or 1e-12))
        * math.cos(2.0 * math.pi * _rng.random())
        for _ in range(DIM)
    ]
    for _ in range(8)
]


def _queries(spark: SparkSession, sf_dir: str, n_queries: int = 8) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("q_emb"),
    )


def ann_cosine_topk(spark, sf_dir, k: int = 10):
    """Brute-force cosine top-k per query vector (the exact baseline).

    Plan: broadcast the 8 queries against one streamed scan of the
    candidates; per-(query) window top-k — TakeOrdered-sized state."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    q = _queries(spark, sf_dir)
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "score", F.round(cosine(F.col("q_emb"), F.col("emb")), 6)
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score", "rank")
    )


ANN_TOPK_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) emb FROM embeddings),
q AS (SELECT vec_id AS query_id, emb AS q_emb FROM e WHERE vec_id < 8),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         round(list_inner_product(q.q_emb, e.emb) /
               (sqrt(list_inner_product(q.q_emb, q.q_emb)) *
                sqrt(list_inner_product(e.emb, e.emb))), 6) AS score
  FROM q JOIN e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
"""


def embedding_neardup_pairs(spark, sf_dir, top_pairs: int = 20):
    """Embedding-cosine near-dup: top-N most-similar pairs within a
    deterministic 10% sample (vec_id % 10 = 0). Exact pairwise scoring on
    the sample (oracle-checkable); the LSH-bucketed variant below is the
    full-corpus scale path."""
    sub = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", as_double(F.col("embedding")).alias("emb"))
    )
    a = sub.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("ea"))
    b = sub.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("eb"))
    pairs = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("score", F.round(cosine(F.col("ea"), F.col("eb")), 6))
        .select("vec_a", "vec_b", "score")
        .orderBy(F.col("score").desc(), "vec_a", "vec_b")
        .limit(top_pairs)
    )
    return pairs


NEARDUP_PAIRS_ORACLE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) emb
           FROM embeddings WHERE vec_id % 10 = 0)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_inner_product(a.emb, b.emb) /
             (sqrt(list_inner_product(a.emb, a.emb)) *
              sqrt(list_inner_product(b.emb, b.emb))), 6) AS score
FROM e a JOIN e b ON a.vec_id < b.vec_id
ORDER BY score DESC, vec_a, vec_b LIMIT 20
"""


def _bucket_bits(emb_col) -> "F.Column":
    """Sign-bit sketch over the fixed hyperplanes → int bucket id."""
    bucket = F.lit(0)
    for i, hp in enumerate(_HYPERPLANES):
        proj = dot(emb_col, F.array(*[F.lit(v) for v in hp]))
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_bucketed(spark, sf_dir, k: int = 10):
    """LSH-bucketed ANN: candidates restricted to the query's hyperplane
    bucket (plus Hamming-1 probes). Approximate → rows-only check;
    recall measured in tests against the exact operator."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    emb = emb.withColumn("bucket", _bucket_bits(F.col("emb")))
    q = _queries(spark, sf_dir).withColumn("qbucket", _bucket_bits(F.col("q_emb")))
    # multi-probe: exact bucket + all Hamming-1 neighbors
    probes = q.select(
        "query_id",
        "q_emb",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(len(_HYPERPLANES))
                ],
            )
        ).alias("bucket"),
    )
    scored = (
        emb.join(F.broadcast(probes), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("q_emb"), F.col("emb")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score", "rank")
    )


def ivf_assign(spark: SparkSession, sf_dir: str, centroid_mod: int = 97) -> tuple:
    """IVF coarse quantization with deterministic centroids (every vec_id
    % centroid_mod == 0 vector): one broadcast pass assigns each vector
    to its nearest centroid cell."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cents = emb.filter(F.col("vec_id") % centroid_mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("emb").alias("cent_emb")
    )
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "sim", cosine(F.col("emb"), F.col("cent_emb"))
    )
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cent_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "emb", "cent_id")
    )
    return assigned, cents


def ann_ivf_topk(spark, sf_dir, k: int = 10, nprobe: int = 4):
    """IVF ANN: probe the nprobe nearest cells per query, exact top-k
    within. nprobe = #centroids degenerates to exact brute force
    (property-tested)."""
    assigned, cents = ivf_assign(spark, sf_dir)
    q = _queries(spark, sf_dir)
    qc = q.crossJoin(F.broadcast(cents)).withColumn(
        "sim", cosine(F.col("q_emb"), F.col("cent_emb"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("cent_id"))
    probes = (
        qc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "cent_id")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(cosine(F.col("q_emb"), F.col("emb")), 6))
    )
    wk = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score", "rank")
    )


def embedding_quantize_int8(spark, sf_dir):
    """Storage-path op: symmetric int8 quantization of embeddings —
    per-vector scale = max|x|/127, stored as (scale, array<tinyint>).
    4× footprint cut for ANN candidate sets; rows-only check here, the
    reconstruction-error bound is property-tested. (Uses array HOFs —
    acceptable off the query hot path; the scan cost is write-time.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12)
    ) / F.lit(127.0)
    return emb.select(
        "vec_id",
        scale.alias("scale"),
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")).alias("q"),
    )


SPECS: list[QuerySpec] = [
    QuerySpec("embedding_quantize_int8", embedding_quantize_int8, None),
    QuerySpec("ann_cosine_topk", ann_cosine_topk, ANN_TOPK_ORACLE),
    QuerySpec("embedding_neardup_pairs", embedding_neardup_pairs, NEARDUP_PAIRS_ORACLE),
    QuerySpec("ann_lsh_bucketed", ann_lsh_bucketed, None),
    QuerySpec("ann_ivf_topk", ann_ivf_topk, None),
]
