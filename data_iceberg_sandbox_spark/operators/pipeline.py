"""End-to-end training-data pipeline operators ([EXT]): the decision
layer on top of the signal operators — corpus statistics, quality-based
filtering, and duplicate-cluster resolution (pair lists → per-doc keep/
drop verdicts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import md5_long_pair, pattern_count
from ..sources.registry import load_table
from .dedup import jaccard_pairs
from .spec import QuerySpec

_WORD = r"[A-Za-z]+"


def corpus_token_stats(spark, sf_dir):
    """Corpus-level token budget: doc counts, totals and exact token
    percentiles per source — the numbers a pretraining data plan starts
    from. One aggregation pass."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = pattern_count(F.lower(F.col("text")), _WORD)
    per_doc = docs.select("source", n_tok.alias("n_tok"))
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (
            F.sum("n_tok").cast("double") / F.count(F.lit(1))
        ).alias("avg_tokens"),
        F.round(F.percentile("n_tok", 0.5), 4).alias("p50_tokens"),
        F.round(F.percentile("n_tok", 0.95), 4).alias("p95_tokens"),
    )


CORPUS_STATS_ORACLE = rf"""
WITH per_doc AS (
  SELECT source, len(regexp_extract_all(lower(text), '{_WORD}')) AS n_tok
  FROM documents)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(sum(n_tok) AS DOUBLE) / count(*) AS avg_tokens,
       round(quantile_cont(n_tok, 0.5), 4) AS p50_tokens,
       round(quantile_cont(n_tok, 0.95), 4) AS p95_tokens
FROM per_doc GROUP BY source
"""



# quality-gate thresholds and flag builder — ONE definition feeding
# both Spark stages (quality_filter, curate_corpus) and both oracles
# (r13 review: the keep predicate was restated in four places; a
# one-sided threshold edit would silently apply a different gate in
# the end-to-end pipeline than in the audited filter stage)
_Q_MIN_CHARS, _Q_MIN_WORDS, _Q_MAX_CHARS, _Q_MAX_PUNCT = 50, 8, 100000, 0.1
_Q_FLAGS_SQL = (
    f"(n_chars < {_Q_MIN_CHARS} OR n_words < {_Q_MIN_WORDS}) AS too_short,\n"
    f"         n_chars > {_Q_MAX_CHARS} AS too_long,\n"
    f"         CAST(n_punct AS DOUBLE) / n_chars > {_Q_MAX_PUNCT} AS too_punct"
)
_Q_KEEP_SQL = (
    f"NOT (n_chars < {_Q_MIN_CHARS} OR n_words < {_Q_MIN_WORDS} "
    f"OR n_chars > {_Q_MAX_CHARS} "
    f"OR CAST(n_punct AS DOUBLE) / n_chars > {_Q_MAX_PUNCT})"
)


def _quality_flags():
    """(too_short, too_long, too_punct) over the documents schema."""
    lower = F.lower(F.col("text"))
    n_words = pattern_count(lower, _WORD)
    n_punct = pattern_count(F.col("text"), r"[.,!?;:]")
    n_chars = F.length("text")
    return (
        (n_chars < _Q_MIN_CHARS) | (n_words < _Q_MIN_WORDS),
        n_chars > _Q_MAX_CHARS,
        n_punct.cast("double") / n_chars.cast("double") > _Q_MAX_PUNCT,
    )


def quality_filter(spark, sf_dir):
    """Quality gate: keep/drop verdict per doc from the feature set
    (length band, words-per-doc floor, punctuation ceiling) — the
    composable filter stage of a data pipeline, emitted with reasons so
    drops are auditable."""
    docs = load_table(spark, sf_dir, "documents")
    too_short, too_long, too_punct = _quality_flags()
    keep = ~(too_short | too_long | too_punct)
    return docs.select(
        "doc_id",
        keep.alias("keep"),
        F.when(too_short, "too_short")
        .when(too_long, "too_long")
        .when(too_punct, "too_punct")
        .otherwise("ok")
        .alias("reason"),
    )


QUALITY_FILTER_ORACLE = rf"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(lower(text), '{_WORD}')) AS n_words,
         len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
  FROM documents),
v AS (
  SELECT doc_id,
         {_Q_FLAGS_SQL}
  FROM f)
SELECT doc_id,
       NOT (too_short OR too_long OR too_punct) AS keep,
       CASE WHEN too_short THEN 'too_short'
            WHEN too_long THEN 'too_long'
            WHEN too_punct THEN 'too_punct'
            ELSE 'ok' END AS reason
FROM v
"""


def _cc_large_small_star(
    pairs: DataFrame, max_rounds: int = 25
) -> DataFrame:
    """Distributed connected components by large-star/small-star
    alternation (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14): converges in O(log² n) rounds on ANY graph —
    unlike min-label propagation, whose round count is the cluster
    diameter (a 1M-doc duplicate chain = 1M rounds).

    Each round is two groupBy-min passes over the edge list:
      large-star: every neighbor v > u links to m = min(N(u) ∪ {u})
      small-star: every neighbor v ≤ u (edges directed big→small) links
                  to m = min(N(u) ∪ {u})
    Fixpoint = the edge set is a star forest (u → component-min).
    Lineage is truncated per round with eager localCheckpoint; on a
    cluster, checkpoint(reliable) replaces it.

    Returns (doc_id, label) for every node of `pairs`.
    """
    e = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("doc_id"))
        .union(e.select("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def edge_sig(df: DataFrame) -> tuple:
        # bit_xor: order-independent set digest that can't overflow
        # (ANSI mode forbids a plain sum of 64-bit hashes)
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    sig = None
    converged = False
    for _ in range(max_rounds):
        # large-star over symmetric neighborhoods
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m_of = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        ls = (
            sym.join(m_of, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star over big→small directed edges
        s = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m_of2 = s.groupBy("u").agg(F.min("v").alias("m"))
        joined = s.join(m_of2, "u")
        e = (
            joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(joined.select("u", F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = edge_sig(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig

    if not converged:
        # an unconverged edge set is not a star forest: the label join
        # below would fan out with conflicting labels — fail loud
        raise RuntimeError(
            f"large-star/small-star did not converge in {max_rounds} rounds"
        )
    return nodes.join(
        e.select(F.col("u").alias("doc_id"), F.col("v").alias("label")),
        "doc_id",
        "left",
    ).select("doc_id", F.coalesce("label", "doc_id").alias("label"))


def _purpose_hash(purpose: str) -> tuple[str, str]:
    """(Spark SQL, DuckDB SQL) md5 bucket in [0, 100), salted by purpose.

    Each pipeline decision (split assignment, mix sampling, ...) gets an
    INDEPENDENT hash: without the salt, a source sampled at 30% keeps
    only buckets 0-29 — all 'train' under a 90/5/5 split on the same
    bucket — so composing mix→split would yield zero val/test docs.
    The salt makes the two bucketings independent while staying a pure,
    engine-portable function of doc_id."""
    if purpose:
        spark_key = f"concat('{purpose}:', CAST(doc_id AS STRING))"
        duck_key = f"'{purpose}:' || CAST(doc_id AS VARCHAR)"
    else:
        spark_key = "CAST(doc_id AS STRING)"
        duck_key = "CAST(doc_id AS VARCHAR)"
    h_spark, h_duck = md5_long_pair(spark_key, duck_key)
    return f"pmod({h_spark}, 100)", f"{h_duck} % 100"


# Split keeps the unsalted bucket (stable vs round-2 outputs); sampling
# salts with 'mix:' so the two decisions are independent (ADVICE r2).
_SPLIT_HASH, _SPLIT_HASH_DUCK = _purpose_hash("")
_MIX_HASH, _MIX_HASH_DUCK = _purpose_hash("mix")


def corpus_train_val_split(spark, sf_dir):
    """Deterministic hash split (90/5/5 train/val/test): the assignment
    is a pure function of doc_id via an md5-derived bucket, so it is
    stable across runs, engines, and re-partitioning — the property a
    training pipeline needs so no document ever migrates between splits.
    Zero shuffle; engine-portable (same md5 bucket in the oracle)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "source",
        f"""CASE WHEN {_SPLIT_HASH} < 90 THEN 'train'
                 WHEN {_SPLIT_HASH} < 95 THEN 'val'
                 ELSE 'test' END AS split""",
    )


SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN {_SPLIT_HASH_DUCK} < 90 THEN 'train'
            WHEN {_SPLIT_HASH_DUCK} < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def corpus_sample_mix(spark, sf_dir):
    """Data-mixing sampler: per-source target rates (the corpus
    composition knob of a pretraining data plan — here 100% for
    src0-src9, 30% for the rest) applied via the same deterministic
    md5 bucket, so the sample is reproducible and disjointness /
    supersets across rate changes are guaranteed (a doc sampled at 30%
    is still sampled at 50%). The bucket is salted ('mix:') so sampling
    is independent of the train/val/test split bucket — composing
    mix→split keeps the 90/5/5 proportions within every sampled source.
    Zero shuffle, embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    rate = (
        "CASE WHEN CAST(substring(source, 4) AS INT) < 10"
        " THEN 100 ELSE 30 END"
    )
    return docs.selectExpr("doc_id", "source", f"{_MIX_HASH} AS bucket").where(
        f"bucket < {rate}"
    ).selectExpr("doc_id", "source")


SAMPLE_MIX_ORACLE = f"""
SELECT doc_id, source FROM documents
WHERE {_MIX_HASH_DUCK} <
      CASE WHEN CAST(substring(source, 4) AS INT) < 10 THEN 100 ELSE 30 END
"""


PACK_BUDGET = 512


def corpus_pack_sequences(spark, sf_dir, budget: int = PACK_BUDGET):
    """Sequence packing (concat-and-chunk): assign each doc to a
    token-budget bin, bin = floor(exclusive-cumulative-tokens / budget),
    packed independently PER SOURCE in deterministic doc_id order.

    Per-source packing is the scale shape: the running sum is a window
    keyed (source), so packing parallelizes across sources instead of a
    single global sort — at 100 TB you'd key on (source, shard). Integer
    cumsum → exact in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = pattern_count(F.lower(F.col("text")), _WORD)
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    per_doc = docs.select(
        "doc_id", "source", n_tok.cast("bigint").alias("n_tok")
    )
    return per_doc.withColumn(
        "bin_id",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / budget).cast("bigint"),
    )


def pack_oracle_sql(budget: int = PACK_BUDGET) -> str:
    """Oracle generated from the same ``budget`` as the Spark query, so a
    non-default call never silently diverges from its oracle (ADVICE r2)."""
    return rf"""
WITH per_doc AS (
  SELECT doc_id, source,
         len(regexp_extract_all(lower(text), '{_WORD}')) AS n_tok
  FROM documents)
SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tok,
       CAST(floor((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) - n_tok)
                  / {budget}.0) AS BIGINT) AS bin_id
FROM per_doc
"""


PACK_ORACLE = pack_oracle_sql()


SHARD_BYTES = 65536


def corpus_shard_manifest(spark, sf_dir, budget: int = SHARD_BYTES):
    """WebDataset-style shard manifest: every document gets its byte
    offset in a single GLOBAL shard sequence (shard id + offset of the
    doc's first byte, docs ordered by doc_id) — the manifest a training
    loader uses to seek into packed shards. `corpus_pack_sequences`
    deliberately packs per-source to dodge the global sort; a real
    shard layout IS one global order, and the global exclusive prefix
    sum now comes from `histogram_prefix_sum` (functions/ranks.py):
    broadcast cell-histogram byte offsets + within-cell running sums —
    nothing row-grain crosses one task, same machinery as the
    histogram-rank ntile fix. Docs may straddle shard boundaries (the
    manifest records starts; a greedy non-splitting packer is a
    different operator). All arithmetic exact BIGINT."""
    docs = load_table(spark, sf_dir, "documents")
    from ..functions.ranks import histogram_prefix_sum

    # octet_length, not length (r13 review): the manifest's offsets are
    # SEEK positions into UTF-8 shards, so they must count encoded
    # bytes — length() counts characters and drifts on any non-ASCII
    # corpus (DuckDB twin: strlen()).
    per = docs.select(
        "doc_id", F.coalesce(F.octet_length("text"), F.lit(0)).alias("n_bytes")
    )
    cum = histogram_prefix_sum(
        per, F.col("doc_id"), [], F.col("n_bytes"), out="cum_incl"
    )
    return cum.withColumn(
        "start_byte", (F.col("cum_incl") - F.col("n_bytes")).cast("bigint")
    ).selectExpr(
        "doc_id",
        "CAST(n_bytes AS BIGINT) AS n_bytes",
        "start_byte",
        f"start_byte div {budget} AS shard_id",  # integer div: exact, ≥0
        f"start_byte % {budget} AS shard_offset",
    )


def shard_manifest_oracle_sql(budget: int = SHARD_BYTES) -> str:
    return f"""
WITH per AS (
  SELECT doc_id, COALESCE(strlen(text), 0) AS n_bytes FROM documents),
c AS (
  SELECT doc_id, n_bytes,
         CAST(sum(n_bytes) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              - n_bytes AS BIGINT) AS start_byte
  FROM per)
SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes, start_byte,
       start_byte // {budget} AS shard_id,
       start_byte % {budget} AS shard_offset
FROM c
"""


DECON_N = 8
DECON_EVAL_DOCS = 5


def corpus_decontaminate(
    spark, sf_dir, n: int = DECON_N, n_eval_docs: int = DECON_EVAL_DOCS
):
    """Benchmark decontamination: flag every training doc that shares
    ANY word n-gram (n=8, the common contamination test) with the eval
    set (here: doc_id < n_eval_docs stands in for the benchmark).

    Inverted-index shape: eval n-grams are a distinct (tiny) set;
    training shingles left-semi join against it — never doc×doc, and
    the eval side broadcasts at any corpus size. Output: one row per
    training doc with a `contaminated` verdict."""
    from .dedup import _shingles_of

    docs = load_table(spark, sf_dir, "documents")
    # both the eval side and the training side consume this frame — the
    # cache saves the second full shingle pass (r12 review; same
    # convention as every other multi-consumer shingle frame here)
    sh = _shingles_of(docs, n=n).cache()
    eval_sh = (
        sh.filter(F.col("doc_id") < n_eval_docs).select("shingle").distinct()
    )
    flagged = (
        sh.filter(F.col("doc_id") >= n_eval_docs)
        .join(eval_sh, "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        docs.filter(F.col("doc_id") >= n_eval_docs)
        .select("doc_id", "source")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("hit", F.lit(False)).alias("contaminated"),
        )
    )


def decontaminate_oracle_sql(
    n: int = DECON_N, n_eval_docs: int = DECON_EVAL_DOCS
) -> str:
    """Oracle generated from the same (n, n_eval_docs) as the Spark query
    — non-default calls stay paired with a matching oracle (ADVICE r2)."""
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (SELECT doc_id, array_to_string(w[i.i:i.i+{n - 1}], ' ') AS shingle
       FROM toks,
            LATERAL (SELECT unnest(generate_series(1,
                       greatest(len(w)-{n - 1}, 1))) AS i) i),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
ev AS (SELECT DISTINCT shingle FROM ds WHERE doc_id < {n_eval_docs}),
flagged AS (SELECT DISTINCT doc_id FROM ds
            WHERE doc_id >= {n_eval_docs}
              AND shingle IN (SELECT shingle FROM ev))
SELECT d.doc_id, d.source, f.doc_id IS NOT NULL AS contaminated
FROM documents d LEFT JOIN flagged f USING (doc_id)
WHERE d.doc_id >= {n_eval_docs}
"""


DECONTAMINATE_ORACLE = decontaminate_oracle_sql()


def duplicate_clusters(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.5,
    max_iter: int = 25,
    driver_edge_limit: int = 5_000_000,
) -> DataFrame:
    """Connected components over the near-dup pair graph: every doc in a
    duplicate cluster is labeled with the cluster's minimum doc_id (the
    canonical keeper).

    Hybrid strategy (what production dedup pipelines do): the edge list
    is orders of magnitude smaller than the corpus — when it fits the
    driver (≤ `driver_edge_limit` edges, ~100 MB), an exact union-find
    runs locally in O(E α) and the label map is parallelized back; a
    tiny Spark job beats rounds of distributed joins by 20×+ (measured).
    Above the limit, large-star/small-star alternation
    (_cc_large_small_star) runs fully distributed: O(log² n) rounds
    regardless of cluster diameter — the billion-edge shape.
    (`max_iter` bounds those rounds.)
    """
    pairs = (
        jaccard_pairs(spark, sf_dir, threshold=threshold)
        .select("doc_a", "doc_b")
        .cache()
    )
    n_edges = pairs.count()

    if n_edges <= driver_edge_limit:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # Arrow path: two int64 numpy columns (~16 B/edge) instead of
        # 5M pickled Row objects (>100 B each — gigabytes of driver
        # heap at the limit; r12 review)
        edges = pairs.toPandas()
        for a, b in zip(
            edges["doc_a"].to_numpy(), edges["doc_b"].to_numpy()
        ):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # egress through Arrow too (r13 review): a Python list of up to
        # ~10M tuples pickled through createDataFrame is the same
        # driver-heap blowup the ingress fix above removed — a pandas
        # frame of two int64 numpy columns takes the Arrow path
        import numpy as np
        import pandas as pd

        nodes = np.fromiter(parent.keys(), dtype="int64", count=len(parent))
        keepers = np.fromiter(
            (find(int(x)) for x in nodes), dtype="int64", count=len(nodes)
        )
        out = spark.createDataFrame(
            pd.DataFrame({"doc_id": nodes, "cluster_keeper": keepers})
        )
        return out.withColumn(
            "is_keeper", F.col("doc_id") == F.col("cluster_keeper")
        )

    labels = _cc_large_small_star(pairs, max_rounds=max_iter)
    return labels.select(
        "doc_id", F.col("label").alias("cluster_keeper")
    ).withColumn("is_keeper", F.col("doc_id") == F.col("cluster_keeper"))


def curate_corpus(spark, sf_dir):
    """The end-to-end curation pipeline as ONE composed query:
    quality gate → exact-dedup keeper selection → per-source counts of
    surviving docs and tokens. Each stage is the operator defined above;
    composition stays a single Catalyst plan (filters and the dedup
    window all pushed into one pass over documents + one shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    too_short, too_long, too_punct = _quality_flags()
    kept = docs.filter(~(too_short | too_long | too_punct))
    from pyspark.sql import Window as W

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = kept.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    return deduped.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(pattern_count(F.lower(F.col("text")), _WORD))
        .cast("long")
        .alias("total_tokens"),
    )


CURATE_ORACLE = rf"""
WITH f AS (
  SELECT *, length(text) AS n_chars,
         len(regexp_extract_all(lower(text), '{_WORD}')) AS n_words,
         len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct
  FROM documents),
kept AS (
  SELECT * FROM f
  WHERE {_Q_KEEP_SQL}),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_tokens
FROM deduped GROUP BY source
"""


def corpus_top_bigrams(spark, sf_dir, k: int = 50):
    """Corpus n-gram statistics: top-k bigrams by frequency (LM-style
    corpus profiling). posexplode + window lead (the codegen shingle
    path) → one count shuffle → TakeOrdered.

    r14 optimization round, measured and REJECTED: building the bigram
    list with an index-lambda array transform (slice + element_at —
    no doc_id exchange, no word-grain sort) LOST the interleaved sf10
    A/B 1.449 → 1.692 s min-of-7, old 7/7 adjacent pairs
    (plans/r14/ab_bigrams_arraytf_rejected.json): the nested
    array/lambda evaluation and the materialized per-doc bigram arrays
    cost more than the window's partition-local sort on this shape.
    The window form stands."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import words

    w = words(F.lower(F.col("text")))
    base = docs.select("doc_id", F.posexplode(w).alias("pos", "w0"))
    nxt = F.lead("w0", 1).over(W.partitionBy("doc_id").orderBy("pos"))
    bigrams = base.select(
        F.concat_ws(" ", F.col("w0"), nxt).alias("bigram"), nxt.alias("_n")
    ).filter(F.col("_n").isNotNull())
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(k)
    )


TOP_BIGRAMS_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS w FROM documents),
bg AS (
  SELECT concat(w[i.i], ' ', w[i.i + 1]) AS bigram
  FROM toks,
       LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) i)
SELECT bigram, count(*) AS n
FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
"""


def embedding_label_centroids(spark, sf_dir):
    """Per-label embedding centroid (the class-prototype computation):
    posexplode the vector → mean per (label, dim) → reassemble in dim
    order. One shuffle keyed (label, dim); rounding makes the doubles
    engine-portable."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    )
    # exact decimal accumulation: float sums are partition-order-dependent
    per_dim = dims.groupBy("label", "dim").agg(
        F.round(
            F.sum(F.col("x").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mu")
    )
    return (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "mu"))).alias("a"))
        .select(
            "label",
            F.col("a")[0]["mu"].alias("mu_0"),
            F.col("a")[1]["mu"].alias("mu_1"),
            F.col("a")[31]["mu"].alias("mu_31"),
            F.col("a")[63]["mu"].alias("mu_63"),
            F.size("a").alias("n_dims"),
        )
    )


def embedding_dim_stats(spark, sf_dir):
    """Per-dimension distribution profile of the embedding space: n,
    mean, std, min, max for each of the 64 coordinates — the first
    check before whitening/quantizing a vector column (a dead or
    unscaled dimension shows up here, not in per-label centroids).

    Determinism/exactness (the embedding_outlier_scores lesson): floats
    quantize to scale-6 BIGINT once, then every accumulator is exact
    integer — Σv in int64 (|v|≤~4 ⇒ 4e6/row; 2e12 rows of headroom),
    Σv² in DECIMAL(38,0) because int64 would overflow past ~5e5 rows
    per dim (v² ≤ 1.6e13); the decimal agg is the documented exception
    to the fixed-point-stays-long rule — 64 dims × |vectors| rows is
    the op's whole input and there is no narrower exact carrier. Both
    engines then run the identical IEEE tail (cast → multiply/subtract
    → divide → sqrt) on the same exact integers. One (dim)-keyed
    shuffle with map-side combine; output is always 64 rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x")
    ).select(
        "dim", F.round(F.col("x") * 1e6).cast("bigint").alias("v")
    )
    agg = dims.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("sq"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    sq_d = F.col("sq").cast("double")
    # clamp: past ~2^53 the double casts can round n·sq − s² to a tiny
    # negative for a constant dimension (true var 0) — sqrt would emit
    # NaN (r12 review; same guard as embedding_outlier_scores)
    var = F.greatest(
        (n_d * sq_d - s_d * s_d) / (n_d * n_d) / F.lit(1e12), F.lit(0.0)
    )
    return agg.select(
        "dim",
        "n",
        F.round(s_d / n_d / F.lit(1e6), 6).alias("mean"),
        F.round(F.sqrt(var), 6).alias("std"),
        (F.col("mn").cast("double") / F.lit(1e6)).alias("vmin"),
        (F.col("mx").cast("double") / F.lit(1e6)).alias("vmax"),
    )


DIM_STATS_ORACLE = """
WITH dims AS (
  SELECT u.dim - 1 AS dim, CAST(round(u.x * 1e6) AS BIGINT) AS v
  FROM embeddings,
       LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                       generate_subscripts(embedding, 1) AS dim) u),
agg AS (
  SELECT dim, count(*) AS n, sum(v) AS s, sum(v * v) AS sq,
         min(v) AS mn, max(v) AS mx
  FROM dims GROUP BY dim)
SELECT dim, n,
       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6) AS mean,
       -- greatest(…, 0) mirrors the Spark-side clamp (r13 review: a
       -- constant dimension past ~2^53 rows rounds n·sq − s² to a tiny
       -- negative on BOTH engines; without the clamp here the oracle
       -- alone emits NaN)
       round(sqrt(greatest((CAST(n AS DOUBLE) * CAST(sq AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12, 0)), 6)
         AS std,
       CAST(mn AS DOUBLE) / 1e6 AS vmin,
       CAST(mx AS DOUBLE) / 1e6 AS vmax
FROM agg
"""


LABEL_CENTROID_ORACLE = """
WITH dims AS (
  SELECT label, u.x AS x, u.dim - 1 AS dim
  FROM embeddings,
       LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                       generate_subscripts(embedding, 1) AS dim) u),
per_dim AS (
  SELECT label, dim,
         round(CAST(sum(CAST(x AS DECIMAL(28,18))) AS DOUBLE) / count(*), 6) AS mu
  FROM dims GROUP BY label, dim)
SELECT label,
       max(CASE WHEN dim = 0 THEN mu END) AS mu_0,
       max(CASE WHEN dim = 1 THEN mu END) AS mu_1,
       max(CASE WHEN dim = 31 THEN mu END) AS mu_31,
       max(CASE WHEN dim = 63 THEN mu END) AS mu_63,
       CAST(count(*) AS INT) AS n_dims
FROM per_dim GROUP BY label
"""


# Connected components IS SQL-expressible (VERDICT r3 item 2): DuckDB's
# recursive CTE propagates labels along the (symmetric) candidate-pair
# edges until fixpoint — min reachable node id == the union-find keeper.
# The edge set is the dedup.DEDUP_JACCARD_ORACLE pair query shape,
# generated from the SAME (threshold, n) as duplicate_clusters() /
# jaccard_pairs() so a non-default invocation stays paired with a
# matching oracle (ADVICE r4; same pattern as decontaminate_oracle_sql).
# UNION (set semantics) bounds the walk at O(component_size²) states —
# fine at oracle scale; the Spark side stays union-find / star-contraction.
def duplicate_clusters_oracle_sql(threshold: float = 0.5, n: int = 5) -> str:
    return f"""
WITH RECURSIVE
toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (SELECT doc_id, array_to_string(w[i.i:i.i+{n - 1}], ' ') AS shingle
       FROM toks,
            LATERAL (SELECT unnest(generate_series(1,
                       greatest(len(w)-{n - 1}, 1))) AS i) i),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
n AS (SELECT doc_id, count(*) n_sh FROM ds GROUP BY doc_id),
common AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) n_common
           FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM common JOIN n na ON doc_a = na.doc_id JOIN n nb ON doc_b = nb.doc_id
  WHERE round(n_common * 1.0 / (na.n_sh + nb.n_sh - n_common), 6) >= {threshold}),
edges AS (SELECT doc_a u, doc_b v FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.label FROM walk w JOIN edges e ON e.v = w.node
)
SELECT node AS doc_id, min(label) AS cluster_keeper,
       (node = min(label)) AS is_keeper
FROM walk GROUP BY node
"""


DUPLICATE_CLUSTERS_ORACLE = duplicate_clusters_oracle_sql()


def canonicalize_corpus(spark, sf_dir):
    """The dedup pipeline's FINAL verdict, end to end: near-dup pair
    graph → connected components → per-cluster keeper chosen by
    QUALITY (highest n_chars, doc_id tie-break — `dedup_keep_best`'s
    policy applied per similarity cluster instead of per exact-hash
    group) → every document mapped to its keeper, singletons keeping
    themselves. This is the row a curation job writes back: (doc_id,
    keeper_doc_id, is_kept).

    Scale shape: reuses `duplicate_clusters`' hybrid connected
    components (driver union-find under the documented edge bound,
    large-star/small-star above it); the keeper argmax is one packed
    `max_by` over cluster members; singletons arrive via left-anti
    against the (small) clustered-node set — the corpus is never
    joined doc×doc."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labels = duplicate_clusters(spark, sf_dir).select(
        "doc_id", F.col("cluster_keeper").alias("cluster")
    )
    mem = labels.join(docs, "doc_id")
    from .dedup import quality_rank_col

    rank = quality_rank_col()
    best = mem.groupBy("cluster").agg(
        F.max_by(F.col("doc_id"), rank).alias("keeper")
    )
    clustered = mem.join(best, "cluster").select(
        "doc_id", F.col("keeper").alias("keeper_doc_id")
    )
    singles = docs.join(labels, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("keeper_doc_id")
    )
    return (
        clustered.unionByName(singles)
        .select(
            "doc_id",
            "keeper_doc_id",
            (F.col("doc_id") == F.col("keeper_doc_id")).alias("is_kept"),
        )
    )


def _canonicalize_oracle_sql(threshold: float = 0.5, n: int = 5) -> str:
    from .dedup import QUALITY_RANK_SQL

    return f"""
WITH RECURSIVE
toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (SELECT doc_id, array_to_string(w[i.i:i.i+{n - 1}], ' ') AS shingle
       FROM toks,
            LATERAL (SELECT unnest(generate_series(1,
                       greatest(len(w)-{n - 1}, 1))) AS i) i),
ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
nn AS (SELECT doc_id, count(*) n_sh FROM ds GROUP BY doc_id),
common AS (SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) n_common
           FROM ds a JOIN ds b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b
  FROM common JOIN nn na ON doc_a = na.doc_id JOIN nn nb ON doc_b = nb.doc_id
  WHERE round(n_common * 1.0 / (na.n_sh + nb.n_sh - n_common), 6) >= {threshold}),
edges AS (SELECT doc_a u, doc_b v FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
walk(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, w.label FROM walk w JOIN edges e ON e.v = w.node
),
cl AS (SELECT node AS doc_id, min(label) AS cluster FROM walk GROUP BY node),
mem AS (SELECT cl.doc_id, cl.cluster, d.n_chars
        FROM cl JOIN documents d USING (doc_id)),
best AS (SELECT cluster,
                max_by(doc_id, {QUALITY_RANK_SQL}) AS keeper
         FROM mem GROUP BY 1),
clustered AS (SELECT mem.doc_id, best.keeper AS keeper_doc_id
              FROM mem JOIN best USING (cluster)),
singles AS (SELECT d.doc_id, d.doc_id AS keeper_doc_id FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM cl)),
u AS (SELECT * FROM clustered UNION ALL SELECT * FROM singles)
SELECT doc_id, keeper_doc_id, doc_id = keeper_doc_id AS is_kept FROM u
"""


CANONICALIZE_ORACLE = _canonicalize_oracle_sql()


def sample_stratified_exact(spark, sf_dir, k: int = 20):
    """Exact-size stratified sampling: EXACTLY min(k, |stratum|) docs per
    (lang, source) stratum, chosen by deterministic md5 order — the
    balanced-eval-set constructor (rate-based sampling like
    `corpus_sample_mix` only hits k in expectation; an eval suite wants
    exact per-cell counts, stable across runs and engines).

    Scale shape: one shuffle on the stratum key; the rank is a window
    over each stratum ordered by a pure hash of doc_id, so re-running,
    re-partitioning, or growing OTHER strata never changes a cell's
    selection. Hot strata are bounded by the window's per-partition
    sort; k rows survive per cell."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    okey = F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = W.partitionBy("lang", "source").orderBy(okey)
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select("doc_id", "lang", "source", "sample_rank")
    )


SAMPLE_STRATIFIED_ORACLE = """
SELECT doc_id, lang, source, sample_rank FROM (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR))
         ) AS sample_rank
  FROM documents) t
WHERE sample_rank <= 20
"""


def vocab_coverage(spark, sf_dir, topk: int = 30):
    """Tokenizer-vocabulary planning: the top-k corpus words with
    cumulative coverage share — "how much of the corpus do the first N
    vocabulary entries cover", the curve a BPE/vocab-size decision
    reads. Exact integer counts; the running share is a window sum over
    the tiny top-k frame divided once per row.

    Scale shape: one explode + word-count shuffle with map-side
    combine (O(vocabulary) rows), TakeOrdered top-k, then window math
    on k rows. The corpus total comes from the same counts frame
    pre-truncation (a second tiny aggregate, not a rescan)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .cache()
    )
    total = counts.agg(F.sum("n")).collect()[0][0] or 0  # empty corpus
    w = W.orderBy(F.col("n").desc(), "word").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        counts.orderBy(F.col("n").desc(), "word")
        .limit(topk)
        .select(
            "word",
            "n",
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), "word"))
            .alias("rank"),
            F.round(
                F.sum("n").over(w).cast("double") / F.lit(float(total)), 6
            ).alias("cum_coverage"),
        )
    )


VOCAB_COVERAGE_ORACLE = """
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
counts AS (
  SELECT word, count(*) AS n FROM words WHERE word <> '' GROUP BY 1),
t AS (SELECT sum(n) AS total FROM counts),
top AS (
  SELECT word, n, row_number() OVER (ORDER BY n DESC, word) AS rank
  FROM counts ORDER BY n DESC, word LIMIT 30)
SELECT word, n, rank,
       round(CAST(sum(n) OVER (ORDER BY n DESC, word
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / CAST(t.total AS DOUBLE), 6) AS cum_coverage
FROM top, t
"""


def dq_expectations(spark, sf_dir):
    """Declarative data-quality expectation suite (the Great-
    Expectations/dbt-test shape): each check is a predicate counted
    over its table in ONE conditional-aggregation pass per table — no
    per-check scans. Emits (check, n_rows, n_violations, status) so a
    CI gate can fail on any 'fail' row; checks below include two that
    FAIL on this data on purpose (documents.text uniqueness — the
    corpus contains exact dups by construction — and a too-tight value
    range), because an expectations operator that can only pass proves
    nothing.

    Scale shape: per table, all checks fold into one aggregate
    projection (map-side combined, one job); cross-column/uniqueness
    checks use count vs count-distinct in the same pass. Adding a
    check is a new expression, not a new scan."""
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    ords = load_table(spark, sf_dir, "orders")

    def suite(df, table, checks):
        # a NULL predicate (e.g. a range check on a NULL value) counts
        # as a violation on both sides: "is not TRUE", never silently ok
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(
                F.when(ok.eqNullSafe(F.lit(True)), 0).otherwise(1)
            ).alias(f"v{i}")
            for i, (_, ok) in enumerate(checks)
        ]
        row = df.agg(*aggs)
        out = None
        for i, (name, _) in enumerate(checks):
            one = row.select(
                F.lit(f"{table}.{name}").alias("check_name"),
                F.col("n_rows"),
                F.col(f"v{i}").alias("n_violations"),
                F.when(F.col(f"v{i}") == 0, "pass")
                .otherwise("fail")
                .alias("status"),
            )
            out = one if out is None else out.unionByName(one)
        return out

    ev_checks = [
        ("event_id_not_null", F.col("event_id").isNotNull()),
        ("value_non_negative", F.col("value") >= 0),
        ("value_under_200", F.col("value") < 200),  # deliberately fails
        (
            "type_in_domain",
            F.col("event_type").isin(
                "view", "click", "purchase", "error", "signup"
            ),
        ),
        # half-open upper bound (r13 review): BETWEEN '2026-12-31'
        # casts to midnight and would flag the whole last day of 2026
        (
            "ts_in_2024_2026",
            (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2027-01-01"),
        ),
    ]
    doc_checks = [
        ("n_chars_matches_text", F.length("text") == F.col("n_chars")),
        ("lang_not_null", F.col("lang").isNotNull()),
    ]
    ord_checks = [
        ("totalprice_positive", F.col("o_totalprice") > 0),
    ]
    per_row = (
        suite(ev, "events", ev_checks)
        .unionByName(suite(docs, "documents", doc_checks))
        .unionByName(suite(ords, "orders", ord_checks))
    )
    # uniqueness needs a distinct aggregate — still one pass per table
    uniq = docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.countDistinct("text")).alias("n_violations"),
    ).select(
        F.lit("documents.text_unique").alias("check_name"),  # fails: exact dups
        "n_rows",
        "n_violations",
        F.when(F.col("n_violations") == 0, "pass").otherwise("fail").alias(
            "status"
        ),
    )
    return per_row.unionByName(uniq)


def _dq_oracle_sql() -> str:
    ev = [
        ("event_id_not_null", "event_id IS NOT NULL"),
        ("value_non_negative", "value >= 0"),
        ("value_under_200", "value < 200"),
        (
            "type_in_domain",
            "event_type IN ('view','click','purchase','error','signup')",
        ),
        (
            "ts_in_2024_2026",
            "ts >= '2024-01-01' AND ts < '2027-01-01'",
        ),
    ]
    doc = [
        ("n_chars_matches_text", "length(text) = n_chars"),
        ("lang_not_null", "lang IS NOT NULL"),
    ]
    orc = [("totalprice_positive", "o_totalprice > 0")]

    def block(table, checks):
        return " UNION ALL ".join(
            f"""SELECT '{table}.{name}' AS check_name,
  (SELECT count(*) FROM {table}) AS n_rows,
  CAST((SELECT sum(CASE WHEN NOT coalesce(({pred}), FALSE) THEN 1 ELSE 0 END)
        FROM {table}) AS BIGINT) AS n_violations,
  CASE WHEN (SELECT sum(CASE WHEN NOT coalesce(({pred}), FALSE) THEN 1
             ELSE 0 END) FROM {table}) = 0
       THEN 'pass' ELSE 'fail' END AS status"""
            for name, pred in checks
        )

    return (
        block("events", ev)
        + " UNION ALL "
        + block("documents", doc)
        + " UNION ALL "
        + block("orders", orc)
        + """ UNION ALL
SELECT 'documents.text_unique' AS check_name,
  (SELECT count(*) FROM documents) AS n_rows,
  (SELECT count(*) - count(DISTINCT text) FROM documents) AS n_violations,
  CASE WHEN (SELECT count(*) - count(DISTINCT text) FROM documents) = 0
       THEN 'pass' ELSE 'fail' END AS status"""
    )


DQ_EXPECTATIONS_ORACLE = _dq_oracle_sql()


def sample_priority_weighted(spark, sf_dir, k: int = 50):
    """Weighted sampling without replacement by PRIORITY SAMPLING
    (Duffield, Lund & Thorup, JACM 2007): each doc gets priority
    q = w/u with weight w = n_chars (the quality-weighted corpus
    subsample shape) and u a deterministic uniform; the sample is the
    top-k priorities. Chosen over Efraimidis–Spirakis u^(1/w) because
    the entire key path here is BIT-REPRODUCIBLE across engines:
    u = (h+1)/2^52 from a 52-bit md5 hash is exact (power-of-two
    divide), w is an exact small integer, and w/u is ONE correctly-
    rounded IEEE division — whereas pow/ln are transcendental and
    their last bits vary by libm, which would flip near-boundary
    selections between Spark and the oracle.

    Scale shape: the priority is a pure projection; top-k is
    TakeOrdered (per-partition heap + driver merge of k·partitions
    rows), no global sort, no shuffle of the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.expr(
            md5_long_pair("concat('ps:', doc_id)", hex_chars=13)[0]
        )
        + 1
    ).cast("double") / F.lit(float(1 << 52))
    return (
        docs.select(
            "doc_id",
            "n_chars",
            (F.col("n_chars").cast("double") / u).alias("priority"),
        )
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(k)
    )


SAMPLE_PRIORITY_ORACLE = """
SELECT doc_id, n_chars,
       CAST(n_chars AS DOUBLE)
       / ((CAST('0x' || substring(md5('ps:' || doc_id), 1, 13) AS BIGINT) + 1)
          / 4503599627370496.0) AS priority
FROM documents
ORDER BY priority DESC, doc_id LIMIT 50
"""


def events_funnel(spark, sf_dir):
    """Ordered-funnel analysis (view → click → purchase): per user, the
    first view, the first click within 1 day AFTER that view, and the
    first purchase within 1 day AFTER that click; emits per-stage
    conversion counts — the classic product-analytics operator (same
    semantics as ClickHouse `windowFunnel` in strict-order mode; the
    1-day cap is the discriminating knob: uncapped, this testdata's
    per-user event density converts everyone, giving 90/35/25 users at
    stages 1/2/3 at sf0.01 instead of 150-at-3).

    Scale shape: ONE user_id shuffle total. The earlier three-stage
    form (per-stage min-agg + join back) was semantically identical but
    scanned the fact three times and ran three barriered jobs —
    measured 9.7× DuckDB at sf10; this form collects each user's
    click/purchase times into per-user arrays during a single grouped
    aggregation (bounded by per-user history, the same bound any
    funnel engine needs) and resolves the staged time windows with
    array expressions — no second scan, no joins. A hot user costs one
    combiner merge of its arrays, not a sort."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    g = (
        ev.filter(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
                "t_view"
            ),
            F.collect_list(
                F.when(F.col("event_type") == "click", F.col("ts"))
            ).alias("clicks"),
            F.collect_list(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("purchases"),
        )
    )
    day = "INTERVAL 1 DAY"
    staged = g.filter(F.col("t_view").isNotNull()).selectExpr(
        "t_view",
        "array_min(filter(clicks, c -> c > t_view AND c <= t_view + "
        f"{day})) AS t_click",
        "purchases",
    ).selectExpr(
        "CASE WHEN t_click IS NULL THEN 1 "
        "WHEN array_min(filter(purchases, p -> p > t_click AND "
        f"p <= t_click + {day})) IS NOT NULL THEN 3 "
        "ELSE 2 END AS stage_reached"
    )
    return staged.groupBy("stage_reached").agg(
        F.count(F.lit(1)).alias("n_users")
    )


EVENTS_FUNNEL_ORACLE = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY 1),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t_view
    AND e.ts <= t1.t_view + INTERVAL 1 DAY GROUP BY 1),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t_click
    AND e.ts <= t2.t_click + INTERVAL 1 DAY GROUP BY 1)
SELECT CASE WHEN t3.user_id IS NOT NULL THEN 3
            WHEN t2.user_id IS NOT NULL THEN 2
            ELSE 1 END AS stage_reached,
       count(*) AS n_users
FROM t1 LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
GROUP BY 1
"""


def corpus_boilerplate_ngrams(spark, sf_dir, n: int = 5, min_df: int = 2):
    """Boilerplate detection by corpus-frequent n-grams (the
    CCNet/RefinedWeb "repeated template text" signal): a word 5-gram
    occurring in >= min_df DISTINCT docs is boilerplate; each doc gets
    its boilerplate fraction — the curation filter drops docs dominated
    by nav-bars / license headers / templated spans.

    Scale shape: per-doc dedup is an `array_distinct` on the shingle
    array BEFORE the explode (distinctness within a doc needs no
    shuffle, unlike `_doc_shingles(distinct=True)`'s pair-distinct),
    and every shingle is reduced to a 60-bit md5-derived key right
    after the explode, so the df shuffle and flag join carry 8-byte
    longs, not ~30-byte strings. (Hashing must follow the explode:
    hashing INSIDE the generator's input array re-evaluates the md5
    chain per emitted row — measured 90 s vs 17 s at sf10.) The hash
    is engine-portable, so the ORACLE keys on the identical value and
    any collision merges the same counts on both sides. The keyed
    frame feeds two consumers (df counts and the flag join), so it is
    cached like `jaccard_pairs`' shingle set (at 100 TB:
    persist(DISK_ONLY)); document frequency is ONE shuffle with
    map-side partial counts; only the df≥min_df survivors — the
    boilerplate set, ~3.5% of the vocabulary here — feed the LEFT
    flag join; the per-doc rollup is the second real shuffle. No
    doc×doc work — O(corpus shingles) end to end. sf10: 32 s → 5.5–7 s
    steady-state (0.6× DuckDB's 10.7 s)."""
    from ..functions.text import words
    from .dedup import _shingle_arr_sql

    docs = load_table(spark, sf_dir, "documents")
    warr = docs.select("doc_id", words(F.col("text")).alias("w"))
    ds = (
        warr.selectExpr(
            "doc_id",
            f"explode(array_distinct({_shingle_arr_sql(n)})) AS shingle",
        )
        .selectExpr(
            "doc_id",
            f"{md5_long_pair('shingle')[0]} AS h",
        )
        .cache()
    )
    boiler = (
        ds.groupBy("h")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("h", F.lit(1).alias("flag"))
    )
    return (
        ds.join(boiler, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("flag"), F.lit(0))).alias("n_boiler"),
            F.round(
                F.sum(F.coalesce(F.col("flag"), F.lit(0)))
                / F.count("*").cast("double"),
                6,
            ).alias("boiler_frac"),
        )
    )


BOILERPLATE_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
sh AS (SELECT doc_id, array_to_string(w[i.i:i.i+4], ' ') AS shingle
       FROM toks,
            LATERAL (SELECT unnest(generate_series(1, greatest(len(w)-4, 1))) AS i) i),
dsx AS (SELECT DISTINCT doc_id, shingle FROM sh),
ds AS (SELECT doc_id,
              CAST('0x' || substring(md5(shingle), 1, 15) AS BIGINT) AS h
       FROM dsx),
dfreq AS (SELECT h, count(*) AS df FROM ds GROUP BY 1)
SELECT ds.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS boiler_frac
FROM ds JOIN dfreq ON ds.h = dfreq.h
GROUP BY 1
"""


def corpus_split_by_group(spark, sf_dir):
    """Leak-proof train/val/test split: the assignment hashes the GROUP
    key (``source`` here — a web corpus would use the URL domain), so
    every document of a group lands on the same side and near-duplicate
    documents inside a group can never straddle train/eval — the
    contamination mode a per-doc hash split (`corpus_train_val_split`)
    cannot prevent. Zero shuffle — pure projection, engine-portable md5
    bucket. Group atomicity's accepted cost: realized rates converge to
    90/5/5 only in expectation over groups, so split-rate monitoring
    belongs with dq_expectations, not here."""
    docs = load_table(spark, sf_dir, "documents")
    _gs_hash = md5_long_pair("concat('groupsplit:', source)")[0]
    h = f"pmod({_gs_hash}, 100)"
    return docs.selectExpr(
        "doc_id",
        "source",
        f"""CASE WHEN {h} < 90 THEN 'train'
                 WHEN {h} < 95 THEN 'val'
                 ELSE 'test' END AS split""",
    )


SPLIT_BY_GROUP_ORACLE = """
SELECT doc_id, source,
       CASE WHEN CAST('0x' || substring(md5('groupsplit:' || source), 1, 15)
                 AS BIGINT) % 100 < 90 THEN 'train'
            WHEN CAST('0x' || substring(md5('groupsplit:' || source), 1, 15)
                 AS BIGINT) % 100 < 95 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def embedding_outlier_scores(spark, sf_dir, k: int = 20):
    """Embedding data-quality scan: per-vector squared distance to its
    OWN label centroid, z-scored within the label, top-k most anomalous
    vectors — the mislabeled/garbage-embedding detector that runs before
    semantic dedup trusts the vectors.

    Scale shape: centroids are a (label, dim) aggregation of the
    exploded fact (one shuffle, map-side combining into ≤labels×dims
    groups, scale-9 fixed point); per-vector distances re-aggregate the
    exploded fact keyed vec_id, but the accumulated state is a scale-12
    BIGINT fixed-point (x−μ)² — integer addition is exact and
    order-free like decimal, and unlike decimal it stays inside
    whole-stage codegen with map-side combine, so the exchange carries
    one packed row per vector. (Two slower forms were measured at sf10
    and rejected: decimal(28,18) accumulation through the same shuffle
    at 16.7 s — BigDecimal state defeats codegen — and a zip_with/
    aggregate in-array decimal fold at 19 s — higher-order lambdas
    evaluate interpreted per element. The fixed-point shuffle runs the
    same plan shape in a fraction of that.) A vector's fixed-point sum
    is ≤64·1e14 < 2⁵³, so the final cast to double is itself exact.
    Label stats are a labels-sized aggregation joined back by
    broadcast; top-k rides TakeOrderedAndProject with a vec_id
    tie-break.

    Determinism: integer/decimal-exact sums at every accumulation
    (float sums are partition-order-dependent), one rounding at each
    emission, and the mean/var/z arithmetic is the IDENTICAL IEEE op
    sequence on both engines (single divisions of exact sums, var
    clamped ≥0 before sqrt)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )
    # scale-9 fixed point: x ≤ ~5 → x_fp ≤ 5e9, so a per-(label,dim)
    # bigint sum holds ~1.8e9 vectors per label before overflow (the
    # next scale step down buys another 1000×). Measured vs a
    # decimal(28,18) accumulation of the same mean: 3.1 s vs 7.8 s at
    # sf10 — BigDecimal agg state defeats whole-stage codegen.
    x_fp = F.round(F.col("x") * F.lit(1e9)).cast("bigint")
    mu = dims.groupBy("label", "dim").agg(
        F.round(
            F.sum(x_fp).cast("double") / F.lit(1e9) / F.count(F.lit(1)),
            6,
        ).alias("mu")
    )
    sq_fp = F.round(
        (F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu")) * F.lit(1e12)
    ).cast("bigint")
    dist = (
        dims.join(F.broadcast(mu), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sum(sq_fp).cast("double") / F.lit(1e12),
                6,
            ).alias("d")
        )
    )
    stats = dist.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("d").cast("decimal(28,6)")).cast("double").alias("sd"),
        F.sum(
            (F.col("d") * F.col("d")).cast("decimal(38,12)")
        ).cast("double").alias("sd2"),
    )
    scored = dist.join(F.broadcast(stats), "label").select(
        "vec_id",
        "label",
        "d",
        (F.col("sd") / F.col("n")).alias("_mean"),
        F.sqrt(
            F.greatest(
                F.col("sd2") / F.col("n")
                - (F.col("sd") / F.col("n")) * (F.col("sd") / F.col("n")),
                F.lit(0.0),
            )
        ).alias("_std"),
    )
    return (
        scored.select(
            "vec_id",
            "label",
            F.col("d").alias("dist_sq"),
            F.round((F.col("d") - F.col("_mean")) / F.col("_std"), 4).alias(
                "z"
            ),
        )
        .orderBy(F.col("z").desc(), "vec_id")
        .limit(k)
    )


EMBEDDING_OUTLIER_ORACLE = """
WITH dims AS (
  SELECT vec_id, label, u.dim - 1 AS dim, u.x AS x
  FROM embeddings,
       LATERAL (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
                       generate_subscripts(embedding, 1) AS dim) u),
mu AS (
  SELECT label, dim,
         round(CAST(sum(CAST(round(x * 1e9) AS BIGINT)) AS DOUBLE)
               / 1e9 / count(*), 6) AS mu
  FROM dims GROUP BY label, dim),
dist AS (
  SELECT vec_id, d.label,
         round(CAST(sum(CAST(round((x - mu) * (x - mu) * 1e12) AS BIGINT))
               AS DOUBLE) / 1e12, 6) AS d
  FROM dims d JOIN mu ON d.label = mu.label AND d.dim = mu.dim
  GROUP BY 1, 2),
stats AS (
  SELECT label, count(*) AS n,
         CAST(sum(CAST(d AS DECIMAL(28,6))) AS DOUBLE) AS sd,
         CAST(sum(CAST(d * d AS DECIMAL(38,12))) AS DOUBLE) AS sd2
  FROM dist GROUP BY 1)
SELECT vec_id, dist.label, d AS dist_sq,
       round((d - sd / n) / sqrt(greatest(sd2 / n - (sd / n) * (sd / n),
                                          0.0)), 4) AS z
FROM dist JOIN stats ON dist.label = stats.label
ORDER BY z DESC, vec_id
LIMIT 20
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "corpus_split_by_group", corpus_split_by_group, SPLIT_BY_GROUP_ORACLE
    ),
    QuerySpec(
        "embedding_outlier_scores",
        embedding_outlier_scores,
        EMBEDDING_OUTLIER_ORACLE,
    ),
    QuerySpec("corpus_top_bigrams", corpus_top_bigrams, TOP_BIGRAMS_ORACLE),
    QuerySpec("dq_expectations", dq_expectations, DQ_EXPECTATIONS_ORACLE),
    QuerySpec("canonicalize_corpus", canonicalize_corpus, CANONICALIZE_ORACLE),
    QuerySpec("vocab_coverage", vocab_coverage, VOCAB_COVERAGE_ORACLE),
    QuerySpec(
        "corpus_boilerplate_ngrams", corpus_boilerplate_ngrams, BOILERPLATE_ORACLE
    ),
    QuerySpec(
        "sample_stratified_exact", sample_stratified_exact, SAMPLE_STRATIFIED_ORACLE
    ),
    QuerySpec("events_funnel", events_funnel, EVENTS_FUNNEL_ORACLE),
    QuerySpec(
        "sample_priority_weighted", sample_priority_weighted, SAMPLE_PRIORITY_ORACLE
    ),
    QuerySpec(
        "embedding_label_centroids", embedding_label_centroids, LABEL_CENTROID_ORACLE
    ),
    QuerySpec(
        "embedding_dim_stats", embedding_dim_stats, DIM_STATS_ORACLE
    ),
    QuerySpec("curate_corpus", curate_corpus, CURATE_ORACLE),
    QuerySpec("corpus_token_stats", corpus_token_stats, CORPUS_STATS_ORACLE),
    QuerySpec("quality_filter", quality_filter, QUALITY_FILTER_ORACLE),
    # iterative CC; oracle = recursive-CTE min-label propagation
    QuerySpec("duplicate_clusters", duplicate_clusters, DUPLICATE_CLUSTERS_ORACLE),
    QuerySpec("corpus_train_val_split", corpus_train_val_split, SPLIT_ORACLE),
    QuerySpec("corpus_sample_mix", corpus_sample_mix, SAMPLE_MIX_ORACLE),
    QuerySpec("corpus_pack_sequences", corpus_pack_sequences, PACK_ORACLE),
    QuerySpec(
        "corpus_shard_manifest", corpus_shard_manifest, shard_manifest_oracle_sql()
    ),
    QuerySpec("corpus_decontaminate", corpus_decontaminate, DECONTAMINATE_ORACLE),
]
