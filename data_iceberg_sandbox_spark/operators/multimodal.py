"""Multimodal column plumbing ([EXT] scope, SURVEY §7 Phase 4).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct — the Spark-side contract a 100 TB media pipeline needs: schema,
partitioning, Arrow batch shape, and Pandas-UDF signatures are all real
and tested; only the codec call itself is stubbed (no image/audio
libraries in this container) behind ``real_decode=True`` →
NotImplementedError, with a deterministic fake standing in (payload =
utf-8 bytes of the document text, features = byte statistics).

Scale notes: payloads travel executor-side only (never .collect()-ed);
feature extraction is ``mapInPandas`` — per-partition Arrow batches, so
the decode loop is vectorized Python over columnar buffers, the
documented slow-path pattern. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to keep peak memory =
batch_rows × payload_size regardless of partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .spec import QuerySpec

_MIMES = ["image/png", "audio/wav", "video/mp4"]


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents rendered as a media table: binary payload + typed
    metadata struct (mime, dimensions derived deterministically)."""
    docs = load_table(spark, sf_dir, "documents")
    mime = F.element_at(
        F.array(*[F.lit(m) for m in _MIMES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        ).alias("meta"),
    )


def mm_metadata(spark, sf_dir):
    """Typed metadata projection over the media table (no payload moves
    to the driver; column pruning drops the binary at the scan)."""
    m = synth_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


MM_METADATA_ORACLE = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image/png'
                       WHEN 1 THEN 'audio/wav'
                       ELSE 'video/mp4' END AS mime,
       octet_length(encode(text)) AS n_bytes,
       CAST(n_chars % 640 + 1 AS INT) AS width,
       CAST(n_chars % 480 + 1 AS INT) AS height
FROM documents
"""


# shared constants feeding BOTH the operator and its oracle (r13
# review: the oracle hardcoded 10/100 while fps_step was a parameter —
# a non-default caller was silently graded against the default plan)
FPS_STEP = 10
BYTES_PER_FRAME = 100


def mm_frame_sample(spark, sf_dir, fps_step: int = FPS_STEP):
    """Frame sampling plan for video rows: every fps_step-th synthetic
    frame (1 frame per BYTES_PER_FRAME payload bytes) — pure
    arithmetic, the real sampler swaps in at the decode stub. The
    registered oracle is generated from the same constants
    (mm_frame_sample_oracle_sql), so a parameterized call needs the
    matching parameterized oracle."""
    m = synth_media(spark, sf_dir).filter(F.col("meta.mime") == "video/mp4")
    n_frames = (F.col("meta.n_bytes") / BYTES_PER_FRAME).cast("int") + 1
    n_sampled = ((n_frames - 1) / fps_step).cast("int") + 1
    return m.select(
        "doc_id",
        n_frames.alias("n_frames"),
        n_sampled.alias("n_sampled"),
        F.lit(0).alias("first_frame"),
        ((n_sampled - 1) * fps_step).alias("last_frame"),
    )


def mm_frame_sample_oracle_sql(fps_step: int = FPS_STEP) -> str:
    return f"""
WITH v AS (
  SELECT doc_id,
         octet_length(encode(text)) // {BYTES_PER_FRAME} + 1 AS n_frames
  FROM documents WHERE doc_id % 3 = 2)
SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
       CAST((n_frames - 1) // {fps_step} + 1 AS INT) AS n_sampled,
       0 AS first_frame,
       CAST(((n_frames - 1) // {fps_step}) * {fps_step} AS INT) AS last_frame
FROM v
"""


MM_FRAME_SAMPLE_ORACLE = mm_frame_sample_oracle_sql()


def decode_features(
    media: DataFrame, real_decode: bool = False, batch_rows: int = 256
) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas.

    With ``real_decode`` the codec hook raises NotImplementedError (no
    media libs in this container — swap in PIL/torchaudio/pyav there).
    The deterministic fake extracts byte statistics so the full Arrow
    round-trip (binary in, features out) is exercised and testable.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for whole in batches:
            if real_decode:
                raise NotImplementedError(
                    "codec decode requires image/audio libraries not present "
                    "in this container; wire PIL/pyav here"
                )
            # chunk the incoming Arrow batch to `batch_rows` so peak
            # processing/output memory is bounded by batch_rows ×
            # payload size regardless of the session's
            # maxRecordsPerBatch (r12 review: the parameter was dead
            # and the documented bound a no-op)
            for lo in range(0, len(whole), batch_rows):
                pdf = whole.iloc[lo : lo + batch_rows]
                yield _extract_one(pdf)

    def _extract_one(pdf: pd.DataFrame) -> pd.DataFrame:
            payloads = pdf["payload"]
            n = payloads.str.len()

            def _mean(b: bytes) -> float:
                # half-up at 6 dp in INTEGER arithmetic, then one IEEE
                # division — bit-identical to the DuckDB oracle's
                # (2*s*1000000 + n) // (2*n) / 1e6 (a float round() would
                # diverge on exact midpoints: numpy rounds half-even,
                # DuckDB half-away)
                if not b:
                    return 0.0
                s, ln = sum(b), len(b)
                return (2 * s * 1_000_000 + ln) // (2 * ln) / 1e6

            return pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n.astype("int64"),
                    "mean_byte": payloads.map(_mean),
                }
            )

    flat = media.select(
        "doc_id", F.col("meta.mime").alias("mime"), "payload"
    )
    return flat.mapInPandas(
        extract,
        schema="doc_id long, mime string, n_bytes long, mean_byte double",
    )


def mm_decode_features(spark, sf_dir):
    # memory bounding now happens INSIDE the kernel (decode_features
    # chunks to batch_rows) — the old session-global
    # maxRecordsPerBatch=256 mutation leaked into every later Arrow
    # path in the session (r12 review)
    return decode_features(synth_media(spark, sf_dir), batch_rows=256)


# The shipped fake is DETERMINISTIC (payload = utf-8 bytes of text), so
# its outputs are replayable in pure SQL and the hash check covers the
# actual emitted values (VERDICT r3 item 3). The oracle's byte-sum ==
# codepoint-sum identity only holds for pure-ASCII text; the guarded
# n_bytes below raises a named error() on the first non-ASCII row
# (ADVICE r4), so a future non-ASCII corpus fails loudly instead of
# surfacing as an opaque hash mismatch. half-up at 6 dp in integer
# arithmetic mirrors the Python side exactly.
MM_DECODE_FEATURES_ORACLE = """
WITH b AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image/png'
                         WHEN 1 THEN 'audio/wav'
                         ELSE 'video/mp4' END AS mime,
         CASE WHEN octet_length(encode(text)) = length(text)
              THEN octet_length(encode(text))
              ELSE CAST(error('mm_decode_features oracle assumes an '
                   || 'ASCII corpus (byte sum == codepoint sum); '
                   || 'non-ASCII text at doc_id ' || doc_id) AS BIGINT)
         END AS n_bytes,
         list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS s
  FROM documents)
SELECT doc_id, mime, CAST(n_bytes AS BIGINT) AS n_bytes,
       CASE WHEN n_bytes = 0 THEN 0.0
            ELSE CAST((2*s*1000000 + n_bytes) // (2*n_bytes) AS DOUBLE)
                 / 1000000 END AS mean_byte
FROM b
"""


SPECS: list[QuerySpec] = [
    QuerySpec("mm_metadata", mm_metadata, MM_METADATA_ORACLE),
    QuerySpec("mm_frame_sample", mm_frame_sample, MM_FRAME_SAMPLE_ORACLE),
    # pandas-UDF path; oracle replays the deterministic fake bit-exactly
    QuerySpec("mm_decode_features", mm_decode_features, MM_DECODE_FEATURES_ORACLE),
]
