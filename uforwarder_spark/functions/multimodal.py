"""D12: multimodal-column plumbing — opaque binary payloads with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic stub (`_fake_decode`); everything around it
— binary column handling, metadata struct, output schema, Arrow batch
shape, partitioning — is the real plumbing a decode/feature-extract
stage needs.

SCALE: mapInPandas streams Arrow batches through Python with bounded
memory (spark.sql.execution.arrow.maxRecordsPerBatch); payload bytes
never shuffle — the stage is a pure map, and downstream aggs see only
the small extracted features. This is the pattern for image resize /
frame sampling / audio features at 100 TB: partition by file locality,
keep binaries out of shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import load_table
from ..registry import register

OUT_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, n_frames int, checksum string"
)


# The deterministic stub makes the Python decode path fully auditable in
# SQL: the checksum is md5 over the utf-8 payload and the fake dims are
# pure arithmetic on its byte length — so the Arrow/mapInPandas plumbing
# (schema, batching, byte handling) is verified end-to-end against DuckDB.
MULTIMODAL_ORACLE = """
SELECT doc_id,
       'application/octet-stream' AS mime,
       CAST(strlen(text) AS BIGINT)      AS n_bytes,
       CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
       CAST(strlen(text) % 480 + 1 AS INTEGER) AS height,
       CAST(strlen(text) % 30 + 1 AS INTEGER)  AS n_frames,
       md5(text) AS checksum
FROM documents
"""


@register("multimodal_meta", MULTIMODAL_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: documents' text bytes stand in for an
    image/audio payload; typed metadata travels alongside; mapInPandas
    runs the (stubbed) decode and emits features only.

    SCALE: pure Arrow-batched map — payload bytes never shuffle; see the
    module docstring for the 100 TB layout.

    The decode functions are CLOSURES so cloudpickle ships them by value
    — Python workers never need `uforwarder_spark` importable (the
    driver may run from any cwd without shipping the package)."""

    def fake_decode(payload: bytes) -> tuple[int, int, int]:
        # STUB decode: real impl would use PIL/ffmpeg (not in container).
        # Deterministic fake dims from payload size keep tests stable.
        n = len(payload)
        return (n % 640 + 1, n % 480 + 1, n % 30 + 1)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            widths, heights, frames, checks = [], [], [], []
            for payload in pdf["payload"]:
                w, h, f = fake_decode(payload)
                widths.append(w)
                heights.append(h)
                frames.append(f)
                checks.append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                    "checksum": checks,
                }
            )

    docs = load_table(spark, sf_dir, "documents")
    bins = docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )
    return bins.mapInPandas(decode_batches, schema=OUT_SCHEMA)


# --- D29 -----------------------------------------------------------------
N_FRAMES = 4
FRAME_LEN = 16

# Deterministic stub again (no video codecs in the container): a "frame"
# is a 16-byte slice at k*n/4 — so the whole Arrow pipeline (binary
# slicing, per-frame fan-out, checksum) is SQL-auditable end-to-end.
FRAME_SAMPLE_ORACLE = f"""
WITH frames AS (
  SELECT d.doc_id, d.text,
         f.frame_idx,
         (f.frame_idx * strlen(d.text)) // {N_FRAMES} AS frame_off,
         strlen(d.text) AS n
  FROM documents d
  CROSS JOIN (VALUES (0), (1), (2), (3)) AS f(frame_idx)
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_off AS BIGINT) AS frame_off,
       CAST(least({FRAME_LEN}, n - frame_off) AS BIGINT) AS frame_len,
       md5(substr(text, CAST(frame_off + 1 AS INT), {FRAME_LEN})) AS frame_checksum
FROM frames
"""


@register("multimodal_frame_sample", FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over an opaque video/audio payload: each binary
    blob yields N_FRAMES evenly-spaced fixed-size frames (byte slices
    under the stub; ffmpeg keyframe extraction in production), fanned
    out to one row per frame with offset/length/checksum — the shape a
    frame-embedding or thumbnailing stage consumes.

    Real-decode swap point: replace ``sample_frames``'s slicing with the
    codec call; schema, batching, and partitioning stay as-is.

    SCALE: mapInPandas fan-out keeps payload bytes OUT of any shuffle —
    the 1:N explosion happens inside the Arrow batch and only the small
    frame features leave the stage; batch memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch. Closure-pickled like
    D12 (workers never import the package)."""

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "frame_off": [],
                "frame_len": [],
                "frame_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for k in range(N_FRAMES):
                    off = k * n // N_FRAMES
                    frame = payload[off : off + FRAME_LEN]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame_off"].append(off)
                    out["frame_len"].append(len(frame))
                    out["frame_checksum"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    docs = load_table(spark, sf_dir, "documents")
    bins = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return bins.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx int, frame_off long, frame_len long, frame_checksum string",
    )
