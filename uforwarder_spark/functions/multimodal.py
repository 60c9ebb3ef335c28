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


# --- D46 -----------------------------------------------------------------
RESIZE_BOX = 224  # target box (CLIP/ViT-style), aspect-preserving, no upscale

# Deterministic stub once more (no PIL in the container): input dims are
# D12's fake decode, the letterbox math (scale = min(box/w, box/h, 1),
# floor'd output dims, 3-byte RGB estimate) is pure arithmetic, and the
# "resized payload" checksum is md5 over checksum:WxH — so the whole
# resize stage is SQL-auditable while the real PIL.thumbnail swap point
# stays a one-function change.
RESIZE_ORACLE = f"""
WITH dec AS (
  SELECT doc_id,
         CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
         CAST(strlen(text) % 480 + 1 AS INTEGER) AS height,
         md5(text) AS checksum
  FROM documents
),
s AS (
  SELECT *,
         least({RESIZE_BOX}.0 / width, {RESIZE_BOX}.0 / height, 1.0) AS sc
  FROM dec
)
SELECT doc_id, width, height,
       CAST(greatest(1, floor(width * sc)) AS INTEGER)  AS out_width,
       CAST(greatest(1, floor(height * sc)) AS INTEGER) AS out_height,
       round(sc, 6) AS scale,
       CAST(greatest(1, floor(width * sc)) * greatest(1, floor(height * sc)) * 3 AS BIGINT)
         AS out_bytes,
       md5(checksum || ':' ||
           CAST(CAST(greatest(1, floor(width * sc)) AS INTEGER) AS VARCHAR) || 'x' ||
           CAST(CAST(greatest(1, floor(height * sc)) AS INTEGER) AS VARCHAR))
         AS resized_checksum
FROM s
"""


def letterbox(w: int, h: int, box: int):
    """Aspect-preserving letterbox of (w, h) into a box² target, never
    upscaling — shared by every decoder so the geometry rule cannot
    drift between the stub and a real decode. Returns
    (out_w, out_h, scale rounded 6 dp, the engines' half-away-from-zero
    rounding — numpy/py round half-to-even, emulated explicitly)."""
    import math

    sc = min(box / w, box / h, 1.0)
    ow = max(1, int(math.floor(w * sc)))
    oh = max(1, int(math.floor(h * sc)))
    return ow, oh, math.floor(sc * 1e6 + 0.5) / 1e6


def stub_decode_resize(payload: bytes, box: int):
    """The deterministic stand-in decoder (SQL-auditable: dims derive
    from the byte length, the resized checksum re-hashes the payload
    hash with the output dims). Contract shared by every decoder:
    (width, height, out_w, out_h, scale6, out_bytes, resized_checksum)."""
    import hashlib

    n = len(payload)
    w, h = n % 640 + 1, n % 480 + 1
    ow, oh, sc6 = letterbox(w, h, box)
    checksum = hashlib.md5(payload).hexdigest()
    return (
        w, h, ow, oh, sc6, ow * oh * 3,
        hashlib.md5(f"{checksum}:{ow}x{oh}".encode()).hexdigest(),
    )


def ppm_decode_resize(payload: bytes, box: int):
    """REAL image decode + resize with zero optional dependencies: a
    binary PPM (P6) parser + numpy nearest-neighbor letterbox resample.
    Decodes the actual header dims, resamples the actual pixel array,
    and checksums the actual resized RGB bytes — the integration test
    (tests/test_swap_points.py) drives the full Spark pipeline through
    this decoder, proving the real-decode swap is exactly one function
    (PIL differs only in Image.open/thumbnail inside the same
    contract)."""
    import hashlib

    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM payload")
    # P6 header: magic, width, height, maxval — whitespace-separated
    # tokens, '#' comments running to end-of-line allowed between them;
    # the raster starts EXACTLY ONE whitespace byte after the maxval
    # token (per the netpbm spec — anchoring at the payload end instead
    # would misalign on files with trailing bytes; review r08).
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        toks.append(payload[start:pos])
    w, h, maxval = (int(t) for t in toks)
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raster = pos + 1  # the single whitespace byte after maxval
    if len(payload) < raster + w * h * 3:
        raise ValueError("truncated PPM raster")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=raster).reshape(
        h, w, 3
    )
    ow, oh, sc6 = letterbox(w, h, box)
    ys = (np.arange(oh) * h) // oh
    xs = (np.arange(ow) * w) // ow
    resized = px[ys][:, xs]
    return (
        w, h, ow, oh, sc6, ow * oh * 3,
        hashlib.md5(resized.tobytes()).hexdigest(),
    )


def pil_decode_resize(payload: bytes, box: int):
    """The PIL-backed decoder for real image formats (PNG/JPEG/...):
    same contract, one function — tested when PIL is installed
    (tests/test_swap_points.py skips otherwise; this container ships
    without it)."""
    import hashlib
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("RGB")
    w, h = img.size
    ow, oh, sc6 = letterbox(w, h, box)
    resized = img.resize((ow, oh), Image.NEAREST)
    return (
        w, h, ow, oh, sc6, ow * oh * 3,
        hashlib.md5(resized.tobytes()).hexdigest(),
    )


def multimodal_resize_frame(
    bins: DataFrame, decode_resize=None, on_error: str = "raise"
) -> DataFrame:
    """The D46 pipeline over any (doc_id, payload binary) frame with a
    pluggable decoder — `decode_resize` IS the swap point: the Spark
    plumbing (schema, Arrow batching, payload isolation) is identical
    for the stub, the dependency-free PPM decoder, and PIL.

    Default (None) uses a fully-inline copy of the stub so the
    registered operator's closure stays SELF-CONTAINED — cloudpickle
    serializes a module-level function by reference, which would force
    executors to import this package (the D12 contract forbids that);
    a caller-supplied decoder is the caller's deployment choice.

    Error policy (`on_error`): real decoders raise on corrupt payloads,
    and with the default "raise" one bad image fails the Spark stage —
    correct for the oracle-checked stub (its inputs cannot be corrupt)
    but wrong for a production decode over scraped data. "skip" drops
    rows whose decode raises; "null" keeps every row, nulling the seven
    decode columns and adding a `decode_error` string column (null on
    success) so the corpus can audit its corruption rate. The policy is
    applied per row INSIDE the Arrow batch loop — a corrupt payload can
    never kill the job under "skip"/"null"."""
    if on_error not in ("raise", "skip", "null"):
        raise ValueError(f"on_error must be raise|skip|null, got {on_error!r}")
    if decode_resize is None:
        box = RESIZE_BOX

        def decode_resize(payload: bytes, _box: int = box):  # noqa: F811
            import hashlib
            import math

            n = len(payload)
            w, h = n % 640 + 1, n % 480 + 1
            sc = min(_box / w, _box / h, 1.0)
            ow = max(1, int(math.floor(w * sc)))
            oh = max(1, int(math.floor(h * sc)))
            checksum = hashlib.md5(payload).hexdigest()
            return (
                w, h, ow, oh,
                math.floor(sc * 1e6 + 0.5) / 1e6,
                ow * oh * 3,
                hashlib.md5(f"{checksum}:{ow}x{oh}".encode()).hexdigest(),
            )

    with_err = on_error == "null"

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "width", "height", "out_width", "out_height",
            "scale", "out_bytes", "resized_checksum",
        )
        for pdf in batches:
            out = {"doc_id": []}
            out.update({c: [] for c in cols})
            if with_err:
                out["decode_error"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    vals = decode_resize(bytes(payload), RESIZE_BOX)
                    err = None
                except Exception as exc:  # noqa: BLE001 — policy boundary
                    if on_error == "raise":
                        raise
                    if on_error == "skip":
                        continue
                    vals = (None,) * len(cols)
                    err = f"{type(exc).__name__}: {exc}"
                out["doc_id"].append(doc_id)
                for c, v in zip(cols, vals):
                    out[c].append(v)
                if with_err:
                    out["decode_error"].append(err)
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, width int, height int, out_width int, out_height int, "
        "scale double, out_bytes long, resized_checksum string"
    )
    if with_err:
        schema += ", decode_error string"
    return bins.mapInPandas(resize_batches, schema=schema)


@register("multimodal_resize", RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing over the opaque binary column: decode dims
    (D12's stub), compute the aspect-preserving letterbox into a
    RESIZE_BOX² target (never upscaling), and emit output dims / scale /
    RGB byte estimate / resized-payload checksum — the stage that feeds
    a vision-encoder batch at a fixed input size.

    Real-decode swap point — now EXERCISED, not just documented: the
    kernel is `multimodal_resize_frame(bins, decode_resize=...)`;
    `ppm_decode_resize` (dependency-free real pixel decode + resample)
    and `pil_decode_resize` run through the identical Spark plumbing in
    tests/test_swap_points.py. This registered operator keeps the
    SQL-auditable stub so the DuckDB oracle stays exact.

    SCALE: same contract as D12/D29 — mapInPandas streams Arrow batches
    with bounded memory, payload bytes never shuffle (the stage is a
    pure map and only the small dim/checksum features leave it), and
    the work is embarrassingly parallel over file splits. Closure-
    pickled; workers never import the package."""
    docs = load_table(spark, sf_dir, "documents")
    bins = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return multimodal_resize_frame(bins)


# --- D64 -----------------------------------------------------------------
# Perceptual-hash (aHash) dedup over the binary column: the canonical
# image-corpus dedup at LAION scale — fingerprint each payload with a
# 64-bit average-hash, exact-dup by full-hash groups, near-dup by
# SimHash-style banding + Hamming verification. Deterministic stub once
# more (no PIL in the container): the 8x8 "pixel grid" is 64 bytes
# sampled evenly from the payload (real impl: grayscale 8x8 downsample
# luminance — a one-function swap), the mean threshold is exact integer
# arithmetic (pixel*64 >= sum, no float mean), so the whole stage is
# SQL-auditable end-to-end. Assumes ASCII payloads for byte==char
# equivalence (true of the driver corpus; irrelevant after the PIL swap).
PHASH_BITS = 64
PHASH_BANDS = 4  # 4 bands x 16 bits
PHASH_BAND_LEN = PHASH_BITS // PHASH_BANDS
PHASH_HAM_T = 6  # near-dup Hamming threshold
# Degenerate-band cap (the D30 boilerplate-df-cap pattern): a band value
# shared by more than this many DISTINCT hashes is low-information (the
# all-ones band of bright images, the all-zeros band of dark ones) and
# is skipped for candidate generation — its members stay reachable
# through their other, discriminative bands. Without the cap one
# degenerate bucket makes the band join quadratic in corpus size.
PHASH_BAND_DF_CAP = 64

PHASH_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, strlen(text) AS n FROM documents WHERE strlen(text) > 0
),
px AS (
  SELECT doc_id,
         list_transform(range({PHASH_BITS}),
           i -> ord(substr(text, CAST((i * n) // {PHASH_BITS} AS INT) + 1, 1))) AS ps
  FROM d
),
ph AS (
  SELECT doc_id,
         array_to_string(list_transform(range({PHASH_BITS}),
           i -> CASE WHEN ps[i + 1] * {PHASH_BITS} >= list_sum(ps)
                THEN '1' ELSE '0' END), '') AS phash
  FROM px
),
g AS (
  SELECT phash, min(doc_id) AS canonical_id, CAST(count(*) AS BIGINT) AS n_exact
  FROM ph GROUP BY phash
),
bands AS (
  SELECT phash, b.b,
         substr(phash, b.b * {PHASH_BAND_LEN} + 1, {PHASH_BAND_LEN}) AS bv
  FROM g CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(b)
),
band_df AS (
  SELECT b, bv FROM bands GROUP BY b, bv
  HAVING count(*) <= {PHASH_BAND_DF_CAP}
),
live AS (
  SELECT bands.* FROM bands JOIN band_df USING (b, bv)
),
hcand AS (
  SELECT DISTINCT a.phash AS pa, x.phash AS pb
  FROM live a JOIN live x ON a.b = x.b AND a.bv = x.bv AND a.phash <> x.phash
),
hnear AS (
  SELECT hcand.pa AS phash, CAST(sum(gb.n_exact) AS BIGINT) AS n_near
  FROM hcand JOIN g gb ON gb.phash = hcand.pb
  WHERE list_sum(list_transform(range({PHASH_BITS}),
          i -> CASE WHEN substr(pa, i + 1, 1) <> substr(pb, i + 1, 1)
               THEN 1 ELSE 0 END)) <= {PHASH_HAM_T}
  GROUP BY hcand.pa
)
SELECT ph.doc_id, ph.phash, g.canonical_id,
       ph.doc_id <> g.canonical_id AS is_exact_dup,
       g.n_exact - 1 + coalesce(hnear.n_near, 0) AS n_near_dups
FROM ph
JOIN g USING (phash)
LEFT JOIN hnear USING (phash)
"""


@register("multimodal_phash_dedup", PHASH_ORACLE)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over the opaque image column: mapInPandas
    computes each payload's 64-bit average-hash (aHash — the stub
    samples 64 payload bytes for the 8x8 grid; production swaps in
    grayscale-downsample luminance, one function), then pure DataFrame
    ops do the corpus-scale dedup: exact groups by full hash
    (canonical = min doc_id), near-dup candidates from 4x16-bit
    SimHash-style bands, Hamming <= {PHASH_HAM_T} verification on
    candidates only. Output per doc: fingerprint, canonical id, exact-
    dup verdict, verified near-dup count.

    Exactness: the threshold is integer arithmetic (pixel*64 >= sum —
    no float mean), the hash is a bit STRING (no 2^63 sign trap), and
    band/Hamming comparisons are exact string ops — bit-identical
    cross-engine.

    SCALE: fingerprints are a pure Arrow map (payload bytes never
    shuffle — only the 64-char hash leaves the stage); the exact group
    agg shuffles 64-byte keys; the band join shuffles 4 rows per doc
    and candidates are band-bucket-bounded, never all-pairs (the D2
    argument; a boilerplate image cluster is the AQE skew-join case the
    band-join skew test covers). Hamming runs only on candidates.
    Closure-pickled like D12 (workers never import the package).

    Fingerprint/band/Hamming logic is the SHARED ``phash_frame`` /
    ``phash_bands_frame`` / ``_PHASH_HAM`` kernels (also used by D65 and
    E28) — one definition, so the documented batch/incremental/live
    agreement cannot drift (ADVICE r05)."""
    docs = load_table(spark, sf_dir, "documents")
    bins = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    # ph persists LAZILY and g checkpoints EAGERLY, in this order on
    # purpose: g's checkpoint job is ph's only consumer at that moment,
    # so it populates ph's cache race-free as a side effect (one job,
    # one Arrow-kernel pass), and the final action then cache-hits ph
    # while every other branch reads the materialized g. Both-persist
    # raced (concurrent branch stages re-ran the kernel per reference:
    # CPU med 8.6 vs 1.0 s interleaved at sf0.1); both-checkpoint paid
    # a SECOND serialized job + block write for the same safety (the
    # r13 bench's one normal-window breach, 1.7x pin). Not unpersisted:
    # the returned plan is lazy — the _emb rule.
    ph = phash_frame(bins).persist()
    g = ph.groupBy("phash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").cast("bigint").alias("n_exact"),
    ).localCheckpoint()  # both the band pipeline and the final join read g
    # EVERYTHING pairwise below runs on DISTINCT hashes (g), never docs:
    # same-hash neighbors are Hamming-0 near-dups BY DEFINITION, so a
    # doc's near count = (n_exact - 1) + Σ n_exact over verified near
    # HASHES — a k-replica boilerplate cluster costs ONE row of band
    # work instead of k^2 pairs (measured 7.7x at 10x replication with
    # doc-level pairs, linear after this factorization — docs/SCALE.md).
    # Degenerate band buckets (> PHASH_BAND_DF_CAP distinct hashes — the
    # all-ones band of bright images) are dropped before the self-join.
    live = phash_bands_frame(g.select("phash"))
    other = live.select(
        F.col("phash").alias("pb"),
        F.col("b").alias("ob"),
        F.col("bv").alias("obv"),
    )
    hcand = (
        live.join(
            other,
            (F.col("b") == F.col("ob"))
            & (F.col("bv") == F.col("obv"))
            & (F.col("phash") != F.col("pb")),
        )
        .select(F.col("phash").alias("pa"), "pb")
        .distinct()
    )
    ham = F.expr(_PHASH_HAM)
    gb = g.select(F.col("phash").alias("pb"), F.col("n_exact").alias("n_exact_b"))
    hnear = (
        hcand.filter(ham <= PHASH_HAM_T)
        .join(gb, "pb")
        .groupBy(F.col("pa").alias("phash"))
        .agg(F.sum("n_exact_b").cast("bigint").alias("n_near"))
    )
    return (
        ph.join(g, "phash")
        .join(hnear, "phash", "left")
        .select(
            "doc_id",
            "phash",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_exact_dup"),
            (F.col("n_exact") - 1 + F.coalesce(F.col("n_near"), F.lit(0)))
            .cast("bigint")
            .alias("n_near_dups"),
        )
    )


def phash_frame(bins: DataFrame) -> DataFrame:
    """(doc_id, phash): the Arrow-batched aHash fingerprint map — shared
    by D64, the incremental D65, and the live pipeline E28. Payload
    bytes never leave the stage; empty payloads drop."""

    def phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                if n == 0:
                    continue
                ps = [payload[(i * n) // PHASH_BITS] for i in range(PHASH_BITS)]
                s = sum(ps)
                ids.append(doc_id)
                hashes.append(
                    "".join("1" if p * PHASH_BITS >= s else "0" for p in ps)
                )
            yield pd.DataFrame({"doc_id": ids, "phash": hashes})

    return bins.mapInPandas(phash_batches, schema="doc_id long, phash string")


def phash_bands_frame(hashes: DataFrame) -> DataFrame:
    """(phash, b, bv) over a DISTINCT-hash frame, with degenerate
    buckets (> PHASH_BAND_DF_CAP hashes) dropped — the index side of
    every phash band join."""
    bands = hashes.select(
        "phash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PHASH_BANDS - 1}), b -> "
                f"struct(b AS b, substr(phash, b * {PHASH_BAND_LEN} + 1, "
                f"{PHASH_BAND_LEN}) AS bv))"
            )
        ).alias("bb"),
    ).select("phash", "bb.b", "bb.bv")
    band_df = (
        bands.groupBy("b", "bv")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= PHASH_BAND_DF_CAP)
        .select("b", "bv")
    )
    return bands.join(band_df, ["b", "bv"])


# Hamming distance between two {PHASH_BITS}-char bit strings as
# popcount-of-XOR on the two 32-bit halves — OPTIMIZATION r12 (guide
# §1.2 step 2): the previous form materialized a 64-element array and
# ran 128 substr() calls per candidate pair; this one is 4 conv()
# parses + 2 XORs + 2 bit_count()s. Exactly equal: the per-position
# mismatch count of two equal-length '0'/'1' strings is the popcount
# of the XOR of their numeric values, split in halves so each fits a
# BIGINT without touching the sign bit (the docstring's "2^63 trap":
# the HASH stays a bit string everywhere — only this comparison ever
# converts, and only 32 bits at a time).
_PH_HALF = PHASH_BITS // 2
_PHASH_HAM = (
    f"bit_count(CAST(conv(substr(pa, 1, {_PH_HALF}), 2, 10) AS BIGINT) ^ "
    f"CAST(conv(substr(pb, 1, {_PH_HALF}), 2, 10) AS BIGINT)) + "
    f"bit_count(CAST(conv(substr(pa, {_PH_HALF + 1}, {PHASH_BITS - _PH_HALF}), 2, 10) AS BIGINT) ^ "
    f"CAST(conv(substr(pb, {_PH_HALF + 1}, {PHASH_BITS - _PH_HALF}), 2, 10) AS BIGINT))"
)


def phash_match_frame(
    incoming_ph: DataFrame, corpus_g: DataFrame, corpus_bands: DataFrame
) -> DataFrame:
    """The D65/E28 decision kernel: each incoming fingerprint against a
    corpus index — is_exact_dup (hash present in corpus), n_corpus_near
    (n_exact-weighted count of corpus docs at a DIFFERENT hash within
    Hamming {PHASH_HAM_T}, candidates via the corpus's capped bands).
    All pairwise work runs on DISTINCT incoming hashes (the D64
    factorization); the asymmetric join touches incoming x corpus only,
    never corpus x corpus (the D36 incremental shape)."""
    inc_hashes = incoming_ph.select("phash").distinct()
    inc_bands = inc_hashes.select(
        F.col("phash").alias("pa"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {PHASH_BANDS - 1}), b -> "
                f"struct(b AS b, substr(phash, b * {PHASH_BAND_LEN} + 1, "
                f"{PHASH_BAND_LEN}) AS bv))"
            )
        ).alias("bb"),
    ).select("pa", "bb.b", "bb.bv")
    hcand = (
        inc_bands.join(
            corpus_bands.select(
                F.col("phash").alias("pb"),
                F.col("b").alias("ob"),
                F.col("bv").alias("obv"),
            ),
            (F.col("b") == F.col("ob"))
            & (F.col("bv") == F.col("obv"))
            & (F.col("pa") != F.col("pb")),
        )
        .select("pa", "pb")
        .distinct()
    )
    gb = corpus_g.select(
        F.col("phash").alias("pb"), F.col("n_exact").alias("n_exact_b")
    )
    hnear = (
        hcand.filter(F.expr(_PHASH_HAM) <= PHASH_HAM_T)
        .join(gb, "pb")
        .groupBy(F.col("pa").alias("phash"))
        .agg(F.sum("n_exact_b").cast("bigint").alias("n_near"))
    )
    gx = corpus_g.select("phash", F.lit(True).alias("_hit"))
    return (
        incoming_ph.join(gx, "phash", "left")
        .join(hnear, "phash", "left")
        .select(
            "doc_id",
            "phash",
            F.coalesce(F.col("_hit"), F.lit(False)).alias("is_exact_dup"),
            F.coalesce(F.col("n_near"), F.lit(0)).cast("bigint").alias("n_corpus_near"),
        )
    )


# --- D65 -----------------------------------------------------------------
PHASH_INC_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, strlen(text) AS n,
         CAST(substring(source, 4) AS INT) % 2 AS side
  FROM documents WHERE strlen(text) > 0
),
px AS (
  SELECT doc_id, side,
         list_transform(range({PHASH_BITS}),
           i -> ord(substr(text, CAST((i * n) // {PHASH_BITS} AS INT) + 1, 1))) AS ps
  FROM d
),
ph AS (
  SELECT doc_id, side,
         array_to_string(list_transform(range({PHASH_BITS}),
           i -> CASE WHEN ps[i + 1] * {PHASH_BITS} >= list_sum(ps)
                THEN '1' ELSE '0' END), '') AS phash
  FROM px
),
g AS (
  SELECT phash, CAST(count(*) AS BIGINT) AS n_exact
  FROM ph WHERE side = 0 GROUP BY phash
),
cb AS (
  SELECT phash, b.b,
         substr(phash, b.b * {PHASH_BAND_LEN} + 1, {PHASH_BAND_LEN}) AS bv
  FROM g CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(b)
),
cb_live AS (
  SELECT cb.* FROM cb
  JOIN (SELECT b, bv FROM cb GROUP BY b, bv
        HAVING count(*) <= {PHASH_BAND_DF_CAP}) ok USING (b, bv)
),
ib AS (
  SELECT DISTINCT ph.phash AS pa, b.b,
         substr(ph.phash, b.b * {PHASH_BAND_LEN} + 1, {PHASH_BAND_LEN}) AS bv
  FROM ph CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(b)
  WHERE side = 1
),
hcand AS (
  SELECT DISTINCT ib.pa, cb_live.phash AS pb
  FROM ib JOIN cb_live ON ib.b = cb_live.b AND ib.bv = cb_live.bv
  WHERE ib.pa <> cb_live.phash
),
hnear AS (
  SELECT hcand.pa AS phash, CAST(sum(g.n_exact) AS BIGINT) AS n_near
  FROM hcand JOIN g ON g.phash = hcand.pb
  WHERE list_sum(list_transform(range({PHASH_BITS}),
          i -> CASE WHEN substr(pa, i + 1, 1) <> substr(pb, i + 1, 1)
               THEN 1 ELSE 0 END)) <= {PHASH_HAM_T}
  GROUP BY hcand.pa
)
SELECT ph.doc_id, ph.phash,
       g.phash IS NOT NULL AS is_exact_dup,
       coalesce(hnear.n_near, 0) AS n_corpus_near
FROM ph
LEFT JOIN g ON g.phash = ph.phash
LEFT JOIN hnear ON hnear.phash = ph.phash
WHERE ph.side = 1
"""


@register("phash_incremental_dedup", PHASH_INC_ORACLE)
def phash_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental perceptual-hash dedup — the production shape of D64:
    a crawl increment (odd sources) fingerprinted and tested against
    the EXISTING corpus index (even sources: exact-hash groups + capped
    band table), per incoming doc the exact-hit verdict and the
    n_exact-weighted count of corpus images within Hamming
    {PHASH_HAM_T} at a different hash. The same split D36/D43 use for
    text: the corpus never joins itself, only incoming x corpus.

    SCALE: the corpus index is built once per epoch (at 100 TB it is a
    maintained TABLE, refreshed as kept images are admitted — exactly
    E28's state); the increment pays one Arrow fingerprint map + an
    asymmetric band join whose pairwise work scales with DISTINCT
    incoming hashes. Payloads never shuffle on either side.

    Reference scope note: no uForwarder twin — D-family mandate
    (multimodal curation at corpus scale)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.expr("CAST(substring(source, 4) AS INT) % 2").alias("side"),
    )
    # Each side is fingerprinted independently (filter pushed to the
    # scan) — no doc_id join-back, so nothing corpus-sized shuffles to
    # re-attach the split column.
    corpus_ph = phash_frame(d.filter(F.col("side") == 0).select("doc_id", "payload"))
    inc = phash_frame(d.filter(F.col("side") == 1).select("doc_id", "payload"))
    g = corpus_ph.groupBy("phash").agg(
        F.count("*").cast("bigint").alias("n_exact")
    ).localCheckpoint()
    # checkpointed: the band index and both decision joins read g from
    # CONCURRENT stages — persist() raced (CPU 5.4 -> 5.0 s med
    # interleaved at sf0.1, OPTIMIZATION_r13.md §F)
    bands = phash_bands_frame(g.select("phash"))
    return phash_match_frame(inc, g, bands)


# --- D95 -----------------------------------------------------------------
AUDIO_FRAME = 40  # samples per analysis frame (int16 PCM)
# Energy gate between the corpus's frame-energy quartiles so both the
# voiced and silent branches exercise at every test SF; a real
# deployment calibrates this against its noise floor.
AUDIO_ENERGY_T = 26_000_000_000

AUDIO_SEG_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, strlen(text) // 2 AS ns FROM documents
),
fr AS (
  SELECT doc_id, text, f FROM d, unnest(range(ns // {AUDIO_FRAME})) t(f)
),
sm AS (
  SELECT doc_id, f,
         CAST(sum(CAST(s AS BIGINT) * CAST(s AS BIGINT)) AS BIGINT) AS ssq
  FROM (
    SELECT doc_id, f,
           ord(substr(text, ({AUDIO_FRAME}*f + j)*2 + 1, 1))
           + 256 * ord(substr(text, ({AUDIO_FRAME}*f + j)*2 + 2, 1)) AS s
    FROM fr, unnest(range({AUDIO_FRAME})) u(j)
  ) GROUP BY doc_id, f
),
v AS (
  SELECT doc_id, f, ssq, ssq >= {AUDIO_ENERGY_T} AS voiced FROM sm
),
isl AS (
  SELECT doc_id,
         f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
  FROM v WHERE voiced
),
seg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS seg_len
  FROM isl GROUP BY doc_id, grp
),
per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_frames,
         CAST(sum(CASE WHEN voiced THEN 1 ELSE 0 END) AS BIGINT) AS n_voiced,
         CAST(sum(ssq) AS BIGINT) AS sum_ssq
  FROM v GROUP BY doc_id
)
SELECT p.doc_id, p.n_frames, p.n_voiced,
       coalesce(CAST(count(s.seg_len) AS BIGINT), 0) AS n_segments,
       coalesce(max(s.seg_len), 0) AS longest_voiced,
       round(CAST(p.sum_ssq AS DOUBLE) / p.n_frames, 6) AS mean_frame_energy
FROM per_doc p LEFT JOIN seg s USING (doc_id)
GROUP BY p.doc_id, p.n_frames, p.n_voiced, p.sum_ssq
"""


def audio_frame_energy(bins: DataFrame) -> DataFrame:
    """(doc_id, f, ssq): per-frame int16-PCM energy of a (doc_id,
    payload binary) frame — REAL signal math (little-endian int16
    decode + exact int64 sum-of-squares over {AUDIO_FRAME}-sample
    frames, pure numpy — no codec needed), Arrow-batched; payload
    bytes never leave the stage. Incomplete tail frames drop
    (standard frame analysis); zero-frame payloads emit no row."""
    import numpy as np

    def energy_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fs, ssqs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_samp = len(payload) // 2
                n_fr = n_samp // AUDIO_FRAME
                if n_fr == 0:
                    continue
                a = (
                    np.frombuffer(payload, dtype="<i2", count=n_fr * AUDIO_FRAME)
                    .astype(np.int64)
                    .reshape(n_fr, AUDIO_FRAME)
                )
                e = (a * a).sum(axis=1)
                ids.extend([doc_id] * n_fr)
                fs.extend(range(n_fr))
                ssqs.extend(int(x) for x in e)
            yield pd.DataFrame(
                {"doc_id": ids, "f": fs, "ssq": ssqs},
                columns=["doc_id", "f", "ssq"],
            )

    return bins.mapInPandas(energy_batches, schema="doc_id long, f long, ssq long")


def audio_segments_frame(bins: DataFrame) -> DataFrame:
    """Gate + segment + rollup over a (doc_id, payload) frame — the
    full D95 pipeline after decode, ONE definition shared by batch D95
    and live E49 (per-doc semantics, so the live twin is stateless)."""
    from pyspark.sql import Window

    v = audio_frame_energy(bins).withColumn(
        "voiced", F.col("ssq") >= F.lit(AUDIO_ENERGY_T)
    )
    isl = (
        v.filter("voiced")
        .withColumn(
            "grp",
            F.col("f")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("f")),
        )
        .groupBy("doc_id", "grp")
        .agg(F.count("*").cast("bigint").alias("seg_len"))
    )
    segs = isl.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_segments"),
        F.max("seg_len").alias("longest_voiced"),
    )
    per_doc = v.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum(F.when(F.col("voiced"), 1).otherwise(0)).cast("bigint").alias("n_voiced"),
        F.sum("ssq").cast("bigint").alias("sum_ssq"),
    )
    return (
        per_doc.join(segs, "doc_id", "left")
        .select(
            "doc_id",
            "n_frames",
            "n_voiced",
            F.coalesce("n_segments", F.lit(0).cast("bigint")).alias("n_segments"),
            F.coalesce("longest_voiced", F.lit(0).cast("bigint")).alias("longest_voiced"),
            F.round(
                F.col("sum_ssq").cast("double") / F.col("n_frames"), 6
            ).alias("mean_frame_energy"),
        )
    )


@register("audio_silence_segments", AUDIO_SEG_ORACLE)
def audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio silence/voiced segmentation over opaque PCM payloads — the
    speech-data curation primitive (VAD-style framing: per-frame
    energy → threshold gate → voiced islands), completing the
    multimodal family's modality coverage (image D12/D46/D64, video
    D29, audio here). The int16 decode and frame energy are REAL
    numpy signal math (no codec required); only the payload itself is
    the stand-in (utf-8 text bytes as PCM — ASCII-guarded, so the
    DuckDB oracle audits the byte math exactly). Per doc: frame count,
    voiced count, segment count, longest voiced run, mean frame
    energy — the features a speech pipeline filters and chunks on.

    Exactness: samples and sums-of-squares are exact integers end to
    end (int64 in the UDF, BIGINT in SQL); the only double is the
    final mean (ONE division, rounded 6 dp); islands are the D73
    gaps-and-islands windows keyed per doc.

    SCALE: the energy map is Arrow-batched mapInPandas — payload
    bytes never shuffle, downstream sees only (doc_id, f, ssq) rows
    (the D12 rule); island windows partition per doc, rollups are
    partial aggs. At 100 TB: partition by file locality, frames are
    1/(2·{AUDIO_FRAME}) the payload bytes.

    Reference analogue: none (training-data pipeline family,
    multimodal plumbing)."""
    bins = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return audio_segments_frame(bins)
