"""Integration-grade swap-point tests (VERDICT r07 #5): prove the
documented "real decode is one function" claims by actually driving the
Spark pipelines through real decoders.

- D46 resize: `multimodal_resize_frame(bins, decode_resize=...)` runs
  the IDENTICAL Arrow-batched plumbing for the SQL-auditable stub, a
  dependency-free REAL pixel decoder (binary PPM + numpy resample — runs
  in this container), and PIL (skipped when PIL is absent). The PPM test
  verifies every output column against an independent numpy replay,
  including the checksum of the actual resized RGB bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from uforwarder_spark.functions.multimodal import (
    RESIZE_BOX,
    letterbox,
    multimodal_resize_frame,
    pil_decode_resize,
    ppm_decode_resize,
)


def _make_ppm(w: int, h: int, seed: int) -> tuple[bytes, np.ndarray]:
    """A deterministic binary PPM (P6) image + its pixel array."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    return payload, px


_SHAPES = [(8, 6), (640, 480), (223, 71), (1, 1), (500, 13)]


def _bins_df(spark, payloads):
    return spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )


def test_resize_swap_ppm_real_decode_end_to_end(spark):
    """The full Spark pipeline through the REAL PPM decoder: header dims
    actually parsed, pixels actually resampled, checksum = md5 of the
    actual resized RGB bytes — all verified against an independent
    numpy replay per image."""
    payloads, pixels = zip(*(_make_ppm(w, h, 7 * i) for i, (w, h) in enumerate(_SHAPES)))
    got = {
        r.doc_id: r
        for r in multimodal_resize_frame(
            _bins_df(spark, payloads), decode_resize=ppm_decode_resize
        ).collect()
    }
    assert len(got) == len(_SHAPES)
    for i, (w, h) in enumerate(_SHAPES):
        ow, oh, sc6 = letterbox(w, h, RESIZE_BOX)
        px = pixels[i]
        ys = (np.arange(oh) * h) // oh
        xs = (np.arange(ow) * w) // ow
        expect_sum = hashlib.md5(px[ys][:, xs].tobytes()).hexdigest()
        r = got[i]
        assert (r.width, r.height) == (w, h)  # parsed from the real header
        assert (r.out_width, r.out_height) == (ow, oh)
        assert r.scale == sc6
        assert r.out_bytes == ow * oh * 3
        assert r.resized_checksum == expect_sum
        # geometry invariants: never upscale, aspect preserved within
        # one floor step, fits the box
        assert r.out_width <= max(w, 1) and r.out_height <= max(h, 1)
        assert r.out_width <= RESIZE_BOX and r.out_height <= RESIZE_BOX


def test_resize_swap_rejects_non_image():
    with pytest.raises(ValueError):
        ppm_decode_resize(b"not an image", RESIZE_BOX)


@pytest.mark.skipif(
    __import__("importlib.util", fromlist=["util"]).find_spec("PIL") is None,
    reason="PIL not installed",
)
def test_resize_swap_pil_end_to_end(spark):
    """Same pipeline through PIL: PNG payloads round-tripped through
    Image.open/convert/resize — runs wherever PIL is installed (this
    container ships without it; the swap is the SAME one-function
    contract the PPM test proves)."""
    import io

    from PIL import Image

    payloads, pixels = [], []
    for i, (w, h) in enumerate(_SHAPES):
        rng = np.random.default_rng(100 + i)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(px, "RGB").save(buf, format="PNG")
        payloads.append(buf.getvalue())
        pixels.append(px)
    got = {
        r.doc_id: r
        for r in multimodal_resize_frame(
            _bins_df(spark, payloads), decode_resize=pil_decode_resize
        ).collect()
    }
    for i, (w, h) in enumerate(_SHAPES):
        ow, oh, sc6 = letterbox(w, h, RESIZE_BOX)
        r = got[i]
        assert (r.width, r.height) == (w, h)
        assert (r.out_width, r.out_height, r.scale) == (ow, oh, sc6)
        expect = Image.fromarray(pixels[i], "RGB").resize((ow, oh), Image.NEAREST)
        assert r.resized_checksum == hashlib.md5(expect.tobytes()).hexdigest()


def test_quality_classifier_trained_weight_swap(spark):
    """D75 swap point: train a REAL model (ridge least-squares over the
    hashed-bucket count features) on the sf0.001 corpus and drive the
    Spark kernel with it via qc_frame_weights. The label is a
    text-derived class ("mentions spark more than sort" — the corpus's
    lang column is independent of its text, so a text label is the
    honest learnable target). Proves (1) the swap is one argument,
    (2) the plan stays the zero-shuffle / zero-explode / zero-Python
    per-row fold, (3) Spark's per-doc scores match an independent numpy
    replay, and (4) the trained model actually separates the classes
    (the weights are a real model, not noise)."""
    import re

    import duckdb

    from tests.conftest import SF_SMALL
    from uforwarder_spark.functions.text import QC_NB, qc_frame_weights
    from uforwarder_spark.model import load_parallel

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()

    def buckets(text):
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        return [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % QC_NB for t in toks
        ]

    feats, ys, ids = [], [], []
    for doc_id, text, _lang in rows:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
        bs = buckets(text)
        if not bs:
            continue
        x = np.zeros(QC_NB)
        for b in bs:
            x[b] += 1.0
        feats.append(x / len(bs))  # mean-bucket features = the kernel's score form
        ys.append(1.0 if toks.count("spark") > toks.count("sort") else -1.0)
        ids.append(doc_id)
    X, y = np.array(feats), np.array(ys)
    # ridge least squares: w = (X'X + lam I)^-1 X'y — a real trained model
    lam = 1e-6
    w = np.linalg.solve(X.T @ X + lam * np.eye(QC_NB), X.T @ y)

    # (4) the model separates the classes on its training set
    acc = float(((X @ w > 0) == (y > 0)).mean())
    assert acc >= 0.9, f"trained model accuracy {acc}"

    out = qc_frame_weights(load_parallel(spark, SF_SMALL, "documents"), list(w))
    # (2) plan: same zero-shuffle scan as the default kernel
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Generate" not in plan
    assert "pythonUDF" not in plan
    # (3) scores match the numpy replay; (1) is the call above
    got = {r.doc_id: (r.margin, r.keep) for r in out.collect()}
    assert len(got) == len(ids)
    for i, doc_id in enumerate(ids):
        score = float(X[i] @ w)
        margin, keep = got[doc_id]
        assert abs(margin - round(score, 6)) <= 1e-6, doc_id
        assert keep == (score > 0), doc_id


def test_perplexity_heldout_lm_swap(spark):
    """D60 swap point: score one half of the corpus under an LM trained
    on the OTHER half — the CCNet held-out-LM shape (crawl text scored
    under a Wikipedia KenLM; here the LM stays a unigram table but the
    corpus split makes it a genuinely external model with real OOV
    tokens). Verifies every cross-entropy against a pure-Python replay
    (add-1 with OOV floor) and that the shared banding tail bands the
    swapped scores by the same mean/mean+σ rule."""
    import math
    import re
    from collections import Counter

    import duckdb

    from tests.conftest import SF_SMALL
    from uforwarder_spark.functions.text import (
        perplexity_bands_frame,
        unigram_ce_frame,
    )
    from uforwarder_spark.model import load_parallel

    docs = load_parallel(spark, SF_SMALL, "documents")
    # the synthetic corpus shares one small vocab across all docs, so a
    # doc with genuinely-unseen tokens is added to force the OOV path a
    # held-out LM must handle (CCNet's crawl text is full of them)
    OOV_ID, OOV_TEXT = 10**9 + 1, "zzqx vvwk zzqx qqjy the scan"
    extra = spark.createDataFrame(
        [(OOV_ID, OOV_TEXT, "en", "s99", len(OOV_TEXT))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    score_side = docs.filter("doc_id % 2 = 1").unionByName(extra)
    lm_side = docs.filter("doc_id % 2 = 0")
    out = {
        r.doc_id: r
        for r in perplexity_bands_frame(
            unigram_ce_frame(score_side, lm_side)
        ).collect()
    }

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchall()
    rows.append((OOV_ID, OOV_TEXT))
    tok = lambda s: [t for t in re.split("[^a-z0-9]+", s.lower()) if t]  # noqa: E731
    lm = Counter()
    for doc_id, text in rows:
        if doc_id % 2 == 0:
            lm.update(tok(text))
    n, v = sum(lm.values()), len(lm)
    ces, oov_seen = {}, False
    for doc_id, text in rows:
        if doc_id % 2 == 0:
            continue
        ts = tok(text)
        if not ts:
            continue
        nlls = [round(-math.log((lm.get(t, 0) + 1.0) / (n + v)), 8) for t in ts]
        oov_seen = oov_seen or any(t not in lm for t in ts)
        ces[doc_id] = sum(nlls) / len(nlls)
    assert oov_seen  # the held-out LM is genuinely external: OOV path exercised
    assert set(out) == set(ces)
    mu = sum(round(c, 8) for c in ces.values()) / len(ces)
    msq = sum(round(c * c, 8) for c in ces.values()) / len(ces)
    sd = math.sqrt(max(msq - mu * mu, 0.0))
    for doc_id, ce in ces.items():
        r = out[doc_id]
        assert abs(r.cross_entropy - round(ce, 6)) <= 1e-6, doc_id
        want = "head" if ce < mu else ("middle" if ce < mu + sd else "tail")
        assert r.ppl_band == want, doc_id


def test_resize_default_closure_is_self_contained(spark):
    """D12-contract regression (review r08): the REGISTERED operator's
    default decode must pickle by VALUE — executors never import this
    package. Proven by unpickling and running the mapInPandas closure
    in a subprocess where the package is not importable. Also pins the
    inline default to the module-level stub (same outputs), so the two
    copies cannot drift."""
    import subprocess
    import sys
    import tempfile

    from pyspark import cloudpickle

    from uforwarder_spark.functions.multimodal import stub_decode_resize

    class Dummy:
        def select(self, *a, **k):
            return self

        def mapInPandas(self, fn, schema):
            self.fn = fn
            return self

    d = Dummy()
    multimodal_resize_frame(d)
    with tempfile.NamedTemporaryFile(suffix=".pkl", delete=False) as f:
        f.write(cloudpickle.dumps(d.fn))
        path = f.name
    code = (
        "import sys, pickle, pandas as pd\n"
        f"fn = pickle.load(open({path!r}, 'rb'))\n"
        "out = list(fn(iter([pd.DataFrame({'doc_id': [1], "
        "'payload': [b'abcdef' * 10]})])))\n"
        "assert out[0].shape[0] == 1\n"
        "assert not any(m.startswith('uforwarder_spark') for m in sys.modules)\n"
        "print('OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd="/tmp",
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": ""},
    )
    assert r.returncode == 0 and "OK" in r.stdout, r.stderr[-2000:]

    # inline default == module stub on a payload sample
    payloads = [b"", b"x", b"abcdef" * 50, bytes(range(256)) * 3]
    df = _bins_df(spark, payloads)
    got_default = sorted(tuple(r) for r in multimodal_resize_frame(df).collect())
    got_stub = sorted(
        tuple(r)
        for r in multimodal_resize_frame(df, decode_resize=stub_decode_resize).collect()
    )
    assert got_default == got_stub


def test_ppm_decoder_header_robustness():
    """Review r08: the raster must be located from the header (one
    whitespace byte after maxval), not the payload end — trailing bytes
    and '#' comments are legal and must not shift pixels."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    base = b"P6\n5 4\n255\n" + px.tobytes()
    with_trailer = base + b"\n# trailing metadata"
    with_comment = b"P6\n# a comment line\n5 4\n# another\n255\n" + px.tobytes()
    want = ppm_decode_resize(base, RESIZE_BOX)
    assert ppm_decode_resize(with_trailer, RESIZE_BOX) == want
    assert ppm_decode_resize(with_comment, RESIZE_BOX) == want
    with pytest.raises(ValueError):
        ppm_decode_resize(b"P6\n5 4\n255\n" + px.tobytes()[:-1], RESIZE_BOX)


def test_resize_error_policy(spark):
    """ADVICE r08: a corrupt payload must not be able to kill a
    real-decode deployment. The policy lives in the Spark plumbing
    (per-row inside the Arrow batch loop), so it holds for ANY decoder:
    - on_error='raise' (default): the corrupt row fails the job —
      the oracle-checked contract, unchanged;
    - on_error='skip': corrupt rows are dropped, good rows survive;
    - on_error='null': every row kept, decode columns nulled and
      `decode_error` names the exception for corruption-rate audits."""
    good, pixels = _make_ppm(8, 6, 3)
    bins = _bins_df(spark, [good, b"not an image", good])

    with pytest.raises(Exception, match="not a binary PPM"):
        multimodal_resize_frame(bins, decode_resize=ppm_decode_resize).collect()

    kept = (
        multimodal_resize_frame(
            bins, decode_resize=ppm_decode_resize, on_error="skip"
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r.doc_id for r in kept] == [0, 2]
    assert kept[0].width == 8 and kept[0].height == 6

    rows = (
        multimodal_resize_frame(
            bins, decode_resize=ppm_decode_resize, on_error="null"
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r.doc_id for r in rows] == [0, 1, 2]
    assert rows[0].decode_error is None and rows[2].decode_error is None
    assert rows[0].resized_checksum == rows[2].resized_checksum
    assert rows[1].width is None and rows[1].resized_checksum is None
    assert "not a binary PPM" in rows[1].decode_error

    with pytest.raises(ValueError, match="on_error"):
        multimodal_resize_frame(bins, on_error="ignore")


def test_qc_frame_weights_rejects_nonfinite():
    """ADVICE r08: a NaN/inf weight (degenerate least-squares fit)
    previously rendered an invalid SQL literal ('nanD') and died with
    an opaque parse error at plan time — now it's a descriptive
    ValueError before any SQL is built."""
    from uforwarder_spark.functions.text import QC_NB, qc_frame_weights

    for bad in (float("nan"), float("inf"), float("-inf")):
        ws = [0.1] * QC_NB
        ws[QC_NB // 2] = bad
        with pytest.raises(ValueError, match="not finite"):
            qc_frame_weights(None, ws)
