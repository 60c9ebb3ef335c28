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
