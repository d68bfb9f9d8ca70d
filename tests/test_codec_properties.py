"""Property-based codec checks (hypothesis): arbitrary shapes/contents,
the invariants that must hold for EVERY input, not just the fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from logcrawler_spark.operators.jpeg_codec import jpeg_decode, jpeg_encode
from logcrawler_spark.operators.png_codec import png_decode, png_encode
from logcrawler_spark.oracles.jpeg_sim import jpeg_decode_py
from logcrawler_spark.oracles.png_sim import png_decode_py

_SETTINGS = dict(max_examples=25, deadline=None)


@st.composite
def _images(draw, max_side=24, channels=(0, 3, 4)):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    c = draw(st.sampled_from(channels))
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 0 else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@settings(**_SETTINGS)
@given(_images())
def test_png_roundtrip_is_lossless_for_any_image(img):
    out, meta = png_decode(png_encode(img))
    assert out.shape == img.shape and (out == img).all() and meta == {}


@settings(**_SETTINGS)
@given(_images(max_side=16))
def test_png_engine_and_oracle_decode_identically(img):
    blob = png_encode(img, {"seed": "x"})
    eng, _ = png_decode(blob)
    pix, w, h, ch, meta = png_decode_py(blob)
    flat_oracle = np.array(
        [[v for p in row for v in (p if isinstance(p, tuple) else (p,))]
         for row in pix],
        dtype=np.uint8,
    )
    assert (eng.reshape(h, -1) == flat_oracle).all()
    assert meta == {"seed": "x"}


@settings(max_examples=10, deadline=None)
@given(_images(max_side=20, channels=(0, 3)), st.sampled_from([60, 85, 95]),
       st.sampled_from(["444", "420"]))
def test_jpeg_decoders_agree_on_any_stream(img, quality, subsample):
    """Whatever the content (including pure noise — the worst case for
    DCT), both decoders must produce the same samples within 1 lsb from
    the same bytes, with shape preserved."""
    if img.ndim == 2 and subsample == "420":
        subsample = "444"  # grayscale has no chroma to subsample
    blob = jpeg_encode(img, quality=quality, subsample=subsample)
    eng = jpeg_decode(blob)
    pix, w, h, nc = jpeg_decode_py(blob)
    assert eng.shape[:2] == (img.shape[0], img.shape[1])
    oracle = np.array(pix, dtype=np.int64).reshape(eng.shape)
    assert np.abs(eng.astype(np.int64) - oracle).max() <= 1
