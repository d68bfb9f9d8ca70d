"""Baseline-JPEG codec (X2): engine decoder vs independent per-coefficient
oracle, analytic exact cases, round-trip error bounds, and the container
dispatcher."""

from __future__ import annotations

import numpy as np
import pytest

from logcrawler_spark.operators.jpeg_codec import (
    _C,
    jpeg_decode,
    jpeg_encode,
    quality_tables,
)
from logcrawler_spark.oracles.jpeg_sim import jpeg_decode_py


def _rng():
    return np.random.default_rng(20260816)


def _smooth(h, w, channels=0):
    """Low-frequency test image (quantization error stays small)."""
    y, x = np.mgrid[0:h, 0:w]
    base = 128 + 90 * np.sin(x / 9.0) * np.cos(y / 11.0)
    if channels:
        chans = [
            np.clip(base + 20 * np.sin((x + y) / (7.0 + c)), 0, 255)
            for c in range(channels)
        ]
        return np.stack(chans, axis=-1).astype(np.uint8)
    return np.clip(base, 0, 255).astype(np.uint8)


def test_idct_matrix_matches_naive_definition():
    """The engine's separable matmul IDCT == the textbook per-sample
    double sum (T.81 A.3.3) to float tolerance."""
    rng = _rng()
    coef = rng.normal(0, 200, size=(8, 8))
    eng = _C.T @ coef @ _C
    naive = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 2 ** -0.5 if u == 0 else 1.0
                    cv = 2 ** -0.5 if v == 0 else 1.0
                    s += (
                        cu * cv * coef[v, u]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            naive[y, x] = s / 4.0
    assert np.abs(eng - naive).max() < 1e-9


def test_constant_gray_roundtrips_exactly():
    """All-128 image: level shift makes every coefficient 0 -> decode is
    analytically exact regardless of quantization."""
    img = np.full((24, 16), 128, dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=25))
    assert out.shape == img.shape and (out == img).all()


@pytest.mark.parametrize("shape", [(16, 24), (17, 19), (16, 16, 3)])
def test_engine_decoder_matches_independent_oracle(shape):
    """Same bytes -> both decoders agree: the integer entropy/dequant path
    is exact, the float IDCT differs only in last-ulp terms, so decoded
    samples match within 1 lsb and almost everywhere exactly."""
    channels = 3 if len(shape) == 3 else 0
    img = _smooth(shape[0], shape[1], channels)
    blob = jpeg_encode(img, quality=85)
    eng = jpeg_decode(blob)
    pix, w, h, nc = jpeg_decode_py(blob)
    assert (w, h) == (shape[1], shape[0]) and nc == (3 if channels else 1)
    oracle = np.array(pix, dtype=np.int64).reshape(eng.shape)
    diff = np.abs(eng.astype(np.int64) - oracle)
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.99


def test_roundtrip_error_bounded_and_quality_monotone():
    img = _smooth(40, 56)
    err = {}
    for q in (50, 90):
        out = jpeg_decode(jpeg_encode(img, quality=q))
        err[q] = np.abs(out.astype(int) - img.astype(int)).mean()
    assert err[90] <= err[50] + 1e-9
    assert err[90] < 3.0  # smooth content at q90: ~lossless to the eye
    assert err[50] < 10.0


def test_color_roundtrip_and_odd_dims():
    img = _smooth(23, 21, channels=3)
    out = jpeg_decode(jpeg_encode(img, quality=92))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6.0


@pytest.mark.parametrize("shape", [(32, 32), (23, 21)])
def test_420_subsampled_decode_matches_oracle(shape):
    """4:2:0 streams (interleaved 4-Y-block MCUs, subsampled chroma):
    engine and oracle agree within 1 lsb; reconstruction stays bounded."""
    img = _smooth(shape[0], shape[1], channels=3)
    blob = jpeg_encode(img, quality=90, subsample="420")
    eng = jpeg_decode(blob)
    pix, w, h, nc = jpeg_decode_py(blob)
    assert (w, h, nc) == (shape[1], shape[0], 3)
    oracle = np.array(pix, dtype=np.int64).reshape(eng.shape)
    assert np.abs(eng.astype(np.int64) - oracle).max() <= 1
    assert eng.shape == img.shape
    # chroma is subsampled, so tolerate more error than 4:4:4
    assert np.abs(eng.astype(int) - img.astype(int)).mean() < 8.0


@pytest.mark.parametrize("shape", [(32, 32), (23, 21)])
def test_422_subsampled_decode_matches_oracle(shape):
    """4:2:2 streams (r5: luma 2x1, horizontally-averaged chroma): engine
    and the independent oracle decoder agree within 1 lsb."""
    img = _smooth(shape[0], shape[1], channels=3)
    blob = jpeg_encode(img, quality=90, subsample="422")
    eng = jpeg_decode(blob)
    pix, w, h, nc = jpeg_decode_py(blob)
    assert (w, h, nc) == (shape[1], shape[0], 3)
    oracle = np.array(pix, dtype=np.int64).reshape(eng.shape)
    assert np.abs(eng.astype(np.int64) - oracle).max() <= 1
    assert np.abs(eng.astype(int) - img.astype(int)).mean() < 8.0


def test_rejects_non_baseline():
    img = _smooth(8, 8)
    blob = bytearray(jpeg_encode(img))
    sof = blob.index(b"\xff\xc0")
    blob[sof + 1] = 0xC3  # lossless: genuinely unsupported
    with pytest.raises(ValueError, match="not supported"):
        jpeg_decode(bytes(blob))
    # SOF2 now routes to the REAL progressive decoder (r4); a baseline
    # stream forged as progressive is structurally invalid there (its one
    # full-band scan breaks the DC-scan Se=0 rule) and still fails loudly
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(bytes(blob))
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x00\x01\x02")


def test_quality_tables_bounds():
    for q in (1, 50, 75, 100):
        qy, qc = quality_tables(q)
        assert qy.min() >= 1 and qy.max() <= 255
        assert qc.min() >= 1 and qc.max() <= 255
    assert (quality_tables(100)[0] == 1).all()  # q100: no quantization


def test_container_dispatcher_routes_by_magic():
    from logcrawler_spark.operators.multimodal import real_image_decode
    from logcrawler_spark.operators.png_codec import png_encode

    img = _smooth(12, 10)
    w, h, out_png = real_image_decode(png_encode(img))
    assert (w, h) == (10, 12) and (out_png == img).all()
    w, h, out_jpg = real_image_decode(jpeg_encode(img, quality=95))
    assert (w, h) == (10, 12)
    assert np.abs(out_jpg.astype(int) - img.astype(int)).mean() < 3.0
    with pytest.raises(ValueError, match="unrecognized image container"):
        real_image_decode(b"GIF89a....")


def test_truncated_bytes_raise_valueerror_only():
    """T3 malformed-payload policy (ADVICE r03): every truncation point of
    a valid stream must surface as ValueError — never IndexError /
    struct.error / KeyError — so payload-to-NULL wrappers that catch
    ValueError do not crash the task."""
    img = _smooth(24, 24, channels=3)
    data = jpeg_encode(img, quality=80)
    # cut inside markers, segment bodies, and the entropy-coded scan
    cuts = {2, 3, 10, 21, len(data) // 4, len(data) // 2, len(data) - 3}
    for cut in sorted(cuts):
        try:
            jpeg_decode(data[:cut])
        except ValueError:
            pass  # the contract
        # any other exception type propagates and fails the test


def test_corrupt_scan_bytes_raise_valueerror():
    """Bit-flips in the entropy-coded scan decode to garbage or raise
    ValueError — but never a non-ValueError crash."""
    img = _smooth(16, 16)
    data = bytearray(jpeg_encode(img, quality=70))
    sos = bytes(data).find(b"\xff\xda")
    assert sos > 0
    for off in range(sos + 14, min(sos + 40, len(data) - 2)):
        mut = bytearray(data)
        mut[off] ^= 0x5A
        try:
            jpeg_decode(bytes(mut))
        except ValueError:
            pass
