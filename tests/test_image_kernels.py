"""Real numpy image kernels vs the per-pixel pure-Python oracle
(byte-identical decode, exact stats moments)."""

from __future__ import annotations

import numpy as np

from logcrawler_spark.operators.multimodal import (
    decode_yuv422_rgb,
    luma_stats,
)
from logcrawler_spark.oracles.imagesim import (
    decode_yuv422_rgb_py,
    luma_stats_py,
)


def _payload(width: int, height: int, seed: int = 7) -> bytes:
    n = width * height * 2
    return bytes(((i * 2654435761 + seed * 97) >> 7) & 0xFF for i in range(n))


def test_yuv_decode_byte_identical_to_python_oracle():
    w, h = 8, 6
    p = _payload(w, h)
    got = decode_yuv422_rgb(p, w, h)
    want = decode_yuv422_rgb_py(p, w, h)
    assert got.shape == (h, w, 3)
    for row in range(h):
        for col in range(w):
            assert tuple(int(x) for x in got[row, col]) == want[row][col], (
                row,
                col,
            )


def test_yuv_decode_clips_extremes():
    w, h = 4, 2
    # Y=255 with max V drives R past 255; Y=0 with min U drives B below 0
    p = bytes([255, 255, 255, 255] * 2 + [0, 0, 0, 0] * 2)
    rgb = decode_yuv422_rgb(p, w, h)
    assert rgb.max() <= 255 and rgb.min() >= 0
    assert rgb[0, 0, 0] == 255  # clipped red
    assert rgb[1, 0, 2] == 0  # clipped blue


def test_luma_stats_match_python_oracle():
    w, h = 16, 8
    p = _payload(w, h, seed=3)
    y = np.frombuffer(p, dtype=np.uint8)[0::2].astype(np.int64).reshape(h, w)
    got = luma_stats(y)
    want = luma_stats_py(p, w, h)
    assert got == want  # ints exact; floats from identical formulas


def test_flat_image_has_zero_blur_variance():
    w, h = 8, 4
    p = bytes([100, 128] * (w * h))  # constant Y=100
    y = np.frombuffer(p, dtype=np.uint8)[0::2].astype(np.int64).reshape(h, w)
    st = luma_stats(y)
    assert st["brightness"] == 100.0
    assert st["sum_lap"] == 0 and st["blur_var"] == 0.0
