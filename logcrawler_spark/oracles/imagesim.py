"""Per-pixel pure-Python image oracle — no numpy.

Dual implementation of ``operators.multimodal.decode_yuv422_rgb`` /
``luma_stats``: explicit per-pixel loops over python ints, so any stride,
rounding, clipping, or border misunderstanding in the vectorized kernel
surfaces as a byte/value mismatch. Reference kernels being mirrored:
``06_extract_images.py:207-229`` (YUYV channel split) and
``13_calculate_image_stats.py:32-35,86-96`` (brightness + variance of
Laplacian).
"""

from __future__ import annotations

_C_RV = 91881
_C_GU = 22554
_C_GV = 46802
_C_BU = 116130


def _clip8(x: int) -> int:
    return 0 if x < 0 else (255 if x > 255 else x)


def decode_yuv422_rgb_py(
    payload: bytes, width: int, height: int
) -> list[list[tuple[int, int, int]]]:
    """(height x width) rows of (r, g, b) ints."""
    assert len(payload) == width * height * 2
    out = []
    for row in range(height):
        cells = []
        for col in range(width):
            i = row * width + col
            y = payload[2 * i]
            u = payload[4 * (i // 2) + 1]
            v = payload[4 * (i // 2) + 3]
            du, dv = u - 128, v - 128
            r = (65536 * y + _C_RV * dv + 32768) >> 16
            g = (65536 * y - _C_GU * du - _C_GV * dv + 32768) >> 16
            b = (65536 * y + _C_BU * du + 32768) >> 16
            cells.append((_clip8(r), _clip8(g), _clip8(b)))
        out.append(cells)
    return out


def luma_stats_py(payload: bytes, width: int, height: int) -> dict:
    """Same fields as ``multimodal.luma_stats`` over the YUYV payload's Y
    plane, computed with per-pixel int loops."""
    assert len(payload) == width * height * 2
    y = [
        [payload[2 * (row * width + col)] for col in range(width)]
        for row in range(height)
    ]
    n_pix = width * height
    sum_y = sum(sum(r) for r in y)
    sum_lap = 0
    sum_lap_sq = 0
    for row in range(1, height - 1):
        for col in range(1, width - 1):
            lap = (
                y[row - 1][col]
                + y[row + 1][col]
                + y[row][col - 1]
                + y[row][col + 1]
                - 4 * y[row][col]
            )
            sum_lap += lap
            sum_lap_sq += lap * lap
    n_lap = (width - 2) * (height - 2)
    mean_lap = sum_lap / n_lap
    return {
        "n_pix": n_pix,
        "sum_y": sum_y,
        "sum_lap": sum_lap,
        "sum_lap_sq": sum_lap_sq,
        "brightness": sum_y / n_pix,
        "blur_var": sum_lap_sq / n_lap - mean_lap * mean_lap,
    }


def stride_log_stats_py(
    blob: bytes, stride: int, width: int, height: int, first_is_top: bool = True
) -> list[dict]:
    """Independent fixed-stride log walk (u32 LE frame number + payload)
    with camera parity, feeding ``luma_stats_py`` — the full q_image_stats
    oracle over raw file bytes."""
    rec = 4 + stride
    out = []
    idx = 0
    pos = 0
    while pos + rec <= len(blob):
        frame_number = int.from_bytes(blob[pos : pos + 4], "little")
        payload = blob[pos + 4 : pos + rec]
        camera = (
            "Top" if (idx % 2 == 0) == first_is_top else "Bottom"
        )
        st = luma_stats_py(payload, width, height)
        out.append(
            {
                "frame_number": frame_number,
                "camera": camera,
                "width": width,
                "height": height,
                **st,
            }
        )
        idx += 1
        pos += rec
    return out
