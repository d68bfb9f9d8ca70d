"""Independent pure-Python PNG decoder — the oracle twin of
``operators/png_codec.png_decode``.

Deliberately a DIFFERENT implementation shape (per-pixel loops over
bytearrays, no numpy, byte-stream chunk reader) so a shared bug cannot
hide: the engine decodes with vectorized row filters, this oracle decodes
the spec (RFC 2083 §6) literally, and tests assert byte equality on every
filter type.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


#: Adam7 schedule (RFC 2083 §2.6): (x_start, y_start, x_step, y_step).
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter_lines(raw, w, h, channels):
    """Literal per-pixel unfiltering of one (sub-)image -> list of
    bytearrays (one per scanline)."""
    stride = w * channels
    assert len(raw) == h * (1 + stride)
    prev = bytearray(stride)
    rows = []
    for r in range(h):
        line = raw[r * (1 + stride) : (r + 1) * (1 + stride)]
        ft, src = line[0], line[1:]
        cur = bytearray(stride)
        for i in range(stride):
            a = cur[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            elif ft == 4:
                pred = _paeth(a, b, c)
            else:
                raise AssertionError(f"bad filter {ft}")
            cur[i] = (src[i] + pred) & 0xFF
        rows.append(cur)
        prev = cur
    return rows


def png_decode_py(data: bytes):
    """PNG bytes -> (pixels as list of rows of ints [or (r,g,b[,a]) tuples],
    width, height, channels, tEXt dict). Handles both interlace methods
    (Adam7 scattered with literal nested loops — r4)."""
    assert data[:8] == _SIG, "bad signature"
    pos = 8
    idat = bytearray()
    meta = {}
    w = h = channels = None
    interlace = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert zlib.crc32(tag + body) & 0xFFFFFFFF == crc, "bad CRC"
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, _, _, interlace = struct.unpack(">IIBBBBB", body)
            assert depth == 8 and color in _CHANNELS and interlace in (0, 1)
            channels = _CHANNELS[color]
        elif tag == b"tEXt":
            k, _, v = body.partition(b"\x00")
            meta[k.decode("latin-1")] = v.decode("latin-1")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    # flat sample grid, filled directly (sequential) or scattered (Adam7)
    grid = [[0] * (w * channels) for _ in range(h)]
    if interlace:
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = ((w - x0) + dx - 1) // dx if w > x0 else 0
            ph = ((h - y0) + dy - 1) // dy if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            n = ph * (1 + pw * channels)
            rows = _unfilter_lines(raw[off : off + n], pw, ph, channels)
            off += n
            for ry, cur in enumerate(rows):
                y = y0 + ry * dy
                for rx in range(pw):
                    x = x0 + rx * dx
                    for ci in range(channels):
                        grid[y][x * channels + ci] = cur[rx * channels + ci]
        assert off == len(raw)
    else:
        for r, cur in enumerate(_unfilter_lines(raw, w, h, channels)):
            grid[r] = list(cur)
    pixels = []
    for r in range(h):
        cur = grid[r]
        if channels == 1:
            pixels.append(list(cur))
        else:
            pixels.append(
                [
                    tuple(cur[i : i + channels])
                    for i in range(0, w * channels, channels)
                ]
            )
    return pixels, w, h, channels, meta
