"""Independent WAV/AVI parsers — oracle twins of ``operators/av_codec.py``.

Different implementation shape on purpose (the repo's dual-implementation
discipline, as with jpeg_sim/robots_sim): a sequential reader object with
per-field struct reads and an explicit iterative stack for the RIFF tree,
instead of the engine's numpy slicing and recursive walk — a shared
parsing bug cannot hide. Pure Python, no numpy."""

from __future__ import annotations

import struct


class _Reader:
    def __init__(self, data: bytes, pos: int = 0, end: int | None = None):
        self.data = data
        self.pos = pos
        self.end = len(data) if end is None else end

    def take(self, n: int) -> bytes:
        if self.pos + n > self.end:
            raise ValueError("truncated")
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]


def wav_decode_py(data: bytes):
    """-> (rate_hz, n_channels, [[frame ch samples...] ...]) as plain
    Python lists (channel count from the fmt chunk, so an empty data
    chunk still reports the declared channels — engine parity)."""
    r = _Reader(data)
    if r.take(4) != b"RIFF":
        raise ValueError("no RIFF")
    riff_len = r.u32()
    r.end = min(len(data), 8 + riff_len)
    if r.take(4) != b"WAVE":
        raise ValueError("no WAVE")
    fmt = None
    payload = None
    while r.pos + 8 <= r.end:
        cid = r.take(4)
        clen = r.u32()
        body = r.take(clen)
        if clen % 2 and r.pos < r.end:
            r.take(1)
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("fmt chunk too short")
            tag, ch, rate, _br, _bl, bits = struct.unpack("<HHIIHH", body[:16])
            fmt = (tag, ch, rate, bits)
        elif cid == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data")
    tag, ch, rate, bits = fmt
    if tag != 1 or bits not in (8, 16) or ch < 1 or rate < 1:
        raise ValueError("unsupported PCM layout")
    vals = []
    if bits == 16:
        for i in range(0, len(payload) - len(payload) % (2 * ch), 2):
            vals.append(struct.unpack("<h", payload[i : i + 2])[0])
    else:
        for i in range(len(payload) - len(payload) % ch):
            vals.append(payload[i] - 128)
    frames = [vals[i : i + ch] for i in range(0, len(vals), ch)]
    return rate, ch, frames


def avi_frames_py(data: bytes) -> list[bytes]:
    """-> MJPEG frame payloads, via an explicit stack (no recursion)."""
    r = _Reader(data)
    if r.take(4) != b"RIFF":
        raise ValueError("no RIFF")
    riff_len = r.u32()
    if r.take(4) != b"AVI ":
        raise ValueError("no AVI")
    out: list[bytes] = []
    # stack of (pos, end, in_movi)
    stack = [(12, min(len(data), 8 + riff_len), False)]
    while stack:
        pos, end, in_movi = stack.pop()
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            clen = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body_end = pos + 8 + clen
            if body_end > end:
                raise ValueError("overrun")
            if cid == b"LIST":
                kind = data[pos + 8 : pos + 12]
                # continue current level later; descend first in order
                stack.append((body_end + (clen & 1), end, in_movi))
                pos, end, in_movi = (
                    pos + 12, body_end, in_movi or kind == b"movi"
                )
                continue
            if in_movi and cid[2:4] in (b"dc", b"db"):
                out.append(data[pos + 8 : body_end])
            pos = body_end + (clen & 1)
    return out
