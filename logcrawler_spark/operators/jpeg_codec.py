"""REAL baseline JPEG codec (pure numpy — no PIL/libjpeg).

Closes X2 ("alternate decode: JPEG", the reference's
``06_extract_images.py:232-267`` JPEG path) with an actual implementation
of the PUBLIC spec (ITU-T T.81 / ISO 10918-1, JFIF container):

- :func:`jpeg_decode` — baseline sequential DCT, 8-bit: segment walk
  (SOI/APP/DQT/SOF0/DHT/DRI/SOS), canonical Huffman decode with byte
  un-stuffing and restart-marker handling, dequantize + inverse zigzag,
  separable float64 IDCT, chroma upsampling for sampling factors 1 and 2
  (4:4:4 / 4:2:2 / 4:2:0), and the JFIF full-range YCbCr->RGB transform.
  Progressive streams (SOF2) route to the REAL Annex G decoder in
  :mod:`operators.jpeg_progressive` (r4 — spectral selection +
  successive approximation); arithmetic coding and the remaining SOF
  types are rejected with clear errors. The float64 IDCT path is fixed (one matrix, one evaluation
  order), so decode is deterministic across runs/platforms for a given
  numpy — and is verified against an independent per-coefficient
  pure-Python oracle decoder (``oracles/jpeg_sim.py``).
- :func:`jpeg_encode` — the fixture-side twin (grayscale or 4:4:4
  color): Annex K quantization tables scaled by libjpeg's public quality
  curve, Annex K.3 standard Huffman tables, level shift -> 2D DCT ->
  quantize -> zigzag -> DC-difference/AC-run-length entropy coding with
  0xFF byte stuffing. Exists so tests can build valid bitstreams without
  any external codec; lossy by nature, so tests assert reconstruction
  error bounds plus EXACT decoder agreement on the same bytes.

Quantization makes JPEG lossy; what must match exactly is the DECODER:
both implementations must produce identical sample values from identical
bytes, which the tests pin per filter of the pipeline (Huffman symbols,
dequantized coefficients, IDCT output, final RGB).
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables (ITU-T T.81 Annex K — public) --------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ]
)

# Annex K.3 standard Huffman specs: (BITS counts[1..16], HUFFVAL)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """The 8x8 DCT-II basis C: forward D = C @ B @ C.T, inverse C.T @ D @ C."""
    k = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the public libjpeg quality curve."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = lambda t: np.clip((t * scale + 50) // 100, 1, 255)  # noqa: E731
    return q(_Q_LUMA), q(_Q_CHROMA)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    blk: np.ndarray, qtab: np.ndarray, dc_codes, ac_codes, pred: int, bw: _BitWriter
) -> int:
    d = _C @ (blk.astype(np.float64) - 128.0) @ _C.T
    q = np.round(d.ravel() / qtab.reshape(8, 8).ravel()).astype(np.int64)
    zz = q[ZIGZAG]
    dc, diff = int(zz[0]), int(zz[0]) - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(diff if diff > 0 else diff - 1 + (1 << s), s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if (zz[1:] != 0).any() else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v > 0 else v - 1 + (1 << s), s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return dc



#: the subsampling modes both encoders accept (shared validation)
SUBSAMPLE_MODES = ("444", "420", "422", "440")


def downsample_chroma(planes, subsample: str, h: int, w: int):
    """Shared chroma-downsample for BOTH encoders (baseline + progressive)
    -> (planes, samps). The progressive/baseline pixel-exact parity
    oracle depends on the two encoders producing bit-identical
    downsampled planes, so this lives in ONE place by construction."""
    if subsample not in SUBSAMPLE_MODES:
        raise ValueError(
            f"subsample must be 444/420/422/440, got {subsample!r}"
        )
    if subsample == "420":
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        for i in (1, 2):
            p = np.pad(planes[i], ((0, eh - h), (0, ew - w)), mode="edge")
            planes[i] = (
                p[0::2, 0::2] + p[0::2, 1::2]
                + p[1::2, 0::2] + p[1::2, 1::2]
            ) / 4.0
        return planes, [(2, 2), (1, 1), (1, 1)]
    if subsample == "422":
        ew = -(-w // 2) * 2
        for i in (1, 2):
            p = np.pad(planes[i], ((0, 0), (0, ew - w)), mode="edge")
            planes[i] = (p[:, 0::2] + p[:, 1::2]) / 2.0
        return planes, [(2, 1), (1, 1), (1, 1)]
    if subsample == "440":
        eh = -(-h // 2) * 2
        for i in (1, 2):
            p = np.pad(planes[i], ((0, eh - h), (0, 0)), mode="edge")
            planes[i] = (p[0::2, :] + p[1::2, :]) / 2.0
        return planes, [(1, 2), (1, 1), (1, 1)]
    return planes, [(1, 1), (1, 1), (1, 1)]


def jpeg_encode(
    img: np.ndarray, quality: int = 90, subsample: str = "444"
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes.

    Color uses the JFIF full-range YCbCr forward transform; ``subsample``
    is "444" (chroma at full resolution, components 1x1), "420" (chroma
    2x2-box-averaged, luma sampling 2x2 — interleaved 4-Y-block MCUs), or
    "422" (chroma averaged horizontally only, luma 2x1) or "440"
    (vertically only, luma 1x2) — r5.
    Dimensions are edge-padded to the MCU grid.
    """
    if img.dtype != np.uint8:
        raise ValueError("8-bit samples only")
    if subsample not in SUBSAMPLE_MODES:
        raise ValueError(
            f"subsample must be 444/420/422/440, got {subsample!r}"
        )
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qy, qc = quality_tables(quality)
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        planes, samps = downsample_chroma(planes, subsample, h, w)
    planes = [np.clip(np.round(p), 0, 255) for p in planes]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )
    out.append(seg(0xFFDB, b"\x00" + bytes(qy[ZIGZAG].astype(np.uint8))))
    if not gray:
        out.append(seg(0xFFDB, b"\x01" + bytes(qc[ZIGZAG].astype(np.uint8))))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samps[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out.append(seg(0xFFC0, sof))
    hts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        hts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tc, (bits, vals) in hts:
        out.append(seg(0xFFC4, bytes([tc] + bits + vals)))
    sos = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    out.append(seg(0xFFDA, sos + b"\x00\x3f\x00"))

    dc_y = _canonical_codes(*_DC_LUMA)
    ac_y = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for ci, p in enumerate(planes):
        hi, vi = samps[ci]
        th, tw = mcuy * vi * 8, mcux * hi * 8
        padded.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
        )
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = samps[ci]
                qt = qy if ci == 0 else qc
                dcc = dc_y if ci == 0 else dc_c
                acc = ac_y if ci == 0 else ac_c
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(
                            blk, qt, dcc, acc, preds[ci], bw
                        )
    out.append(bw.flush())
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


# --- decoder ---------------------------------------------------------------


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_past_restart(self) -> None:
        """Consume the pending RSTn marker and byte-align."""
        self.acc = 0
        self.n = 0
        if not (
            self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, byte: int) -> None:
        self.byte = byte


def _decode_tree(bits: list[int], vals: list[int]):
    """(code,length) -> value lookup as {(length, code): value}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_huff(br: _BitReader, table) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) grayscale or (h, w, 3) RGB uint8.

    Malformed input contract (T3 policy, ADVICE r03): ANY structurally
    broken payload — truncated mid-segment or mid-scan, short marker
    lengths, missing tables — raises ``ValueError``, never a bare
    ``IndexError``/``struct.error``/``KeyError``, so callers implementing
    the malformed-payload-to-NULL policy can catch one exception type.
    """
    try:
        return _jpeg_decode_impl(data)
    except (IndexError, struct.error, KeyError) as exc:
        raise ValueError(f"truncated or corrupt JPEG: {exc!r}") from exc


def _jpeg_decode_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, hi, vi, tq)
    h = w = None
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _decode_tree(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            depth, h, w, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise ValueError("8-bit precision only")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(f"sampling factor {hi}x{vi} unsupported")
                comps.append((cid, hi, vi, tq))
        elif marker == 0xC2:  # SOF2: progressive DCT (r4 — real decode)
            from logcrawler_spark.operators.jpeg_progressive import (
                decode_progressive,
            )

            return decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: "
                "progressive/arithmetic) not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            pos += seg_len
            break  # entropy-coded data follows
        pos += seg_len
    if comps is None or scan is None:
        raise ValueError("truncated JPEG (no SOF/SOS)")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for _, hi, vi, _ in comps:
        planes.append(np.zeros((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64))

    scan_by_cid = {cs: (td, ta) for cs, td, ta in scan}
    br = _BitReader(data, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_past_restart()
                preds = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                td, ta = scan_by_cid[cid]
                for by in range(vi):
                    for bx in range(hi):
                        s = _read_huff(br, htabs[(0, td)])
                        diff = _extend(br.bits(s), s) if s else 0
                        preds[cid] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = _read_huff(br, htabs[(1, ta)])
                            r, sz = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC index overrun")
                            zz[k] = _extend(br.bits(sz), sz)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qtabs[tq][ZIGZAG]
                        blk = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk

    out_planes = []
    for ci, (cid, hi, vi, _) in enumerate(comps):
        p = planes[ci]
        if hi < hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi < vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
