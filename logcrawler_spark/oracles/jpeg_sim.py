"""Independent pure-Python baseline-JPEG decoder — the oracle twin of
``operators/jpeg_codec.jpeg_decode``.

A deliberately DIFFERENT implementation of ITU-T T.81: no numpy — bit
reading over a generator, Huffman decoding by walking (length, code)
pairs, and the textbook O(64^2) per-coefficient IDCT with ``math.cos``
evaluated inline (T.81 A.3.3 literally). Slow and only for small
fixtures; the engine must match its output sample-for-sample.
"""

from __future__ import annotations

import math
import struct

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_block(coef):
    """T.81 A.3.3 per-sample IDCT (list of 64 floats -> 8x8 list)."""
    out = [[0.0] * 8 for _ in range(8)]
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
                    cv = 1.0 / math.sqrt(2.0) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[v * 8 + u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y][x] = s / 4.0 + 128.0
    return out


class _Bits:
    def __init__(self, data, pos):
        self.data, self.pos, self.buf = data, pos, []

    def bit(self):
        if not self.buf:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    raise _Restart()
                else:
                    raise AssertionError(f"marker 0xFF{nxt:02X} in scan")
            else:
                self.pos += 1
            self.buf = [(b >> i) & 1 for i in range(7, -1, -1)]
        return self.buf.pop(0)

    def take(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self):
        self.buf = []
        self.pos += 2


class _Restart(Exception):
    pass


def _huff(bits, vals):
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read(br, tab):
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        if (ln, code) in tab:
            return tab[(ln, code)]
    raise AssertionError("bad huffman code")


def _ext(v, s):
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode_py(data):
    """JPEG bytes -> (pixels nested list [rows][cols] of int or (r,g,b),
    w, h, n_components)."""
    assert data[:2] == b"\xff\xd8"
    pos, qt, ht = 2, {}, {}
    comps = scan = None
    h = w = None
    dri = 0
    while pos < len(data):
        assert data[pos] == 0xFF
        m = data[pos + 1]
        pos += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + ln]
        if m == 0xDB:
            i = 0
            while i < len(body):
                assert body[i] >> 4 == 0
                tq = body[i] & 0xF
                tab = [0] * 64
                for j in range(64):
                    tab[_ZZ[j]] = body[i + 1 + j]
                qt[tq] = tab
                i += 65
        elif m == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bb = list(body[i + 1 : i + 17])
                n = sum(bb)
                ht[(tc, th)] = _huff(bb, list(body[i + 17 : i + 17 + n]))
                i += 17 + n
        elif m in (0xC0, 0xC1):
            depth, h, w, nc = struct.unpack(">BHHB", body[:6])
            assert depth == 8
            comps = [
                (
                    body[6 + 3 * c],
                    body[7 + 3 * c] >> 4,
                    body[7 + 3 * c] & 0xF,
                    body[8 + 3 * c],
                )
                for c in range(nc)
            ]
        elif m == 0xDD:
            (dri,) = struct.unpack(">H", body[:2])
        elif m == 0xDA:
            ns = body[0]
            scan = {
                body[1 + 2 * s]: (body[2 + 2 * s] >> 4, body[2 + 2 * s] & 0xF)
                for s in range(ns)
            }
            pos += ln
            break
        pos += ln
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        [[0.0] * (mcux * hi * 8) for _ in range(mcuy * vi * 8)]
        for _, hi, vi, _ in comps
    ]
    br = _Bits(data, pos)
    pred = {c[0]: 0 for c in comps}
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and nmcu and nmcu % dri == 0:
                br.restart()
                pred = {c[0]: 0 for c in comps}
            nmcu += 1
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                td, ta = scan[cid]
                for by in range(vi):
                    for bx in range(hi):
                        s = _read(br, ht[(0, td)])
                        pred[cid] += _ext(br.take(s), s) if s else 0
                        zz = [0] * 64
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _read(br, ht[(1, ta)])
                            if rs == 0:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += rs >> 4
                            zz[k] = _ext(br.take(rs & 0xF), rs & 0xF)
                            k += 1
                        coef = [0.0] * 64
                        for j in range(64):
                            coef[_ZZ[j]] = zz[j] * qt[tq][_ZZ[j]]
                        blk = _idct_block(coef)
                        for yy in range(8):
                            for xx in range(8):
                                planes[ci][(my * vi + by) * 8 + yy][
                                    (mx * hi + bx) * 8 + xx
                                ] = blk[yy][xx]
    # upsample + crop + color transform
    full = []
    for ci, (cid, hi, vi, _) in enumerate(comps):
        p = planes[ci]
        rows = []
        for y in range(h):
            src = p[y * vi // vmax] if vi < vmax else p[y]
            if hi < hmax:
                rows.append([src[x * hi // hmax] for x in range(w)])
            else:
                rows.append(src[:w])
        full.append(rows)

    def clamp(v):
        return max(0, min(255, int(round(v))))

    if len(full) == 1:
        return [[clamp(v) for v in row] for row in full[0]], w, h, 1
    out = []
    for y in range(h):
        row = []
        for x in range(w):
            yy, cb, cr = full[0][y][x], full[1][y][x], full[2][y][x]
            row.append(
                (
                    clamp(yy + 1.402 * (cr - 128.0)),
                    clamp(
                        yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
                    ),
                    clamp(yy + 1.772 * (cb - 128.0)),
                )
            )
        out.append(row)
    return out, w, h, 3
