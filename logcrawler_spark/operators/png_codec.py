"""REAL PNG container codec (pure stdlib zlib + numpy) and artifact sink.

The reference writes extracted camera frames as PNG files with experiment
metadata embedded in the image header (``06_extract_images.py:270-293``:
``PngInfo.add_text`` of camera matrix / frame fields before ``img.save``).
Round 2 re-realized that sink as struct columns; this module closes the
gap with an actual file-artifact writer and a complete, dependency-free
PNG implementation (ISO/IEC 15948 / RFC 2083 — public spec):

- :func:`png_encode` — 8-bit grayscale / RGB / RGBA, metadata as ``tEXt``
  chunks, filter type 0 scanlines, one zlib IDAT. Deterministic for a
  given zlib (the container ships one zlib; both test engines call it).
- :func:`png_decode` — chunk walk + IHDR/tEXt/IDAT parse, zlib inflate,
  and ALL five scanline filters (None/Sub/Up/Average/Paeth) so it reads
  foreign baseline PNGs too, not just this encoder's output. Adam7
  interlacing is fully supported (r4): each non-empty pass unfilters as
  an independent sub-image and scatters on the pass grid, for both
  decode and (filter-0) encode. Verified against an independent
  per-pixel pure-Python oracle decoder (``oracles/png_sim.py``) on every
  filter type, interlaced and sequential.
- :func:`write_png_artifacts` — the S10 media sink as REAL files: an
  Arrow-batched ``mapInPandas`` kernel encodes each row's frame, writes
  ``<dir>/<name>.png``, and emits a manifest row (path, bytes, sha256,
  dims) — the artifact write happens executor-side, one task per input
  partition, no driver fan-in; the manifest is the (small) query-able
  result. Re-running a task overwrites its own files byte-identically
  (idempotent, like the reference's marker-guarded extract).
"""

from __future__ import annotations

import hashlib
import os
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}

#: Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass (RFC 2083
#: §2.6 — the public interlace schedule). Passes whose sub-image is empty
#: for the given dimensions contribute NO bytes (not even filter bytes).
ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _adam7_dims(w: int, h: int):
    """Per-pass (pass_w, pass_h, x0, y0, dx, dy), empty passes included
    with zero dims."""
    out = []
    for x0, y0, dx, dy in ADAM7:
        pw = max(0, -(-(w - x0) // dx)) if w > x0 else 0
        ph = max(0, -(-(h - y0) // dy)) if h > y0 else 0
        out.append((pw, ph, x0, y0, dx, dy))
    return out


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(
    img: np.ndarray,
    text_meta: dict[str, str] | None = None,
    interlace: bool = False,
) -> bytes:
    """(h, w) grayscale, (h, w, 3) RGB or (h, w, 4) RGBA uint8 -> PNG bytes.

    ``text_meta`` becomes one ``tEXt`` chunk per key (latin-1, the spec's
    charset), written in sorted-key order so the output is deterministic.
    ``interlace=True`` writes Adam7 (r4): the IDAT stream is the 7 passes'
    scanlines in schedule order, each with its own filter byte (type 0).
    """
    if img.dtype != np.uint8:
        raise ValueError(f"8-bit samples only, got {img.dtype}")
    if img.ndim == 2:
        color, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    for k in sorted(text_meta or {}):
        kb = k.encode("latin-1")
        if not 0 < len(kb) < 80 or b"\x00" in kb:
            raise ValueError(f"invalid tEXt keyword {k!r}")
        out.append(
            _chunk(b"tEXt", kb + b"\x00" + str(text_meta[k]).encode("latin-1"))
        )
    img3 = img.reshape(h, w, channels)
    if interlace:
        parts = []
        for pw, ph, x0, y0, dx, dy in _adam7_dims(w, h):
            if pw == 0 or ph == 0:
                continue  # empty pass: no bytes at all
            sub = img3[y0::dy, x0::dx].reshape(ph, pw * channels)
            raw = np.empty((ph, 1 + pw * channels), dtype=np.uint8)
            raw[:, 0] = 0
            raw[:, 1:] = sub
            parts.append(raw.tobytes())
        payload = b"".join(parts)
    else:
        # filter byte 0 (None) per scanline; rows of w*channels samples
        raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
        raw[:, 0] = 0
        raw[:, 1:] = img3.reshape(h, w * channels)
        payload = raw.tobytes()
    out.append(_chunk(b"IDAT", zlib.compress(payload, 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _unfilter(
    raw: bytes, w: int, h: int, channels: int
) -> np.ndarray:
    """Reverse PNG scanline filtering -> (h, w*channels) uint8.

    Sub/Average/Paeth carry a left-neighbor dependency, so each scanline
    decodes with a per-pixel-column loop over numpy row vectors — rows
    themselves stream once, and the common filter-0/2 rows stay fully
    vectorized.
    """
    stride = w * channels
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels
    for r in range(h):
        ft = int(rows[r, 0])
        line = rows[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ft == 1:  # Sub
                    pred = a
                elif ft == 3:  # Average
                    pred = (a + b) >> 1
                else:  # Paeth
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = cur.astype(np.uint8)
    return out


def png_decode(data: bytes) -> tuple[np.ndarray, dict[str, str]]:
    """PNG bytes -> (image array, tEXt metadata dict).

    8-bit depth, color types 0 (gray, -> (h,w)), 2 (RGB) and 6 (RGBA,
    -> (h,w,c)); CRCs verified; both interlace methods handled (Adam7
    passes unfiltered independently and scattered — r4).
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, [], {}
    w = h = channels = None
    adam7 = False
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color type={color}); "
                    "8-bit gray/RGB/RGBA only"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
            adam7 = bool(interlace)
            channels = _CHANNELS[color]
        elif tag == b"tEXt":
            k, _, v = body.partition(b"\x00")
            meta[k.decode("latin-1")] = v.decode("latin-1")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR or IDAT)")
    raw = zlib.decompress(b"".join(idat))
    if adam7:
        # r4: real Adam7 — each non-empty pass is an independent filtered
        # sub-image; unfilter it and scatter on the pass grid
        out = np.zeros((h, w, channels), dtype=np.uint8)
        pos2 = 0
        for pw, ph, x0, y0, dx, dy in _adam7_dims(w, h):
            if pw == 0 or ph == 0:
                continue
            n = ph * (1 + pw * channels)
            chunk = raw[pos2 : pos2 + n]
            if len(chunk) != n:
                raise ValueError("PNG pixel data length mismatch")
            pos2 += n
            sub = _unfilter(chunk, pw, ph, channels)
            out[y0::dy, x0::dx] = sub.reshape(ph, pw, channels)
        if pos2 != len(raw):
            raise ValueError("PNG pixel data length mismatch")
        img = out.reshape(h, w) if channels == 1 else out
        return img, meta
    if len(raw) != h * (1 + w * channels):
        raise ValueError("PNG pixel data length mismatch")
    flat = _unfilter(raw, w, h, channels)
    img = flat.reshape(h, w) if channels == 1 else flat.reshape(h, w, channels)
    return img, meta


MANIFEST_SCHEMA = (
    "name string, path string, width int, height int, n_bytes long, "
    "sha256 string"
)


def write_png_artifacts(
    df: DataFrame,
    out_dir: str,
    name_col: str = "name",
    payload_col: str = "payload",
    width_col: str = "width",
    height_col: str = "height",
    meta_cols: list[str] | None = None,
    payload_format: str = "yuv422",
) -> DataFrame:
    """Media sink with metadata (S10) as REAL artifact files.

    Each row's raw frame (``payload_format``: "yuv422" decoded via the
    BT.601 kernel, or "gray8" used as-is) is PNG-encoded with the row's
    ``meta_cols`` values embedded as tEXt header fields (the reference's
    PngInfo.add_text, ``06_extract_images.py:270-293``) and written to
    ``<out_dir>/<name>.png`` executor-side. Returns the lazy manifest —
    the write happens when the manifest is acted on, one task per input
    partition, no data through the driver.
    """
    from logcrawler_spark.operators.multimodal import decode_yuv422_rgb

    metas = list(meta_cols or [])
    cols = [name_col, payload_col, width_col, height_col, *metas]

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                wv, hv = int(row[width_col]), int(row[height_col])
                payload = bytes(row[payload_col])
                if payload_format == "yuv422":
                    img = decode_yuv422_rgb(payload, wv, hv)
                elif payload_format == "gray8":
                    img = np.frombuffer(payload, dtype=np.uint8).reshape(
                        hv, wv
                    )
                else:
                    raise ValueError(
                        f"unknown payload_format {payload_format!r}"
                    )
                blob = png_encode(
                    img, {m: str(row[m]) for m in metas}
                )
                path = os.path.join(out_dir, f"{row[name_col]}.png")
                with open(path, "wb") as f:
                    f.write(blob)
                rows.append(
                    {
                        "name": str(row[name_col]),
                        "path": path,
                        "width": wv,
                        "height": hv,
                        "n_bytes": len(blob),
                        "sha256": hashlib.sha256(blob).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "name", "path", "width", "height", "n_bytes", "sha256"
                ],
            )

    return df.select(*cols).mapInPandas(_write, schema=MANIFEST_SCHEMA)


def read_png_artifacts(spark, glob_path: str) -> DataFrame:
    """Read PNG artifacts back: binaryFile scan + executor-side decode to
    (name, width, height, meta map, pixel-moment stats) — the full image
    never leaves the executor, only queryable scalars do."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                img, meta = png_decode(bytes(content))
                gray = img if img.ndim == 2 else img[..., :3].mean(axis=2)
                rows.append(
                    {
                        "name": os.path.splitext(os.path.basename(path))[0],
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "meta": meta,
                        "sum_pix": int(img.astype(np.int64).sum()),
                        "mean_gray": float(gray.mean()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "name", "width", "height", "meta", "sum_pix", "mean_gray"
                ],
            )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(glob_path)
        .select("path", "content")
        .mapInPandas(
            _decode,
            schema=(
                "name string, width int, height int, meta map<string,string>,"
                " sum_pix long, mean_gray double"
            ),
        )
    )
