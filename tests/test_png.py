"""PNG codec + artifact sink (X2/S10): engine vs independent oracle,
all five scanline filters, and the Spark write/read-back loop."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from logcrawler_spark.operators.png_codec import (
    _chunk,
    png_decode,
    png_encode,
    read_png_artifacts,
    write_png_artifacts,
)
from logcrawler_spark.oracles.png_sim import png_decode_py


def _rng():
    return np.random.default_rng(20260816)


@pytest.mark.parametrize("shape", [(7, 5), (6, 4, 3), (5, 3, 4)])
def test_roundtrip_exact_with_metadata(shape):
    img = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    meta = {"camera": "TOP", "frame": "42", "cm_0": "0.125"}
    blob = png_encode(img, meta)
    out, got_meta = png_decode(blob)
    assert out.shape == img.shape and (out == img).all()
    assert got_meta == meta


def test_engine_decode_matches_independent_oracle():
    img = _rng().integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    blob = png_encode(img, {"k": "v"})
    eng, meta_e = png_decode(blob)
    pix, w, h, ch, meta_o = png_decode_py(blob)
    assert (w, h, ch) == (6, 9, 3) and meta_e == meta_o == {"k": "v"}
    oracle = np.array(
        [[list(p) for p in row] for row in pix], dtype=np.uint8
    )
    assert (eng == oracle).all()


def _filter_row(ft, cur, prev, bpp):
    """Spec-direction (encode) filtering — a THIRD implementation, inline,
    so the decoder tests don't trust either decoder's inverse."""
    out = bytearray([ft])
    for i, x in enumerate(cur):
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            pred = 0
        elif ft == 1:
            pred = a
        elif ft == 2:
            pred = b
        elif ft == 3:
            pred = (a + b) // 2
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((x - pred) & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("channels", [1, 3])
def test_all_five_filters_decode_exactly(channels):
    """Hand-build a PNG whose five scanlines use filters 0..4; both
    decoders must reproduce the original pixels byte-exactly."""
    h, w = 5, 4
    img = _rng().integers(0, 256, size=(h, w * channels), dtype=np.uint8)
    raw = bytearray()
    prev = bytes(w * channels)
    for r in range(h):
        cur = bytes(img[r])
        raw += _filter_row(r, cur, prev, channels)
        prev = cur
    color = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    eng, _ = png_decode(blob)
    assert (eng.reshape(h, w * channels) == img).all()
    pix, _, _, _, _ = png_decode_py(blob)
    flat = [
        (list(p) if channels == 1 else [v for t in p for v in t])
        for p in pix
    ] if channels != 1 else pix
    assert (np.array(flat, dtype=np.uint8) == img).all()


def test_decode_rejects_corruption_and_interlace():
    img = _rng().integers(0, 256, size=(4, 4), dtype=np.uint8)
    blob = bytearray(png_encode(img))
    blob[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(blob))
    # interlace=1 is SUPPORTED since r4; an unknown method still rejects,
    # and a truncated interlaced stream (IHDR but no IDAT) fails loudly
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 7)  # bogus method
    bad = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        png_decode(bad)
    ihdr1 = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    trunc = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr1) + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="truncated"):
        png_decode(trunc)
    with pytest.raises(ValueError, match="8-bit samples"):
        png_encode(np.zeros((2, 2), dtype=np.int32))
    with pytest.raises(ValueError, match="shape"):
        png_encode(np.zeros((2, 2, 2), dtype=np.uint8))


def test_spark_artifact_sink_roundtrip(spark, tmp_path):
    """Write YUV frames as PNG artifacts with embedded metadata via the
    Spark sink, read them back via binaryFile + decode, and check pixels,
    dims and header metadata survive exactly."""
    from logcrawler_spark.operators.multimodal import decode_yuv422_rgb

    w, h, n = 8, 6, 5
    rng = _rng()
    frames = [
        (f"f{i:03d}", rng.integers(0, 256, w * h * 2, dtype=np.uint8), i)
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [
            (name, bytes(payload), w, h, str(fn), "TOP")
            for name, payload, fn in frames
        ],
        "name string, payload binary, width int, height int, "
        "frame string, camera string",
    ).repartition(2)
    out_dir = str(tmp_path / "artifacts")
    manifest = write_png_artifacts(
        df, out_dir, meta_cols=["frame", "camera"]
    ).collect()
    assert len(manifest) == n
    assert all(m["n_bytes"] > 0 for m in manifest)

    # direct decode of one artifact: pixels == the YUV kernel's RGB,
    # metadata == the row's tEXt fields
    name, payload, fn = frames[2]
    img, meta = png_decode(open(f"{out_dir}/{name}.png", "rb").read())
    assert (img == decode_yuv422_rgb(bytes(payload), w, h)).all()
    assert meta == {"frame": str(fn), "camera": "TOP"}

    back = {r["name"]: r for r in read_png_artifacts(spark, out_dir).collect()}
    assert set(back) == {name for name, _, _ in frames}
    for name, payload, fn in frames:
        rgb = decode_yuv422_rgb(bytes(payload), w, h)
        r = back[name]
        assert (r["width"], r["height"]) == (w, h)
        assert r["meta"] == {"frame": str(fn), "camera": "TOP"}
        assert r["sum_pix"] == int(rgb.astype(np.int64).sum())


def test_adam7_interlaced_roundtrip_engine_and_oracle():
    """r4: real Adam7 — encode interlaced, decode exact on engine AND the
    independent per-pixel oracle, across gray/RGB/RGBA and tiny dims
    (empty passes contribute no bytes)."""
    import numpy as np

    from logcrawler_spark.oracles.png_sim import png_decode_py

    rng = np.random.default_rng(20260817)
    for trial in range(12):
        h, w = int(rng.integers(1, 33)), int(rng.integers(1, 33))
        ch = [0, 3, 4][trial % 3]
        shape = (h, w) if ch == 0 else (h, w, ch)
        img = rng.integers(0, 256, shape).astype(np.uint8)
        data = png_encode(img, {"m": str(trial)}, interlace=True)
        dec, meta = png_decode(data)
        assert meta == {"m": str(trial)}
        assert np.array_equal(dec, img)
        pix, ow, oh, och, _ = png_decode_py(data)
        if ch == 0:
            oarr = np.array(pix, dtype=np.uint8)
        else:
            oarr = np.array(
                [[list(p) for p in row] for row in pix], dtype=np.uint8
            )
        assert np.array_equal(oarr, img)


def test_adam7_foreign_filters_all_types():
    """A foreign interlaced encoder may use ANY scanline filter per pass;
    hand-build such a stream (filters cycle 0..4 per scanline within each
    pass) and require both decoders to recover the exact pixels."""
    import struct
    import zlib

    import numpy as np

    from logcrawler_spark.operators.png_codec import (
        ADAM7,
        _adam7_dims,
        _chunk,
    )
    from logcrawler_spark.oracles.png_sim import png_decode_py

    def forward_filter(sub, ft, prev, bpp):
        # literal RFC 2083 forward filters over one scanline
        out = bytearray(len(sub))
        for i in range(len(sub)):
            a = sub[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (sub[i] - pred) & 0xFF
        return out

    rng = np.random.default_rng(7)
    h, w, ch = 19, 27, 3
    img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    parts = []
    ftc = 0
    for pw, ph, x0, y0, dx, dy in _adam7_dims(w, h):
        if pw == 0 or ph == 0:
            continue
        sub = img[y0::dy, x0::dx].reshape(ph, pw * ch)
        prev = bytearray(pw * ch)
        for r in range(ph):
            ft = ftc % 5
            ftc += 1
            line = bytes(sub[r].tolist())
            parts.append(bytes([ft]) + bytes(forward_filter(line, ft, prev, ch)))
            prev = bytearray(line)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + _chunk(b"IEND", b"")
    )
    dec, _ = png_decode(data)
    assert np.array_equal(dec, img)
    pix, *_ = png_decode_py(data)
    oarr = np.array([[list(p) for p in row] for row in pix], dtype=np.uint8)
    assert np.array_equal(oarr, img)
