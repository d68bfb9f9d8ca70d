"""WAV PCM + MJPEG-in-AVI kernels vs the independent pure-Python oracle
(closes the last codec stub — VERDICT r03 item 5)."""

from __future__ import annotations

import numpy as np
import pytest

from logcrawler_spark.operators.av_codec import (
    audio_frame_sample,
    audio_stats,
    avi_mjpeg_encode,
    avi_mjpeg_split,
    video_frame_stats,
    wav_decode,
    wav_encode,
)
from logcrawler_spark.oracles.av_sim import avi_frames_py, wav_decode_py


def _rng():
    return np.random.default_rng(20260817)


def _tone(n=4410, ch=2, amp=12000):
    t = np.arange(n)[:, None]
    f = np.array([[440.0, 523.25][c] for c in range(ch)])[None, :]
    return (amp * np.sin(2 * np.pi * f * t / 44100)).astype(np.int16)


# ------------------------------------------------------------------ WAV --

@pytest.mark.parametrize("bits,ch", [(16, 1), (16, 2), (8, 1), (8, 3)])
def test_wav_roundtrip_matches_oracle(bits, ch):
    if bits == 16:
        s = _tone(1000, ch)
    else:
        s = (_rng().integers(0, 256, size=(1000, ch))).astype(np.uint8)
    data = wav_encode(s, 44100, bits=bits)
    rate, got = wav_decode(data)
    o_rate, o_ch, o_frames = wav_decode_py(data)
    assert rate == o_rate == 44100
    assert o_ch == ch
    assert got.shape == (1000, ch)
    assert got.tolist() == o_frames
    if bits == 16:
        assert got.tolist() == s.astype(np.int32).tolist()
    else:
        assert got.tolist() == (s.astype(np.int32) - 128).tolist()


def test_wav_skips_unknown_chunks_and_word_aligns():
    s = _tone(101, 1)  # odd data length in bytes? 202 bytes (even); use 8-bit
    base = wav_encode(s, 8000)
    # splice an odd-length junk chunk between fmt and data
    fmt_end = base.find(b"data")
    junk = b"JUNK" + (3).to_bytes(4, "little") + b"abc" + b"\x00"
    data = base[:fmt_end] + junk + base[fmt_end:]
    data = data[:4] + (len(data) - 8).to_bytes(4, "little") + data[8:]
    rate, got = wav_decode(data)
    assert rate == 8000 and got.shape == (101, 1)
    o_rate, _o_ch, o_frames = wav_decode_py(data)
    assert got.tolist() == o_frames


def test_wav_malformed_raises_valueerror_only():
    s = _tone(500, 2)
    data = wav_encode(s, 22050)
    for cut in (0, 3, 7, 11, 20, 40, len(data) // 2):
        try:
            wav_decode(data[:cut])
        except ValueError:
            pass  # the only allowed failure type
    with pytest.raises(ValueError):
        wav_decode(b"RIFFxxxxWAVE")  # no chunks at all


def test_wav_zero_sample_rate_raises_valueerror():
    """A structurally valid fmt chunk declaring rate_hz=0 must fail the T3
    ValueError-only contract in BOTH engines — downstream duration/resample
    math divides by the declared rate (ADVICE r04)."""
    data = bytearray(wav_encode(_tone(16, 1), 8000))
    at = bytes(data).find(b"fmt ") + 8  # fmt body: tag(2) ch(2) rate(4)
    data[at + 4 : at + 8] = (0).to_bytes(4, "little")
    with pytest.raises(ValueError):
        wav_decode(bytes(data))
    with pytest.raises(ValueError):
        wav_decode_py(bytes(data))
    with pytest.raises(ValueError):
        audio_frame_sample(bytes(data), 4000)


def test_audio_frame_sample_nearest_index():
    s = np.arange(1000, dtype=np.int16)[:, None]
    data = wav_encode(s, 1000)
    rate, out = audio_frame_sample(bytes(data), 250)
    assert rate == 250
    # out[i] = in[(i * 1000) // 250] = in[4i]
    assert out[:, 0].tolist() == list(range(0, 1000, 4))
    # upsample: out[i] = in[(i * 1000) // 2000] = in[i // 2]
    _, up = audio_frame_sample(bytes(data), 2000)
    assert up[:10, 0].tolist() == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]


# ------------------------------------------------------------------ AVI --

def _frames(n=4, w=16, h=16):
    from logcrawler_spark.operators.jpeg_codec import jpeg_encode

    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        img = np.clip(
            128 + 60 * np.sin((x + y + 7 * i) / 5.0), 0, 255
        ).astype(np.uint8)
        out.append(jpeg_encode(img, quality=85))
    return out


def test_avi_split_roundtrip_matches_oracle():
    frames = _frames(5)
    data = avi_mjpeg_encode(frames, 16, 16, fps=10)
    got = avi_mjpeg_split(data)
    assert got == frames
    assert avi_frames_py(data) == frames


def test_avi_frames_decode_with_in_repo_jpeg():
    from logcrawler_spark.operators.jpeg_codec import jpeg_decode

    frames = _frames(3)
    data = avi_mjpeg_encode(frames, 16, 16)
    for f in avi_mjpeg_split(data):
        img = jpeg_decode(f)
        assert img.shape == (16, 16)


def test_avi_malformed_raises_valueerror_only():
    data = avi_mjpeg_encode(_frames(2), 16, 16)
    for cut in (0, 3, 10, 30, len(data) // 2, len(data) - 3):
        try:
            avi_mjpeg_split(data[:cut])
        except ValueError:
            pass
    with pytest.raises(ValueError):
        avi_mjpeg_split(b"RIFF\x04\x00\x00\x00WAVE")


# --------------------------------------------------------- Spark kernels --

def test_audio_stats_kernel_exact_moments(spark):
    clips = []
    expect = {}
    for cid in range(3):
        s = _tone(500 + 100 * cid, ch=1 + cid % 2, amp=5000 + cid)
        flat = s.astype(np.int64).ravel()
        expect[cid] = (
            int(flat.size), int(flat.sum()), int((flat * flat).sum()),
            int(np.abs(flat).max()),
        )
        clips.append((cid, bytearray(wav_encode(s, 16000))))
    clips.append((99, bytearray(b"not a wav at all")))  # T3: NULL row
    df = spark.createDataFrame(clips, "clip_id long, payload binary")
    rows = {r["clip_id"]: r for r in audio_stats(df).collect()}
    for cid, (n, sa, sq, pk) in expect.items():
        r = rows[cid]
        assert (r["n_samples"], r["sum_amp"], r["sum_amp_sq"], r["peak"]) == (
            n, sa, sq, pk
        )
        assert r["mean_amp"] == sa / n
    assert rows[99]["n_samples"] is None  # malformed -> NULL, not a crash


def test_video_frame_stats_kernel_samples_every_nth(spark):
    from logcrawler_spark.operators.jpeg_codec import jpeg_decode

    frames = _frames(6)
    avi = avi_mjpeg_encode(frames, 16, 16)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"junk"))],
        "clip_id long, payload binary",
    )
    rows = video_frame_stats(df, every_nth=2).collect()
    by_key = {(r["clip_id"], r["frame_idx"]): r for r in rows}
    assert set(by_key) == {(1, 0), (1, 2), (1, 4)}  # clip 2 dropped (T3)
    for (cid, i), r in by_key.items():
        img = jpeg_decode(frames[i]).astype(np.int64)
        assert r["n_pix"] == 256 and r["sum_y"] == int(img.sum())
        assert r["brightness"] == img.sum() / img.size
