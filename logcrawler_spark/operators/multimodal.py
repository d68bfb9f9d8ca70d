"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (training-data-pipeline extension): image/audio/video travel as
``binary`` columns next to typed metadata structs; decode / feature-extract
/ resize / frame-sample are Arrow-batched ``mapInPandas`` kernels so one
Python invocation handles ~10k payloads and the shuffle plan never sees
decoded data (decode late, after filters prune).

The actual codec calls are STUBBED — PIL/ffmpeg are not in this image — as
clearly-marked ``NotImplementedError`` raises plus a deterministic fake
decoder that keeps the Spark-side contract (schema, batch shape,
partitioning) real and testable. Reference analog for the kernel style:
the vectorized YUV->RGB decode (``06_extract_images.py:207-229``) and the
per-image stats kernel (``13_calculate_image_stats.py:32-35,86-96``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

META_SCHEMA = "doc_id long, n_bytes long, width int, height int, fmt string"


def real_image_decode(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload to (width, height, pixels).

    STUB: pillow/opencv are not available in this environment. At
    deployment this body becomes ``PIL.Image.open(io.BytesIO(payload))``;
    the surrounding Spark plumbing does not change.
    """
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use decode_blob_metadata (deterministic fake) for plumbing tests"
    )


def real_audio_frame_sample(payload: bytes, rate_hz: int):  # pragma: no cover
    """STUB: audio resample/frame-sample (no ffmpeg/soundfile in image)."""
    raise NotImplementedError("audio codec not available in this environment")


def _fake_meta(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic fake decode: metadata as pure arithmetic on payload
    length — engine-independent, so a SQL oracle can verify the plumbing."""
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int64"),
            "width": (n_bytes % 617 + 16).astype("int32"),
            "height": ((n_bytes * 7) % 471 + 16).astype("int32"),
            "fmt": "fake/" + (n_bytes % 3).astype(str),
        }
    )


def decode_blob_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, payload binary) -> (id, n_bytes, width, height, fmt).

    Arrow-batched mapInPandas; payload bytes never leave the executor.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[payload_col].map(lambda b: 0 if b is None else len(b))
            out = _fake_meta(n)
            out.insert(0, "doc_id", pdf[id_col].astype("int64").values)
            yield out

    return df.mapInPandas(_decode, schema=META_SCHEMA)
