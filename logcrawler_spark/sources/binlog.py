"""Binary record-log sources — the reference's scan formats on Spark.

Two record formats, re-realized over ``spark.read.format('binaryFile')``
plus an Arrow-batched ``mapInPandas`` splitter (SURVEY.md §2.1 S2/S3/S4):

- *naoth-style framed log* (``/root/reference/src/reader.rs:17-56``,
  ``src/scanner.rs:11-81``): flat sequence of records
  ``(frame_number: i32 LE, name: NUL-terminated str, size: i32 LE,
  payload: size bytes)``. Consecutive records with the same frame number
  form a frame; a trailing record whose payload extends past EOF is dropped
  (``src/scanner.rs:73-77`` — the T3 late/broken-data policy); duplicate
  names within a frame collapse last-writer-wins (``src/lib.rs:97`` U4).

- *fixed-stride image log* (``02_combine_logs.py:19-68`` S3): records of
  ``(frame_number: u32 LE, payload: stride bytes)``; a truncated trailing
  record is dropped; top/bottom camera is inferred by record-position
  parity with a configurable first label (``02_combine_logs.py:24-68``,
  year rule at ``:198-209`` — W2).

Both readers emit **offset/size extents, not payload copies**, mirroring
the reference's lazy slicing (``src/lib.rs:109-134`` P2/R1): downstream
stages project the extent columns and slice only the payloads they need
(``slice_payload``). numpy does the record walk — the per-file loop is
O(records) with zero Python-per-byte work.

Scale shape: one task per file (binaryFile splits at file granularity);
thousands of log files parallelize across executors; a single mega-file is
the skew case and would be split by offset ranges (not needed at sandbox
scale; the fixed-stride format supports it trivially since offsets are
computable).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FRAMED_SCHEMA = (
    "path string, frame_number int, name string, offset long, size long"
)
STRIDE_SCHEMA = (
    "path string, record_index long, frame_number long, offset long, "
    "size long, camera string"
)


def _parse_framed(content: bytes, path: str) -> list[tuple]:
    """Walk one framed log; returns (path, frame#, name, payload_off, size).

    Drops a trailing record whose declared payload crosses EOF
    (src/scanner.rs:73-77). Within a frame, duplicate names keep the LAST
    occurrence (src/lib.rs:97).
    """
    out: dict[tuple[int, str], tuple] = {}
    n = len(content)
    pos = 0
    while pos + 4 <= n:
        frame_number = int.from_bytes(content[pos : pos + 4], "little", signed=True)
        nul = content.find(b"\x00", pos + 4)
        if nul < 0 or nul + 5 > n:
            break  # truncated name/size header
        name = content[pos + 4 : nul].decode("utf-8", "replace")
        size = int.from_bytes(content[nul + 1 : nul + 5], "little", signed=True)
        payload_off = nul + 5
        if size < 0 or payload_off + size > n:
            break  # truncated trailing payload -> drop (T3)
        # last-writer-wins per (frame, name)
        out[(frame_number, name)] = (path, frame_number, name, payload_off, size)
        pos = payload_off + size
    return list(out.values())


def read_framed_log(spark: SparkSession, path_glob: str) -> DataFrame:
    """Framed-log scan -> (path, frame_number, name, offset, size)."""
    files = spark.read.format("binaryFile").load(path_glob)

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_framed(bytes(content), path))
            yield pd.DataFrame(
                rows,
                columns=["path", "frame_number", "name", "offset", "size"],
            )

    return files.select("path", "content").mapInPandas(
        split, schema=FRAMED_SCHEMA
    )


def read_stride_log(
    spark: SparkSession,
    path_glob: str,
    stride: int,
    first_is_top: bool = True,
) -> DataFrame:
    """Fixed-stride scan -> (path, record_index, frame_number, offset, size,
    camera); truncated trailing record dropped; camera alternates by parity
    starting from ``first_is_top`` (02_combine_logs.py:24-68)."""
    files = spark.read.format("binaryFile").load(path_glob)
    rec = 4 + stride

    def split(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames_all = []
            for path, content in zip(pdf["path"], pdf["content"]):
                b = bytes(content)
                n_rec = len(b) // rec  # integer division drops the tail (T3)
                if n_rec == 0:
                    continue
                arr = np.frombuffer(b[: n_rec * rec], dtype=np.uint8).reshape(
                    n_rec, rec
                )
                frame_numbers = arr[:, :4].copy().view("<u4").ravel().astype("int64")
                idx = np.arange(n_rec, dtype="int64")
                top_on_even = first_is_top
                camera = np.where(
                    (idx % 2 == 0) == top_on_even, "Top", "Bottom"
                )
                frames_all.append(
                    pd.DataFrame(
                        {
                            "path": path,
                            "record_index": idx,
                            "frame_number": frame_numbers,
                            "offset": idx * rec + 4,
                            "size": stride,
                            "camera": camera,
                        }
                    )
                )
            yield (
                pd.concat(frames_all, ignore_index=True)
                if frames_all
                else pd.DataFrame(
                    {
                        "path": pd.Series(dtype="str"),
                        "record_index": pd.Series(dtype="int64"),
                        "frame_number": pd.Series(dtype="int64"),
                        "offset": pd.Series(dtype="int64"),
                        "size": pd.Series(dtype="int64"),
                        "camera": pd.Series(dtype="str"),
                    }
                )
            )

    return files.select("path", "content").mapInPandas(
        split, schema=STRIDE_SCHEMA
    )


def slice_payload(
    extents: DataFrame, spark: SparkSession
) -> DataFrame:
    """Join extents back to file bytes and slice payloads (the lazy
    materialization step — only called for the extents that survive
    upstream filters, mirroring src/lib.rs:109-134)."""
    paths = [r["path"] for r in extents.select("path").distinct().collect()]
    files = (
        spark.read.format("binaryFile")
        .load(paths)
        .select("path", "content")
    )
    joined = extents.join(F.broadcast(files), on="path")
    return joined.withColumn(
        "payload",
        F.expr("substring(content, cast(offset as int) + 1, cast(size as int))"),
    ).drop("content")


def frames_of(framed: DataFrame) -> DataFrame:
    """Group records into frames: (path, frame_number, fields map<name,
    struct<offset,size>>) — the reference's Frame type (src/frame.rs:2-7)."""
    return (
        framed.groupBy("path", "frame_number")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("name"),
                        F.struct(F.col("offset"), F.col("size")),
                    )
                )
            ).alias("fields")
        )
    )
