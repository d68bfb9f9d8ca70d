"""WARC source — the Common-Crawl container format for the pages table.

BASELINE.json's input is an Iceberg table of "Common-Crawl-style web
pages"; at ingest those pages arrive as WARC files. This reader handles
the subset a crawler emits/consumes (ISO 28500 WARC/1.0, public spec):

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...          (WARC-Type, WARC-Target-URI,
    \\r\\n                                     WARC-Date, Content-Length)
    <Content-Length bytes of block>
    \\r\\n\\r\\n                                (record separator)

``*.warc.gz`` files are whole-file (possibly multi-member) gzip — each
file is decompressed in the kernel before the record walk; Common Crawl's
per-record gzip members concatenate into exactly this shape.

Plan shape mirrors ``sources.binlog``: ``binaryFile`` (one task per file,
thousands of WARCs parallelize across executors) + an Arrow-batched
``mapInPandas`` record walk. A record whose declared block crosses EOF is
dropped (the T3 truncated-tail policy). Unlike the binlog readers the
payload is emitted inline rather than as extents: for gz inputs byte
extents would address the DECOMPRESSED stream, so lazy re-slicing from the
file is not possible anyway.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, record_index long, warc_type string, url string, "
    "warc_date string, content_length long, payload binary"
)

_SEP = b"\r\n\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (Common Crawl layout)."""
    out = []
    while data:
        d = zlib.decompressobj(47)  # gzip wrapper
        out.append(d.decompress(data))
        out.append(d.flush())
        if not d.eof:
            break  # truncated member: keep what decoded (T3)
        data = d.unused_data.lstrip(b"\x00")
    return b"".join(out)


def parse_warc_bytes(blob: bytes) -> list[tuple]:
    """(record_index, warc_type, url, warc_date, content_length, payload)
    per complete record; truncated tails dropped."""
    out: list[tuple] = []
    pos = 0
    idx = 0
    n = len(blob)
    while True:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = blob.find(_SEP, start)
        if head_end < 0:
            break  # truncated header block
        headers: dict[str, str] = {}
        lines = blob[start:head_end].split(b"\r\n")
        for line in lines[1:]:  # line 0 = version
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + len(_SEP)
            continue  # malformed record: skip past its header (T3)
        body_start = head_end + len(_SEP)
        if body_start + length > n:
            break  # truncated tail payload -> drop (T3)
        out.append(
            (
                idx,
                headers.get("warc-type", ""),
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                length,
                blob[body_start : body_start + length],
            )
        )
        idx += 1
        pos = body_start + length
    return out


def _split_warc_files(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows: list[tuple] = []
        for path, content in zip(pdf["path"], pdf["content"]):
            blob = bytes(content)
            if path.endswith(".gz"):
                blob = _gunzip_members(blob)
            for rec in parse_warc_bytes(blob):
                rows.append((path, *rec))
        yield pd.DataFrame(
            rows,
            columns=[
                "path", "record_index", "warc_type", "url",
                "warc_date", "content_length", "payload",
            ],
        )


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC scan -> (path, record_index, warc_type, url, warc_date,
    content_length, payload)."""
    files = spark.read.format("binaryFile").load(path_glob)
    return files.select("path", "content").mapInPandas(
        _split_warc_files, schema=WARC_SCHEMA
    )


def stream_warc(spark: SparkSession, path_dir: str) -> DataFrame:
    """Streaming WARC ingest: archives dropped into ``path_dir`` surface as
    record rows micro-batch by micro-batch (same kernel as the batch scan —
    the T5 continuous-ingest twin; the file-source checkpoint gives
    exactly-once per archive)."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long,"
            " content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .load(path_dir)
    )
    return files.select("path", "content").mapInPandas(
        _split_warc_files, schema=WARC_SCHEMA
    )


def pages_from_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """WARC response records -> the crawl engine's pages input table
    (url, warc_ts, html) per BASELINE.json's input_hint — the ingest path
    from raw Common Crawl archives into ``plans.frontier.run_crawl``."""
    from pyspark.sql import functions as F

    w = read_warc(spark, path_glob)
    return w.filter(F.col("warc_type") == "response").select(
        F.col("url"),
        F.to_timestamp(
            F.col("warc_date"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("warc_ts"),
        F.col("payload").alias("html"),
    )


def write_warc_bytes(records: list[dict]) -> bytes:
    """Serialize records (dicts with warc_type/url/warc_date/payload) —
    used by tests and the synthetic-fixture queries."""
    out = bytearray()
    for r in records:
        payload = r["payload"]
        head = (
            b"WARC/1.0\r\n"
            + b"WARC-Type: " + r["warc_type"].encode() + b"\r\n"
            + b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            + b"WARC-Date: " + r["warc_date"].encode() + b"\r\n"
            + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
        )
        # header lines each end CRLF; the blank line adds ONE more CRLF,
        # then the block, then the CRLF CRLF record separator
        out += head + b"\r\n" + payload + _SEP
    return bytes(out)
