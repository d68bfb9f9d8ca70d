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

Memory envelope per task (the bound that matters for ~1 GB Common Crawl
archives that gunzip to ~4-5 GB): the compressed blob is pinned by the
``binaryFile`` row, but decompression and parsing are INCREMENTAL — gzip
members decode one at a time, each member's complete records are emitted
(and flushed to Arrow every ``_EMIT_ROWS`` rows), and only the unconsumed
tail (normally < one record) carries over. Peak extra memory is
O(largest member + carry + one emit batch), never O(whole decompressed
archive). A record that spans gzip members is reassembled via the carry,
so per-member output equals the whole-blob parse exactly (tested).
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


_EMIT_ROWS = 4096  # flush parsed records to Arrow at this granularity

_COLUMNS = [
    "path", "record_index", "warc_type", "url",
    "warc_date", "content_length", "payload",
]


def _iter_gunzip_members(data: bytes) -> Iterator[bytes]:
    """Decompressed bytes of each concatenated gzip member, one at a time
    (Common Crawl layout) — the incremental twin of joining them all. A
    truncated trailing member yields what decoded before the cut (T3)."""
    while data:
        d = zlib.decompressobj(47)  # gzip wrapper
        chunk = d.decompress(data) + d.flush()
        yield chunk
        if not d.eof:
            break  # truncated member: keep what decoded (T3)
        data = d.unused_data.lstrip(b"\x00")


def _gunzip_members(data: bytes) -> bytes:
    """Whole-stream decompression (kept for tests/oracles; the scan kernel
    uses the per-member iterator to bound memory)."""
    return b"".join(_iter_gunzip_members(data))


def _parse_some(blob: bytes, base_idx: int) -> tuple[list[tuple], int]:
    """Parse COMPLETE records from ``blob``; returns (records, resume).

    ``resume`` is the offset of the first byte that may still become part
    of a record once more data arrives (a record whose header or declared
    block is cut off, or a possibly-split ``WARC/`` marker) — the caller
    carries ``blob[resume:]`` into the next member. On the final buffer the
    carry is simply dropped, which IS the T3 truncated-tail policy."""
    out: list[tuple] = []
    pos = 0
    idx = base_idx
    n = len(blob)
    while True:
        start = blob.find(b"WARC/", pos)
        if start < 0:
            # no marker: nothing before n-4 can start one later either
            return out, max(pos, n - 4)
        head_end = blob.find(_SEP, start)
        if head_end < 0:
            return out, start  # header block not complete yet
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
            return out, start  # block not complete yet
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


def parse_warc_bytes(blob: bytes) -> list[tuple]:
    """(record_index, warc_type, url, warc_date, content_length, payload)
    per complete record; truncated tails dropped."""
    recs, _resume = _parse_some(blob, 0)
    return recs


def _walk_warc_file(path: str, blob: bytes) -> Iterator[list[tuple]]:
    """Record rows of one (possibly .gz) WARC, emitted in bounded chunks:
    per gzip member, the member's complete records; the unconsumed tail
    carries into the next member so member-split records reassemble."""
    rows: list[tuple] = []
    if path.endswith(".gz"):
        carry = b""
        idx = 0
        for member in _iter_gunzip_members(blob):
            buf = carry + member
            recs, resume = _parse_some(buf, idx)
            idx += len(recs)
            carry = buf[resume:]
            rows.extend((path, *r) for r in recs)
            if len(rows) >= _EMIT_ROWS:
                yield rows
                rows = []
        # final carry = truncated tail -> dropped (T3)
    else:
        rows = [(path, *r) for r in parse_warc_bytes(blob)]
    if rows:
        yield rows


def _split_warc_files(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for path, content in zip(pdf["path"], pdf["content"]):
            for rows in _walk_warc_file(path, bytes(content)):
                yield pd.DataFrame(rows, columns=_COLUMNS)


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
