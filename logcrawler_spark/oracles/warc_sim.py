"""Independent WARC parser — line-cursor state machine (no separator
find()), plus gzip-module multi-member decompression (vs the engine's
zlib.decompressobj loop). Dual implementation of ``sources.warc``.
"""

from __future__ import annotations

import gzip
import io


def gunzip_members_py(data: bytes) -> bytes:
    """gzip.GzipFile natively reads concatenated members."""
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
        try:
            return f.read()
        except EOFError:  # truncated trailing member
            return b""


def parse_warc_py(blob: bytes) -> list[tuple]:
    """(record_index, warc_type, url, warc_date, content_length, payload)
    — truncated tails dropped, malformed headers skipped."""
    out: list[tuple] = []
    i = 0
    idx = 0
    n = len(blob)

    def read_line(j: int) -> tuple[bytes | None, int]:
        e = blob.find(b"\r\n", j)
        if e < 0:
            return None, n
        return blob[j:e], e + 2

    while i < n:
        if not blob.startswith(b"WARC/", i):
            i += 1
            continue
        _version, j = read_line(i)
        headers: dict[str, str] = {}
        complete = False
        while j < n:
            line, j = read_line(j)
            if line is None:
                break
            if line == b"":
                complete = True
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        if not complete:
            break
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            i = j
            continue
        if j + length > n:
            break
        out.append(
            (
                idx,
                headers.get("warc-type", ""),
                headers.get("warc-target-uri", ""),
                headers.get("warc-date", ""),
                length,
                blob[j : j + length],
            )
        )
        idx += 1
        i = j + length
    return out
