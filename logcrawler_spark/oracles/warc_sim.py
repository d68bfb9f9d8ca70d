"""Independent WARC parser — line-cursor state machine (no separator
find()), plus gzip-module multi-member decompression (vs the engine's
zlib.decompressobj loop). Dual implementation of ``sources.warc``.
"""

from __future__ import annotations

import gzip
import io


def gunzip_members_py(data: bytes) -> bytes:
    """gzip.GzipFile natively reads concatenated members.

    Truncation policy must mirror the engine's ``_gunzip_members`` (T3:
    keep everything decoded BEFORE the truncated trailing member, drop
    only the tail) — so reads accumulate byte-by-byte and an EOFError
    returns the bytes decoded so far, not b"" (ADVICE r02). Byte-at-a-time
    because ``GzipFile.read(n)`` DISCARDS bytes already decoded inside a
    call that hits the truncated EOF; fine at fixture scale."""
    out = bytearray()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as f:
        try:
            while True:
                chunk = f.read(1)
                if not chunk:
                    break
                out += chunk
        except EOFError:  # truncated trailing member: keep what decoded
            pass
    return bytes(out)


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
