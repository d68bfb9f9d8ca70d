"""Independent framed-log parser — the byte-level oracle for S2 scans.

Re-implements the record walk of ``sources.binlog._parse_framed`` with
struct.unpack instead of int.from_bytes and an explicit regular-expression-
free state machine, so format misunderstandings (header width, NUL scan,
truncation policy, last-writer-wins) surface as fixture mismatches.
Reference format: ``/root/reference/src/reader.rs:17-56``.
"""

from __future__ import annotations

import struct


def parse_framed_bytes(blob: bytes) -> list[tuple[int, str, int, int]]:
    """(frame_number, name, payload_offset, size) records; truncated tail
    dropped; duplicate (frame, name) keeps the last occurrence."""
    records: dict[tuple[int, str], tuple[int, str, int, int]] = {}
    n = len(blob)
    pos = 0
    while True:
        if pos + 4 > n:
            break
        (frame_number,) = struct.unpack_from("<i", blob, pos)
        end = blob.find(b"\x00", pos + 4)
        if end == -1 or end + 5 > n:
            break
        name = blob[pos + 4 : end].decode("utf-8", "replace")
        (size,) = struct.unpack_from("<i", blob, end + 1)
        payload_off = end + 5
        if size < 0 or payload_off + size > n:
            break
        records[(frame_number, name)] = (frame_number, name, payload_off, size)
        pos = payload_off + size
    return list(records.values())


def frame_field_counts(blob: bytes) -> list[tuple[int, int]]:
    """(frame_number, n_fields) per frame, sorted by frame_number."""
    counts: dict[int, int] = {}
    for frame_number, _name, _off, _size in parse_framed_bytes(blob):
        counts[frame_number] = counts.get(frame_number, 0) + 1
    return sorted(counts.items())


def decode_framed_payloads_py(blob: bytes) -> list[tuple[int, str, str | None]]:
    """Independent payload decoder: (frame_number, name, canonical_json).

    Walks records via :func:`parse_framed_bytes`, then decodes each payload
    with explicit byte slicing + int.from_bytes — independent of the
    struct.unpack_from offset walk in ``sources.payload_codec``. Shares only
    the registry (what to decode) and the canonical JSON formatting."""
    import struct

    from logcrawler_spark.sources.payload_codec import (
        resolve_schema,
        to_canonical_json,
    )

    out = []
    for frame_number, name, off, size in parse_framed_bytes(blob):
        payload = blob[off : off + size]
        schema = resolve_schema(name)
        if schema is None:
            out.append((frame_number, name, None))
            continue
        fields, redact = schema
        pos = 0
        d = {}
        for field, tag in fields:
            if tag == "i32":
                v = int.from_bytes(
                    payload[pos : pos + 4], "little", signed=True
                )
                pos += 4
            elif tag == "f64":
                (v,) = struct.unpack("<d", payload[pos : pos + 8])
                pos += 8
            elif tag == "str":
                ln = int.from_bytes(payload[pos : pos + 2], "little")
                v = payload[pos + 2 : pos + 2 + ln].decode("utf-8")
                pos += 2 + ln
            elif tag == "arr_f32":
                cnt = int.from_bytes(payload[pos : pos + 2], "little")
                v = [
                    struct.unpack(
                        "<f", payload[pos + 2 + 4 * i : pos + 6 + 4 * i]
                    )[0]
                    for i in range(cnt)
                ]
                pos += 2 + 4 * cnt
            else:
                raise ValueError(tag)
            if field not in redact:
                d[field] = v
        out.append((frame_number, name, to_canonical_json(d)))
    return out
