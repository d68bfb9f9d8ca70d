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
