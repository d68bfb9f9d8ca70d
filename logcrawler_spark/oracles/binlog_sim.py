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


def _proto_varint_py(payload: bytes, pos: int) -> tuple[int, int]:
    """Byte-at-a-time varint (int.from_bytes style) — independent of the
    engine's shift-accumulator loop."""
    parts = []
    while True:
        if pos >= len(payload) or len(parts) >= 10:
            raise ValueError("truncated varint")
        b = payload[pos]
        pos += 1
        parts.append(b & 0x7F)
        if not b & 0x80:
            break
    val = 0
    for p in reversed(parts):
        val = (val << 7) | p
    return val, pos


def decode_proto_py(payload: bytes, fields, redact) -> dict | None:
    """Independent protobuf wire decoder: collects (field_number,
    wire_type, raw) triples first, then converts — vs the engine's
    single-pass convert-as-you-go walk. Same public wire spec."""
    import struct

    triples = []
    pos = 0
    n = len(payload)
    try:
        while pos < n:
            tag, pos = _proto_varint_py(payload, pos)
            fno, wt = tag >> 3, tag & 7
            if wt == 0:
                raw, pos = _proto_varint_py(payload, pos)
            elif wt in (1, 5):
                width = 8 if wt == 1 else 4
                if pos + width > n:
                    return None
                raw = payload[pos : pos + width]
                pos += width
            elif wt == 2:
                ln, pos = _proto_varint_py(payload, pos)
                if pos + ln > n:
                    return None
                raw = payload[pos : pos + ln]
                pos += ln
            else:
                return None
            triples.append((fno, wt, raw))
    except ValueError:
        return None
    by_no = {fno: (fname, ptype) for fno, fname, ptype in fields}
    out: dict = {}
    try:
        for fno, _wt, raw in triples:
            if fno not in by_no:
                continue
            fname, ptype = by_no[fno]
            if ptype in ("int32", "int64"):
                v = raw if raw < 1 << 63 else raw - (1 << 64)
            elif ptype == "sint32":
                v = (raw // 2) if raw % 2 == 0 else -((raw + 1) // 2)
            elif ptype == "bool":
                v = raw != 0
            elif ptype == "double":
                (v,) = struct.unpack("<d", raw)
            elif ptype == "float":
                (v,) = struct.unpack("<f", raw)
            elif ptype == "string":
                v = raw.decode("utf-8")
            elif ptype == "bytes":
                v = raw.hex()
            elif ptype == "packed_float":
                if len(raw) % 4:
                    return None
                v = [
                    struct.unpack("<f", raw[4 * i : 4 * i + 4])[0]
                    for i in range(len(raw) // 4)
                ]
            else:
                return None
            if fname not in redact:
                out[fname] = v
    except (struct.error, UnicodeDecodeError):
        return None
    return out


def decode_framed_payloads_py(blob: bytes) -> list[tuple[int, str, str | None]]:
    """Independent payload decoder: (frame_number, name, canonical_json).

    Walks records via :func:`parse_framed_bytes`, then decodes each payload
    with explicit byte slicing + int.from_bytes — independent of the
    struct.unpack_from offset walk in ``sources.payload_codec``. Proto-
    registered names decode via :func:`decode_proto_py` (collect-then-
    convert, vs the engine's single pass). Shares only the registry (what
    to decode) and the canonical JSON formatting."""
    import struct

    from logcrawler_spark.sources.payload_codec import (
        resolve_proto_schema,
        resolve_schema,
        to_canonical_json,
    )

    out = []
    for frame_number, name, off, size in parse_framed_bytes(blob):
        payload = blob[off : off + size]
        proto = resolve_proto_schema(name)
        if proto is not None:
            d = decode_proto_py(payload, proto[0], proto[1])
            out.append((frame_number, name, to_canonical_json(d)))
            continue
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
