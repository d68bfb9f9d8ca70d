"""Typed payload decode: name->schema registry over framed-log payloads.

The reference's representation lifecycle is ``Parser.parse(repr_name,
bytes)`` -> ``MessageToDict`` -> JSON rows keyed by frame, with name
aliasing (``my_parser.register("ImageJPEGTop", "Image")`` —
``06_extract_images.py:369-370``) and per-representation field redaction
(BallCandidates patches drop data/type —
``07_input_cognition_data_rust.py:132-145``). This module re-realizes that
on Spark: a registry maps representation names to field schemas, payload
bytes decode inside an Arrow-batched ``mapInPandas`` kernel, and the output
is a canonical JSON document column (sorted keys, compact separators) ready
for ``q_json_extract``-style downstream SQL.

Two wire formats:

1. The repo-defined FRAMED format (little-endian; payloads synthesized by
   :func:`encode_payload`, so engine and independent oracle decode the
   same spec):

    i32      4-byte signed int
    f64      8-byte IEEE double
    str      u16 length + utf-8 bytes
    arr_f32  u16 count + count * 4-byte IEEE float

2. PROTOBUF wire format (the public Protocol Buffers encoding — the
   reference's representations are protobuf messages decoded by name,
   ``naoth.log.Parser`` / ``07_input_cognition_data_rust.py:132-145``):
   each field = tag varint (field_number << 3 | wire_type) + value, where
   wire types are 0 = varint (int32/int64/sint32 zigzag/bool),
   1 = fixed64 (double), 5 = fixed32 (float), 2 = length-delimited
   (string/bytes/packed repeated). Unknown field numbers are SKIPPED by
   wire type (standard proto forward compatibility); proto3 last-one-wins
   for repeated scalar occurrences.

Unregistered names and malformed payloads decode to NULL (the T3
broken/unknown-data policy: carried, not crashed, filterable downstream).
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# name -> (fields, redact): fields = [(field_name, type_tag)], redact =
# field names dropped from the output dict (decoded, then removed — the
# BallCandidates patches analog)
SCHEMA_REGISTRY: dict[str, tuple[list[tuple[str, str]], frozenset[str]]] = {}
_ALIASES: dict[str, str] = {}


def register_schema(
    name: str,
    fields: list[tuple[str, str]],
    redact: tuple[str, ...] = (),
) -> None:
    SCHEMA_REGISTRY[name] = (list(fields), frozenset(redact))


def register_alias(name: str, schema_name: str) -> None:
    """Parse payloads named ``name`` with ``schema_name``'s schema
    (``Parser.register`` analog)."""
    _ALIASES[name] = schema_name


def resolve_schema(name: str):
    return SCHEMA_REGISTRY.get(_ALIASES.get(name, name))


# proto registry: name -> (fields, redact); fields = [(field_number,
# field_name, ptype)] with ptype in {int32, int64, sint32, bool, double,
# float, string, bytes, packed_float}
PROTO_REGISTRY: dict[
    str, tuple[list[tuple[int, str, str]], frozenset[str]]
] = {}


def register_proto_schema(
    name: str,
    fields: list[tuple[int, str, str]],
    redact: tuple[str, ...] = (),
) -> None:
    PROTO_REGISTRY[name] = (list(fields), frozenset(redact))


def resolve_proto_schema(name: str):
    return PROTO_REGISTRY.get(_ALIASES.get(name, name))


# default representations used by the query pack / tests
register_schema(
    "DocMeta", [("doc_id", "i32"), ("n_chars", "i32"), ("lang", "str")]
)
register_schema(
    "Scores",
    [("doc_id", "i32"), ("score", "f64"), ("weights", "arr_f32"),
     ("debug", "str")],
    redact=("debug",),
)
register_alias("ScoresTop", "Scores")
register_proto_schema(
    "PageFetch",
    [
        (1, "url", "string"),
        (2, "status", "int32"),
        (3, "dt_ms", "sint32"),
        (4, "score", "double"),
        (5, "weights", "packed_float"),
        (6, "debug", "string"),
    ],
    redact=("debug",),
)
register_alias("PageFetchTop", "PageFetch")  # 06_extract_images.py:369-370


# ---------------------------------------------------------- protobuf wire
def _uvarint_enc(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _uvarint_dec(buf: bytes, pos: int) -> tuple[int, int]:
    """Raises IndexError/ValueError on truncation (caller maps to NULL)."""
    result = 0
    shift = 0
    while True:
        if pos >= len(buf) or shift > 63:
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


_WIRE_OF = {
    "int32": 0, "int64": 0, "sint32": 0, "bool": 0,
    "double": 1, "float": 5,
    "string": 2, "bytes": 2, "packed_float": 2,
}


def encode_proto_payload(name: str, values: dict) -> bytes:
    """Serialize ``values`` per the registered proto schema; fields absent
    from ``values`` are omitted (proto optional semantics)."""
    schema = resolve_proto_schema(name)
    if schema is None:
        raise KeyError(f"no proto schema registered for {name!r}")
    out = bytearray()
    for fno, fname, ptype in schema[0]:
        if fname not in values:
            continue
        v = values[fname]
        out += _uvarint_enc((fno << 3) | _WIRE_OF[ptype])
        if ptype in ("int32", "int64"):
            out += _uvarint_enc(v & 0xFFFFFFFFFFFFFFFF)
        elif ptype == "sint32":
            out += _uvarint_enc(((v << 1) ^ (v >> 31)) & 0xFFFFFFFF)
        elif ptype == "bool":
            out += _uvarint_enc(1 if v else 0)
        elif ptype == "double":
            out += struct.pack("<d", v)
        elif ptype == "float":
            out += struct.pack("<f", v)
        elif ptype == "string":
            b = v.encode("utf-8")
            out += _uvarint_enc(len(b)) + b
        elif ptype == "bytes":
            out += _uvarint_enc(len(v)) + bytes(v)
        elif ptype == "packed_float":
            b = struct.pack(f"<{len(v)}f", *v)
            out += _uvarint_enc(len(b)) + b
    return bytes(out)


def decode_proto_dict(
    payload: bytes,
    fields: list[tuple[int, str, str]],
    redact: frozenset[str],
) -> dict | None:
    """Decode one protobuf message; None on malformed wire data (T3).
    Unknown field numbers are skipped by wire type; repeated scalar
    occurrences keep the last (proto3)."""
    by_no = {fno: (fname, ptype) for fno, fname, ptype in fields}
    out: dict = {}
    pos = 0
    n = len(payload)
    try:
        while pos < n:
            tag, pos = _uvarint_dec(payload, pos)
            fno, wt = tag >> 3, tag & 7
            if wt == 0:
                raw, pos = _uvarint_dec(payload, pos)
            elif wt == 1:
                if pos + 8 > n:
                    return None
                raw = payload[pos : pos + 8]
                pos += 8
            elif wt == 5:
                if pos + 4 > n:
                    return None
                raw = payload[pos : pos + 4]
                pos += 4
            elif wt == 2:
                ln, pos = _uvarint_dec(payload, pos)
                if pos + ln > n:
                    return None
                raw = payload[pos : pos + ln]
                pos += ln
            else:
                return None  # groups/unknown wire types unsupported
            if fno not in by_no:
                continue  # forward-compat skip
            fname, ptype = by_no[fno]
            if ptype in ("int32", "int64"):
                v = raw - (1 << 64) if raw >= 1 << 63 else raw
            elif ptype == "sint32":
                v = (raw >> 1) ^ -(raw & 1)
            elif ptype == "bool":
                v = bool(raw)
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
                v = list(struct.unpack(f"<{len(raw) // 4}f", raw))
            else:
                return None
            if fname not in redact:
                out[fname] = v
    except (ValueError, IndexError, struct.error, UnicodeDecodeError):
        return None
    return out


def encode_payload(name: str, values: dict) -> bytes:
    """Serialize ``values`` per the registered schema (synthesis/tests)."""
    schema = resolve_schema(name)
    if schema is None:
        raise KeyError(f"no schema registered for {name!r}")
    out = bytearray()
    for field, tag in schema[0]:
        v = values[field]
        if tag == "i32":
            out += struct.pack("<i", v)
        elif tag == "f64":
            out += struct.pack("<d", v)
        elif tag == "str":
            b = v.encode("utf-8")
            out += struct.pack("<H", len(b)) + b
        elif tag == "arr_f32":
            out += struct.pack("<H", len(v))
            out += struct.pack(f"<{len(v)}f", *v)
        else:
            raise ValueError(f"unknown type tag {tag!r}")
    return bytes(out)


def decode_payload_dict(
    name: str,
    payload: bytes,
    registry: dict | None = None,
    aliases: dict | None = None,
    proto_registry: dict | None = None,
) -> dict | None:
    """Decode one payload to a dict (redacted); None if unregistered.

    Names registered as proto messages decode via the protobuf wire walk;
    framed-format names via the offset walk below. ``registry``/``aliases``
    /``proto_registry`` override the module tables — the Spark kernel
    passes snapshots captured at plan-build time, because executor workers
    re-import this module and would otherwise see only the import-time
    defaults (driver-side ``register_schema`` calls would silently decode
    to NULL on workers)."""
    reg = SCHEMA_REGISTRY if registry is None else registry
    al = _ALIASES if aliases is None else aliases
    preg = PROTO_REGISTRY if proto_registry is None else proto_registry
    resolved = al.get(name, name)
    if resolved in preg:
        fields, redact = preg[resolved]
        return decode_proto_dict(payload, fields, redact)
    schema = reg.get(resolved)
    if schema is None:
        return None
    fields, redact = schema
    out = {}
    pos = 0
    for field, tag in fields:
        if tag == "i32":
            (v,) = struct.unpack_from("<i", payload, pos)
            pos += 4
        elif tag == "f64":
            (v,) = struct.unpack_from("<d", payload, pos)
            pos += 8
        elif tag == "str":
            (ln,) = struct.unpack_from("<H", payload, pos)
            v = payload[pos + 2 : pos + 2 + ln].decode("utf-8")
            pos += 2 + ln
        elif tag == "arr_f32":
            (cnt,) = struct.unpack_from("<H", payload, pos)
            v = list(struct.unpack_from(f"<{cnt}f", payload, pos + 2))
            pos += 2 + 4 * cnt
        else:
            raise ValueError(f"unknown type tag {tag!r}")
        if field not in redact:
            out[field] = v
    return out


def to_canonical_json(d: dict | None) -> str | None:
    """MessageToDict analog output: canonical JSON (sorted keys, compact)."""
    if d is None:
        return None
    return json.dumps(d, sort_keys=True, separators=(",", ":"))


def decode_payloads(
    df: DataFrame,
    name_col: str = "name",
    payload_col: str = "payload",
) -> DataFrame:
    """(frame_number, name, payload) -> (frame_number, name, repr_json).

    Arrow-batched mapInPandas; one Python call per batch. The schema lookup
    happens once per distinct name per batch; unregistered names yield NULL
    repr_json rather than failing the job (T3 policy).
    """

    # snapshot the registries at plan-build time: the closure ships the
    # driver's registrations to workers (a re-imported module would only
    # hold the defaults)
    registry = dict(SCHEMA_REGISTRY)
    aliases = dict(_ALIASES)
    proto_registry = dict(PROTO_REGISTRY)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            js = [
                to_canonical_json(
                    decode_payload_dict(
                        nm, bytes(pl), registry, aliases, proto_registry
                    )
                )
                for nm, pl in zip(pdf[name_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                {
                    "frame_number": pdf["frame_number"].astype("int32"),
                    "name": pdf[name_col],
                    "repr_json": pd.Series(js, dtype="object"),
                }
            )

    return df.select("frame_number", name_col, payload_col).mapInPandas(
        _decode, schema="frame_number int, name string, repr_json string"
    )
