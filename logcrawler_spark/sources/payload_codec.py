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

Wire format (little-endian, defined here — payloads are synthesized by
:func:`encode_payload`, so both the engine and the independent oracle
decode the same spec):

    i32      4-byte signed int
    f64      8-byte IEEE double
    str      u16 length + utf-8 bytes
    arr_f32  u16 count + count * 4-byte IEEE float

Unregistered names decode to NULL (the T3 broken/unknown-data policy:
carried, not crashed, filterable downstream).
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
) -> dict | None:
    """Decode one payload to a dict (redacted); None if unregistered.

    ``registry``/``aliases`` override the module tables — the Spark kernel
    passes snapshots captured at plan-build time, because executor workers
    re-import this module and would otherwise see only the import-time
    defaults (driver-side ``register_schema`` calls would silently decode
    to NULL on workers)."""
    reg = SCHEMA_REGISTRY if registry is None else registry
    al = _ALIASES if aliases is None else aliases
    schema = reg.get(al.get(name, name))
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

    # snapshot the registry at plan-build time: the closure ships the
    # driver's registrations to workers (a re-imported module would only
    # hold the defaults)
    registry = dict(SCHEMA_REGISTRY)
    aliases = dict(_ALIASES)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            js = [
                to_canonical_json(
                    decode_payload_dict(nm, bytes(pl), registry, aliases)
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
