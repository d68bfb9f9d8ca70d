"""Binary record-log sources vs byte-level Python oracles (incl. the
reference's truncation and last-writer-wins edge cases)."""

from __future__ import annotations

import os
import struct

from logcrawler_spark.sources.binlog import (
    frames_of,
    read_framed_log,
    read_stride_log,
    slice_payload,
)


def _framed_record(frame: int, name: str, payload: bytes) -> bytes:
    return (
        struct.pack("<i", frame)
        + name.encode()
        + b"\x00"
        + struct.pack("<i", len(payload))
        + payload
    )


def _write_framed(path: str, truncate_tail: bool = False) -> dict:
    recs = [
        (1, "FrameInfo", b"aaa"),
        (1, "Image", b"img-one"),
        (1, "Image", b"img-two"),  # duplicate name -> last wins
        (2, "FrameInfo", b"bbbb"),
        (3, "FrameInfo", b"cc"),
    ]
    blob = b"".join(_framed_record(*r) for r in recs)
    if truncate_tail:
        blob += _framed_record(4, "Broken", b"x" * 100)[:-50]  # payload cut
    with open(path, "wb") as f:
        f.write(blob)
    return {"n_complete": 4}  # (1,FrameInfo),(1,Image LWW),(2,..),(3,..)


def test_framed_log_parse_and_lww(spark, tmp_path):
    p = str(tmp_path / "game.log")
    _write_framed(p)
    rows = read_framed_log(spark, p).collect()
    by_key = {(r["frame_number"], r["name"]): r for r in rows}
    assert len(rows) == 4
    # duplicate 'Image' in frame 1 collapsed to the LAST record's extent
    img = by_key[(1, "Image")]
    assert img["size"] == len(b"img-two")


def test_framed_log_drops_truncated_tail(spark, tmp_path):
    p = str(tmp_path / "broken.log")
    _write_framed(p, truncate_tail=True)
    rows = read_framed_log(spark, p).collect()
    assert {r["frame_number"] for r in rows} == {1, 2, 3}  # frame 4 dropped


def test_payload_slicing_byte_exact(spark, tmp_path):
    p = str(tmp_path / "game.log")
    _write_framed(p)
    ext = read_framed_log(spark, p)
    sliced = slice_payload(ext, spark)
    got = {
        (r["frame_number"], r["name"]): bytes(r["payload"])
        for r in sliced.collect()
    }
    assert got[(1, "FrameInfo")] == b"aaa"
    assert got[(1, "Image")] == b"img-two"
    assert got[(2, "FrameInfo")] == b"bbbb"


def test_frames_grouping(spark, tmp_path):
    p = str(tmp_path / "game.log")
    _write_framed(p)
    frames = {r["frame_number"]: r["fields"] for r in frames_of(
        read_framed_log(spark, p)
    ).collect()}
    assert set(frames) == {1, 2, 3}
    assert set(frames[1].keys()) == {"FrameInfo", "Image"}


def test_stride_log_parity_and_truncation(spark, tmp_path):
    stride = 16
    p = str(tmp_path / "images.log")
    recs = b"".join(
        struct.pack("<I", 100 + i) + bytes([i]) * stride for i in range(5)
    )
    with open(p, "wb") as f:
        f.write(recs + b"\x01\x02\x03")  # truncated 6th record
    rows = sorted(
        read_stride_log(spark, p, stride, first_is_top=True).collect(),
        key=lambda r: r["record_index"],
    )
    assert len(rows) == 5  # tail dropped
    assert [r["frame_number"] for r in rows] == [100, 101, 102, 103, 104]
    assert [r["camera"] for r in rows] == ["Top", "Bottom"] * 2 + ["Top"]
    assert rows[2]["offset"] == 2 * (4 + stride) + 4


def test_stride_log_first_is_bottom(spark, tmp_path):
    stride = 8
    p = str(tmp_path / "images2.log")
    with open(p, "wb") as f:
        f.write(
            b"".join(struct.pack("<I", i) + b"\x00" * stride for i in range(2))
        )
    rows = sorted(
        read_stride_log(spark, p, stride, first_is_top=False).collect(),
        key=lambda r: r["record_index"],
    )
    assert [r["camera"] for r in rows] == ["Bottom", "Top"]


def test_payload_codec_roundtrip_alias_and_redaction():
    from logcrawler_spark.sources.payload_codec import (
        decode_payload_dict,
        encode_payload,
        resolve_schema,
        to_canonical_json,
    )

    vals = {
        "doc_id": -7,
        "score": 3.25,
        "weights": [0.5, 1.25, 2.0],
        "debug": "hidden",
    }
    payload = encode_payload("ScoresTop", vals)  # alias -> Scores schema
    assert resolve_schema("ScoresTop") == resolve_schema("Scores")
    got = decode_payload_dict("ScoresTop", payload)
    assert got == {"doc_id": -7, "score": 3.25, "weights": [0.5, 1.25, 2.0]}
    assert "debug" not in got  # redacted (BallCandidates patches analog)
    assert decode_payload_dict("NoSuchRepr", b"\x00") is None
    assert to_canonical_json(got) == (
        '{"doc_id":-7,"score":3.25,"weights":[0.5,1.25,2.0]}'
    )


def test_decode_payloads_spark_matches_independent_oracle(spark, tmp_path):
    from logcrawler_spark.oracles.binlog_sim import decode_framed_payloads_py
    from logcrawler_spark.sources.binlog import read_framed_log, slice_payload
    from logcrawler_spark.sources.payload_codec import (
        decode_payloads,
        encode_payload,
    )

    p = str(tmp_path / "repr.log")
    blob = b""
    for i in range(5):
        pl = encode_payload(
            "DocMeta", {"doc_id": i, "n_chars": i * 3, "lang": "en"}
        )
        blob += _framed_record(i, "DocMeta", pl)
        blob += _framed_record(i, "Mystery", b"\xff")
    with open(p, "wb") as f:
        f.write(blob)
    got = {
        (r["frame_number"], r["name"]): r["repr_json"]
        for r in decode_payloads(
            slice_payload(read_framed_log(spark, p), spark)
        ).collect()
    }
    want = {(fn, nm): js for fn, nm, js in decode_framed_payloads_py(blob)}
    assert got == want
    assert got[(2, "Mystery")] is None


def test_payload_codec_roundtrip_property():
    """Property: encode->decode is identity (minus redaction) for any
    representable value assignment."""
    from hypothesis import given, settings, strategies as st

    from logcrawler_spark.sources.payload_codec import (
        decode_payload_dict,
        encode_payload,
    )

    f32_exact = st.integers(min_value=-2**20, max_value=2**20).map(
        lambda n: n / 1024.0  # exact in float32 AND float64
    )

    @settings(max_examples=200, deadline=None)
    @given(
        doc_id=st.integers(min_value=-(2**31), max_value=2**31 - 1),
        score=st.floats(allow_nan=False, allow_infinity=False, width=64),
        weights=st.lists(f32_exact, min_size=0, max_size=20),
        debug=st.text(max_size=50),
    )
    def check(doc_id, score, weights, debug):
        vals = {
            "doc_id": doc_id, "score": score, "weights": weights,
            "debug": debug,
        }
        payload = encode_payload("Scores", vals)
        got = decode_payload_dict("Scores", payload)
        assert got == {
            "doc_id": doc_id, "score": score, "weights": weights
        }

    check()


def test_proto_wire_roundtrip_engine_vs_oracle():
    """Protobuf wire decode: engine (single-pass) vs oracle (collect-then-
    convert) must agree on negative varints, zigzag, packed floats,
    unknown-field skip, redaction, and malformed tails -> None."""
    from logcrawler_spark.oracles.binlog_sim import decode_proto_py
    from logcrawler_spark.sources.payload_codec import (
        _uvarint_enc,
        decode_proto_dict,
        encode_proto_payload,
        resolve_proto_schema,
    )

    fields, redact = resolve_proto_schema("PageFetchTop")
    vals = {
        "url": "http://h.example.com/x",
        "status": -1,          # 10-byte negative varint
        "dt_ms": -2,           # zigzag
        "score": 3.25,
        "weights": [0.25, 0.5, 7.75],
        "debug": "secret",
    }
    payload = encode_proto_payload("PageFetchTop", vals)
    # splice in an unknown field number (99, varint) mid-message
    payload = payload + _uvarint_enc((99 << 3) | 0) + _uvarint_enc(12345)
    a = decode_proto_dict(payload, fields, redact)
    b = decode_proto_py(payload, fields, redact)
    assert a == b
    assert a["status"] == -1 and a["dt_ms"] == -2
    assert a["weights"] == [0.25, 0.5, 7.75]
    assert "debug" not in a  # redacted
    # malformed: truncated mid-varint and mid-fixed64 -> None on BOTH sides
    for cut in (payload[:-1], payload[:3], b"\x21\x00"):
        assert decode_proto_dict(cut, fields, redact) is None
        assert decode_proto_py(cut, fields, redact) is None
    # bool + int64 + bytes coverage
    from logcrawler_spark.sources.payload_codec import register_proto_schema

    register_proto_schema(
        "T", [(1, "ok", "bool"), (2, "n", "int64"), (3, "raw", "bytes")]
    )
    f2, r2 = resolve_proto_schema("T")
    p2 = encode_proto_payload(
        "T", {"ok": True, "n": -(1 << 40), "raw": b"\x00\xff"}
    )
    a2, b2 = decode_proto_dict(p2, f2, r2), decode_proto_py(p2, f2, r2)
    assert a2 == b2 == {"ok": True, "n": -(1 << 40), "raw": "00ff"}
