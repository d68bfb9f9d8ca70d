"""WARC source vs the independent line-cursor oracle: plain + multi-member
gzip, truncation policy, byte-exact payloads."""

from __future__ import annotations

import gzip

from logcrawler_spark.oracles.warc_sim import gunzip_members_py, parse_warc_py
from logcrawler_spark.sources.warc import (
    _gunzip_members,
    parse_warc_bytes,
    read_warc,
    write_warc_bytes,
)


def _recs(n=5):
    return [
        {
            "warc_type": "response",
            "url": f"http://h{i}.example.com/p{i}",
            "warc_date": "2024-01-01T00:00:00Z",
            "payload": (f"body-{i} " * (i + 1)).encode(),
        }
        for i in range(n)
    ]


def test_parser_matches_independent_oracle():
    blob = write_warc_bytes(_recs(8))
    assert parse_warc_bytes(blob) == parse_warc_py(blob)


def test_truncated_tail_dropped_both_sides():
    blob = write_warc_bytes(_recs(4))
    cut = blob[: len(blob) - 30]  # cut into the last record's payload
    got = parse_warc_bytes(cut)
    want = parse_warc_py(cut)
    assert got == want
    assert len(got) == 3


def test_payload_with_embedded_separator_survives():
    recs = _recs(2)
    recs[0]["payload"] = b"a\r\n\r\nWARC/1.0\r\nfake\r\n\r\nb"
    blob = write_warc_bytes(recs)
    got = parse_warc_bytes(blob)
    assert got == parse_warc_py(blob)
    assert len(got) == 2
    assert got[0][5] == recs[0]["payload"]


def test_multi_member_gzip_decompression_matches():
    recs = _recs(6)
    blob = gzip.compress(write_warc_bytes(recs[:3])) + gzip.compress(
        write_warc_bytes(recs[3:])
    )
    a = _gunzip_members(blob)
    b = gunzip_members_py(blob)
    assert a == b
    assert len(parse_warc_bytes(a)) == 6


def test_read_warc_spark_plain_and_gz(spark, tmp_path):
    recs = _recs(5)
    plain = tmp_path / "a.warc"
    plain.write_bytes(write_warc_bytes(recs))
    gz = tmp_path / "b.warc.gz"
    gz.write_bytes(
        gzip.compress(write_warc_bytes(recs[:2]))
        + gzip.compress(write_warc_bytes(recs[2:]))
    )
    for p in (str(plain), str(gz)):
        rows = sorted(
            read_warc(spark, p).collect(), key=lambda r: r["record_index"]
        )
        assert [r["url"] for r in rows] == [r["url"] for r in recs]
        assert [bytes(r["payload"]) for r in rows] == [
            r["payload"] for r in recs
        ]


def test_crawl_from_warc_ingest_matches_direct_pages(spark, tmp_path):
    """End-to-end: pages round-tripped through a multi-member .warc.gz must
    drive run_crawl to EXACTLY the schedule the direct pages table yields."""
    from pyspark.sql import functions as F

    from logcrawler_spark.plans.frontier import run_crawl
    from logcrawler_spark.sources.pages import (
        generate_pages,
        generate_robots_rules,
        generate_seeds,
    )
    from logcrawler_spark.sources.warc import pages_from_warc

    pages = generate_pages(spark, "/root/testdata/sf0.001", 50)
    seeds = generate_seeds(spark, "/root/testdata/sf0.001", 50)
    robots = generate_robots_rules(spark, n_hosts=50)

    rows = pages.select("url", "warc_ts", "html").collect()
    recs = [
        {
            "warc_type": "response",
            "url": r["url"],
            "warc_date": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
            "payload": bytes(r["html"]),
        }
        for r in rows
    ]
    half = len(recs) // 2
    p = tmp_path / "corpus.warc.gz"
    p.write_bytes(
        gzip.compress(write_warc_bytes(recs[:half]))
        + gzip.compress(write_warc_bytes(recs[half:]))
    )
    ingested = pages_from_warc(spark, str(p))
    # byte-identical html after the round trip
    direct = {r["url"]: bytes(r["html"]) for r in rows}
    back = {r["url"]: bytes(r["html"]) for r in ingested.collect()}
    assert back == direct

    def key(st):
        return sorted(
            (r["round"], r["canonical_url"], r["host_rank"], r["slot_ms"])
            for r in st.schedule.collect()
        )

    a = run_crawl(spark, ingested, seeds, robots, rounds=2, budget=5)
    b = run_crawl(spark, pages, seeds, robots, rounds=2, budget=5)
    assert key(a) == key(b)


def test_streaming_warc_ingest_equals_batch(spark, tmp_path):
    """Archives dropped into a dir stream out micro-batch by micro-batch
    and accumulate to EXACTLY the batch scan's rows (T5 continuous-ingest
    twin, exactly-once per archive via the file-source checkpoint)."""
    from logcrawler_spark.sources.warc import read_warc, stream_warc

    src = tmp_path / "drop"
    src.mkdir()
    recs = _recs(6)
    (src / "a.warc").write_bytes(write_warc_bytes(recs[:3]))
    (src / "b.warc.gz").write_bytes(gzip.compress(write_warc_bytes(recs[3:])))

    q = (
        stream_warc(spark, str(src))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("warc_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["path"].rsplit("/", 1)[-1], r["record_index"], r["url"],
         bytes(r["payload"]))
        for r in spark.sql("SELECT * FROM warc_stream").collect()
    )
    want = sorted(
        (r["path"].rsplit("/", 1)[-1], r["record_index"], r["url"],
         bytes(r["payload"]))
        for r in read_warc(spark, str(src) + "/*.warc*").collect()
    )
    assert got == want and len(got) == 6


def test_record_split_across_members_reassembles():
    """The per-member incremental walk must equal the whole-blob parse even
    when a record's bytes are split across two gzip members (the carry
    path), byte-identically."""
    from logcrawler_spark.sources.warc import _walk_warc_file

    blob = write_warc_bytes(_recs(7))
    # cut INSIDE record 3's payload so the record spans both members
    k = len(write_warc_bytes(_recs(7)[:3])) + 25
    raw = gzip.compress(blob[:k]) + gzip.compress(blob[k:])
    rows = [r for chunk in _walk_warc_file("x.warc.gz", raw) for r in chunk]
    want = [("x.warc.gz", *t) for t in parse_warc_bytes(_gunzip_members(raw))]
    assert rows == want
    assert len(rows) == 7


def test_truncated_gz_member_engine_matches_oracle():
    """T3 on a truncated trailing gzip member: BOTH sides keep everything
    decoded before the cut (the oracle used to return b'' — ADVICE r02),
    and the incremental walk agrees with the whole-blob path."""
    from logcrawler_spark.sources.warc import _walk_warc_file

    blob6 = _recs(6)
    raw = gzip.compress(write_warc_bytes(blob6[:4])) + gzip.compress(
        write_warc_bytes(blob6[4:])
    )
    cut = raw[:-20]  # truncate inside the trailing member
    a = _gunzip_members(cut)
    b = gunzip_members_py(cut)
    assert a == b
    assert len(parse_warc_bytes(a)) >= 4  # first member fully preserved
    rows = [r for chunk in _walk_warc_file("x.warc.gz", cut) for r in chunk]
    want = [("x.warc.gz", *t) for t in parse_warc_py(a)]
    assert rows == want
