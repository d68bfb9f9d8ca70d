"""Coverage batch 3: remaining SURVEY.md §2 operator rows.

F8 fuzzy match, C10 map ops (+ A1/U3 distinct-set), C11 explode/flatten,
C12 geometry scalars, C13 line extraction, A6/A7/A8 moments + max_by
(exact integer-cents formulation), A9 count-compare gate, S12/A3
metadata-only counts, plus the binary-source fixture queries (S2/S3 binlog,
WARC, payload decode, image stats, tree flatten).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logcrawler_spark.queries import _t, register


@register(
    "q_fuzzy_match",
    """
    SELECT doc_id FROM documents
    WHERE lower(text) LIKE '%spark%' AND lower(text) LIKE '%join%'
          AND lang <> 'und'
    """,
)
def q_fuzzy_match(spark, sf_dir):
    """F8/J8: all-keywords fuzzy predicate (scripts/sort_logs.py:163-216)."""
    kws = F.array(F.lit("spark"), F.lit("join"))
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        F.forall(kws, lambda kw: F.lower(F.col("text")).contains(kw))
        & (F.col("lang") != "und")
    ).select("doc_id")


@register(
    "q_word_freq",
    """
    SELECT word, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE word <> ''
    GROUP BY word ORDER BY n DESC, word LIMIT 20
    """,
)
def q_word_freq(spark, sf_dir):
    """C11/X6: explode-flatten (10_input_behavior_frames.py:64-93)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


@register(
    "q_geometry_bbox",
    """
    WITH a AS (SELECT event_id AS id_a, value AS x1,
                      CAST(event_id % 50 AS DOUBLE) AS y1,
                      value + 10 AS x2,
                      CAST(event_id % 50 AS DOUBLE) + 8 AS y2
               FROM events WHERE user_id < 2),
         b AS (SELECT event_id AS id_b, value AS x1,
                      CAST(event_id % 50 AS DOUBLE) AS y1,
                      value + 10 AS x2,
                      CAST(event_id % 50 AS DOUBLE) + 8 AS y2
               FROM events WHERE user_id >= 2 AND user_id < 4)
    SELECT id_a, id_b,
           greatest(least(a.x2, b.x2) - greatest(a.x1, b.x1), 0)
             * greatest(least(a.y2, b.y2) - greatest(a.y1, b.y1), 0)
             AS inter_area
    FROM a JOIN b
      ON a.x1 <= b.x2 AND b.x1 <= a.x2 AND a.y1 <= b.y2 AND b.y1 <= a.y2
    WHERE greatest(least(a.x2, b.x2) - greatest(a.x1, b.x1), 0)
            * greatest(least(a.y2, b.y2) - greatest(a.y1, b.y1), 0) >= 20
    """,
)
def q_geometry_bbox(spark, sf_dir):
    """C12/J6: bbox intersection area >= threshold
    (check_bbox_overlap_tasks.py:60-87, patch_exporter/tests.py:6-55)."""
    e = _t(spark, sf_dir, "events")

    def boxes(df, idname):
        return df.select(
            F.col("event_id").alias(idname),
            F.col("value").alias("x1"),
            (F.col("event_id") % 50).cast("double").alias("y1"),
            (F.col("value") + 10).alias("x2"),
            ((F.col("event_id") % 50).cast("double") + 8).alias("y2"),
        )

    a = boxes(e.filter(F.col("user_id") < 2), "id_a").alias("a")
    b = boxes(
        e.filter((F.col("user_id") >= 2) & (F.col("user_id") < 4)), "id_b"
    ).alias("b")
    inter = F.greatest(
        F.least(F.col("a.x2"), F.col("b.x2"))
        - F.greatest(F.col("a.x1"), F.col("b.x1")),
        F.lit(0.0),
    ) * F.greatest(
        F.least(F.col("a.y2"), F.col("b.y2"))
        - F.greatest(F.col("a.y1"), F.col("b.y1")),
        F.lit(0.0),
    )
    return (
        a.join(
            b,
            (F.col("a.x1") <= F.col("b.x2"))
            & (F.col("b.x1") <= F.col("a.x2"))
            & (F.col("a.y1") <= F.col("b.y2"))
            & (F.col("b.y1") <= F.col("a.y2")),
        )
        .withColumn("inter_area", inter)
        .filter(F.col("inter_area") >= 20)
        .select("id_a", "id_b", "inter_area")
    )


@register(
    "q_line_extract",
    """
    SELECT doc_id,
           string_split(text, ' ')[1] AS first_word,
           regexp_extract(text, 'join ([a-z]+)', 1) AS after_join
    FROM documents
    """,
)
def q_line_extract(spark, sf_dir):
    """C13: positional/line field extraction (01:106-115,
    15_add_git_hash.py:9-16)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.split(F.col("text"), " ")[0].alias("first_word"),
        F.regexp_extract(F.col("text"), "join ([a-z]+)", 1).alias("after_join"),
    )


@register(
    "q_moments_maxby",
    """
    WITH s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
             CAST(sum(CAST(round(value * 100) AS BIGINT)
                      * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS ss_c
      FROM events GROUP BY event_type)
    SELECT 'n' AS metric, event_type AS grp, CAST(n AS DOUBLE) AS val FROM s
    UNION ALL
    SELECT 'avg_value', event_type, (CAST(sum_c AS DOUBLE) / 100.0) / n
    FROM s
    UNION ALL
    SELECT 'var_value', event_type,
           (CAST(ss_c AS DOUBLE) / 10000.0) / n
             - ((CAST(sum_c AS DOUBLE) / 100.0) / n)
               * ((CAST(sum_c AS DOUBLE) / 100.0) / n)
    FROM s
    UNION ALL
    SELECT 'top_event_id', CAST(user_id AS VARCHAR), CAST(event_id AS DOUBLE)
    FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
)
def q_moments_maxby(spark, sf_dir):
    """A6/A7 + A8: mean + population variance
    (13_calculate_image_stats.py:32-35,88-96) via exact integer-cents sums
    (derived doubles bit-identical across engines — no accumulation-order
    dependence), plus max_by with deterministic composite ordering
    (PatchExecutor.py:191-209), long-format (metric, grp, val). The moment
    aggregation runs ONCE and fans into three metrics via explode; event
    ids/counts are exact in double (< 2^53)."""
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    s = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("sum_c"),
        F.sum(cents * cents).alias("ss_c"),
    )
    avg = (F.col("sum_c").cast("double") / 100.0) / F.col("n")
    var = (F.col("ss_c").cast("double") / 10000.0) / F.col("n") - avg * avg
    moments = s.select(
        F.col("event_type").alias("grp"),
        F.explode(
            F.array(
                F.struct(
                    F.lit("n").alias("metric"),
                    F.col("n").cast("double").alias("val"),
                ),
                F.struct(
                    F.lit("avg_value").alias("metric"), avg.alias("val")
                ),
                F.struct(
                    F.lit("var_value").alias("metric"), var.alias("val")
                ),
            )
        ).alias("kv"),
    ).select(F.col("kv.metric").alias("metric"), "grp", F.col("kv.val").alias("val"))
    maxby = e.groupBy("user_id").agg(
        F.max_by("event_id", F.struct("value", "event_id")).alias("top")
    ).select(
        F.lit("top_event_id").alias("metric"),
        F.col("user_id").cast("string").alias("grp"),
        F.col("top").cast("double").alias("val"),
    )
    return moments.unionByName(maxby)


@register(
    "q_count_gate",
    """
    WITH e AS (SELECT l_orderkey, count(*) AS expected_n
               FROM lineitem WHERE l_orderkey < 2000 GROUP BY l_orderkey),
         a AS (SELECT l_orderkey, count(*) AS actual_n
               FROM lineitem
               WHERE l_orderkey < 2000 AND l_shipdate < TIMESTAMP '1996-01-01'
               GROUP BY l_orderkey)
    SELECT e.l_orderkey, expected_n,
           coalesce(actual_n, 0) AS actual_n,
           CASE WHEN coalesce(actual_n, 0) = expected_n THEN 'done'
                WHEN coalesce(actual_n, 0) > expected_n THEN 'error'
                ELSE 'pending' END AS status
    FROM e LEFT JOIN a ON e.l_orderkey = a.l_orderkey
    """,
)
def q_count_gate(spark, sf_dir):
    """A9/T2: expected-vs-actual count reconciliation gate (07:29-42)."""
    from logcrawler_spark.operators.reconcile import count_gate

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    done = li.filter(F.col("l_shipdate") < "1996-01-01")
    return count_gate(li, done, "l_orderkey").select(
        "l_orderkey", "expected_n", "actual_n", "status"
    )


@register(
    "q_metadata_counts",
    """
    SELECT 'orders' AS tbl, count(*) AS n FROM orders
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'customer', count(*) FROM customer
    UNION ALL SELECT 'events', count(*) FROM events
    """,
)
def q_metadata_counts(spark, sf_dir):
    """S12/A3: metadata-only count(*) fast path — Spark answers these from
    parquet footers (the fast_ls analog, scripts/fast_ls.c:6-27)."""
    parts = []
    for tbl in ["orders", "lineitem", "customer", "events"]:
        parts.append(
            _t(spark, sf_dir, tbl)
            .groupBy()
            .agg(F.count("*").alias("n"))
            .select(F.lit(tbl).alias("tbl"), "n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


from logcrawler_spark.oracles import fixture_sql, oracle_applies


@register("q_binlog_scan", fixture_sql("q_binlog_scan"))
def q_binlog_scan(spark, sf_dir):
    """S2/S3: binary framed-log scan — a deterministic log file is
    synthesized from the documents table, parsed via binaryFile +
    mapInPandas into (frame, name, extent) rows, grouped per frame.

    Exact oracle: an independent struct.unpack-based parser
    (``oracles/binlog_sim.py``) re-reads the same file's bytes and
    materializes the expected (frame_number, n_fields) table as the
    DuckDB fixture."""
    import os
    import struct
    import tempfile

    import pandas as pd

    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.binlog_sim import frame_field_counts
    from logcrawler_spark.sources.binlog import frames_of, read_framed_log

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"binlog_q_{os.path.basename(sf_dir)}.log"
    )
    if not os.path.exists(path):
        with open(path + ".tmp", "wb") as f:
            for r in sorted(docs, key=lambda r: r["doc_id"]):
                payload = r["text"].encode()
                for name in ("Text", "Meta"):
                    body = payload if name == "Text" else payload[:16]
                    f.write(
                        struct.pack("<i", r["doc_id"])
                        + name.encode()
                        + b"\x00"
                        + struct.pack("<i", len(body))
                        + body
                    )
        os.replace(path + ".tmp", path)
    if oracle_applies(sf_dir):
        with open(path, "rb") as f:
            expected = frame_field_counts(f.read())
        write_fixture(
            "q_binlog_scan",
            sf_dir,
            pd.DataFrame(
                expected, columns=["frame_number", "n_fields"]
            ).astype({"frame_number": "int32", "n_fields": "int32"}),
        )


    frames = frames_of(read_framed_log(spark, path))
    return frames.select(
        "frame_number", F.size(F.map_keys("fields")).alias("n_fields")
    )


@register("q_tree_flatten", fixture_sql("q_tree_flatten"))
def q_tree_flatten(spark, sf_dir):
    """X6 recursive flattener: deterministic option trees (JSON) -> one row
    per option node at ANY depth, non-option subtrees pruned
    (``10_input_behavior_frames.py:64-93`` re-targeted).

    Exact oracle: the plain-recursive pure-Python walk
    (``oracles/treesim.flatten_tree_py``) over the same JSON writes the
    expected rows as the DuckDB fixture; the engine uses an iterative
    stack kernel — two traversals, one row set."""
    import json

    import pandas as pd

    from logcrawler_spark.operators.flatten import flatten_tree
    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.treesim import flatten_tree_py, make_tree

    ids = [
        r["doc_id"]
        for r in _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 80)
        .select("doc_id")
        .collect()
    ]
    trees = {i: make_tree(i) for i in sorted(ids)}

    if oracle_applies(sf_dir):
        expected = [
            row for i, t in trees.items() for row in flatten_tree_py(i, t)
        ]
        write_fixture(
            "q_tree_flatten",
            sf_dir,
            pd.DataFrame(
                expected,
                columns=["doc_id", "node_id", "parent_id", "depth", "path",
                         "state"],
            ).astype({"depth": "int32", "parent_id": "float64"}).astype(
                {"parent_id": "Int64"}
            ),
        )


    inp = spark.createDataFrame(
        [(i, json.dumps(t)) for i, t in trees.items()],
        "doc_id long, tree_json string",
    )
    return flatten_tree(inp)


@register("q_warc_scan", fixture_sql("q_warc_scan"))
def q_warc_scan(spark, sf_dir):
    """S2 in the crawl's native container: a deterministic multi-member
    ``.warc.gz`` (Common Crawl layout) synthesized from the documents
    table, scanned via binaryFile + the mapInPandas record walk into typed
    (url, type, length, payload-md5) rows.

    Exact oracle: an independent line-cursor parser + gzip-module
    decompression (``oracles/warc_sim.py``) over the same file bytes."""
    import gzip
    import hashlib
    import os
    import tempfile

    import pandas as pd

    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.warc_sim import (
        gunzip_members_py,
        parse_warc_py,
    )
    from logcrawler_spark.sources.warc import read_warc, write_warc_bytes

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"warc_q_{os.path.basename(sf_dir)}.warc.gz"
    )
    if not os.path.exists(path):
        recs = [
            {
                "warc_type": "response" if r["doc_id"] % 5 else "request",
                "url": f"http://host{r['doc_id'] % 7}.example.com/w/"
                f"{r['doc_id']}",
                "warc_date": "2024-01-01T00:00:00Z",
                "payload": (r["text"] or "").encode(),
            }
            for r in sorted(docs, key=lambda r: r["doc_id"])
        ]
        # two gzip MEMBERS concatenated — the Common Crawl per-record-gzip
        # shape the reader must transparently join
        half = len(recs) // 2
        blob = gzip.compress(write_warc_bytes(recs[:half])) + gzip.compress(
            write_warc_bytes(recs[half:])
        )
        with open(path + ".tmp", "wb") as f:
            f.write(blob)
        os.replace(path + ".tmp", path)

    if oracle_applies(sf_dir):
        with open(path, "rb") as f:
            raw = f.read()
        expected = [
            (idx, t, url, length, hashlib.md5(payload).hexdigest())
            for idx, t, url, _date, length, payload in parse_warc_py(
                gunzip_members_py(raw)
            )
        ]
        write_fixture(
            "q_warc_scan",
            sf_dir,
            pd.DataFrame(
                expected,
                columns=["record_index", "warc_type", "url",
                         "content_length", "fp"],
            ).astype({"record_index": "int64", "content_length": "int64"}),
        )

    w = read_warc(spark, path)
    return w.select(
        "record_index",
        "warc_type",
        "url",
        "content_length",
        F.md5(F.col("payload")).alias("fp"),
    )


@register("q_binlog_decode", fixture_sql("q_binlog_decode"))
def q_binlog_decode(spark, sf_dir):
    """S2->C9 lifecycle: framed-log payloads decoded into canonical-JSON
    representation documents via the name->schema registry
    (``sources/payload_codec.py`` — Parser.parse + MessageToDict analog,
    ``07_input_cognition_data_rust.py:132-145``; alias registration per
    ``06_extract_images.py:369-370``). Three payload families per frame:
    the repo-defined FRAMED format (DocMeta), a PROTOBUF message decoded
    by the public wire format (PageFetchTop alias -> PageFetch: varint,
    zigzag, fixed64, packed floats, an unknown field number that must be
    skipped, and a redacted field), and an 'Unknown' name that decodes to
    NULL (T3 policy).

    Exact oracle: an independent slice-based decoder over the raw file
    bytes (``oracles/binlog_sim.decode_framed_payloads_py`` +
    ``decode_proto_py``) writes the expected rows as the DuckDB fixture."""
    import os
    import struct
    import tempfile

    import pandas as pd

    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.binlog_sim import decode_framed_payloads_py
    from logcrawler_spark.sources.binlog import read_framed_log, slice_payload
    from logcrawler_spark.sources.payload_codec import (
        _uvarint_enc,
        decode_payloads,
        encode_payload,
        encode_proto_payload,
    )

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text", "lang")
        .collect()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"replog3_q_{os.path.basename(sf_dir)}.log"
    )
    if not os.path.exists(path):
        with open(path + ".tmp", "wb") as f:
            for r in sorted(docs, key=lambda r: r["doc_id"]):
                i = r["doc_id"]
                proto = encode_proto_payload(
                    "PageFetchTop",
                    {
                        "url": f"http://host{i % 7}.example.com/d/{i}",
                        "status": 200 if i % 9 else -1,  # negative varint
                        "dt_ms": (i % 5) - 2,  # zigzag around zero
                        "score": (i * 7 % 100) / 4.0,
                        "weights": [(i + j) % 8 / 4.0 for j in range(3)],
                        "debug": f"trace-{i}",  # redacted on decode
                    },
                    # field 99 is NOT in the schema: forward-compat skip
                ) + _uvarint_enc((99 << 3) | 0) + _uvarint_enc(7)
                recs = [
                    (
                        "DocMeta",
                        encode_payload(
                            "DocMeta",
                            {
                                "doc_id": i,
                                "n_chars": len(r["text"] or ""),
                                "lang": r["lang"] or "",
                            },
                        ),
                    ),
                    ("PageFetchTop", proto),  # alias -> PageFetch proto
                    ("Unknown", b"\x01\x02\x03"),  # unregistered -> NULL
                ]
                for name, payload in recs:
                    f.write(
                        struct.pack("<i", i)
                        + name.encode()
                        + b"\x00"
                        + struct.pack("<i", len(payload))
                        + payload
                    )
        os.replace(path + ".tmp", path)

    if oracle_applies(sf_dir):
        with open(path, "rb") as f:
            expected = decode_framed_payloads_py(f.read())
        write_fixture(
            "q_binlog_decode",
            sf_dir,
            pd.DataFrame(
                expected, columns=["frame_number", "name", "repr_json"]
            ).astype({"frame_number": "int32"}),
        )


    extents = read_framed_log(spark, path)
    payloads = slice_payload(extents, spark)
    return decode_payloads(payloads)


@register("q_image_stats", fixture_sql("q_image_stats"))
def q_image_stats(spark, sf_dir):
    """X3/X5 real-kernel pass: fixed-stride image log -> payload slices ->
    numpy YUV luma stats (brightness + variance-of-Laplacian blur), the
    reference's image-stats lifecycle (``13_calculate_image_stats.py:
    32-35,86-96``) as one Spark plan.

    Exact oracle: an independent per-pixel pure-Python walk over the same
    file bytes (``oracles/imagesim.py``) materializes the expected stats
    as the DuckDB fixture — int64 moments are exact; the two float columns
    derive from them by the same IEEE formula on both sides."""
    import os
    import struct
    import tempfile

    import pandas as pd

    from logcrawler_spark.operators.multimodal import image_stats
    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.imagesim import stride_log_stats_py
    from logcrawler_spark.sources.binlog import read_stride_log, slice_payload

    width, height = 16, 8
    stride = width * height * 2  # YUV422: 2 bytes/pixel
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
        .collect()
    )
    path = os.path.join(
        tempfile.gettempdir(), f"imglog_q_{os.path.basename(sf_dir)}.log"
    )
    if not os.path.exists(path):
        with open(path + ".tmp", "wb") as f:
            for r in sorted(docs, key=lambda r: r["doc_id"]):
                t = (r["text"] or "x").encode() or b"x"
                payload = bytes(
                    (t[i % len(t)] * 31 + i * 7 + r["doc_id"]) & 0xFF
                    for i in range(stride)
                )
                f.write(struct.pack("<I", r["doc_id"]) + payload)
        os.replace(path + ".tmp", path)

    if oracle_applies(sf_dir):
        with open(path, "rb") as f:
            expected = stride_log_stats_py(f.read(), stride, width, height)
        write_fixture(
            "q_image_stats",
            sf_dir,
            pd.DataFrame(expected).astype(
                {
                    "frame_number": "int64",
                    "width": "int32",
                    "height": "int32",
                    "n_pix": "int64",
                    "sum_y": "int64",
                    "sum_lap": "int64",
                    "sum_lap_sq": "int64",
                }
            ),
        )


    extents = read_stride_log(spark, path, stride, first_is_top=True)
    payloads = slice_payload(extents, spark)
    return image_stats(payloads, width=width, height=height)


@register(
    "q_map_ops",
    """
    WITH c AS (SELECT user_id, event_type, count(*) AS n
               FROM events GROUP BY user_id, event_type)
    SELECT user_id,
           string_agg(event_type, ',' ORDER BY event_type) AS types,
           CAST(count(*) AS BIGINT) AS n_types,
           string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                      ORDER BY event_type) AS type_counts
    FROM c GROUP BY user_id
    """,
)
def q_map_ops(spark, sf_dir):
    """C10 + A1/U3: map construction/merge (11:219-248) — counts assembled
    into a map column — plus the distinct-set aggregation (src/lib.rs:43-59);
    the set columns (sorted type list + cardinality) derive from the SAME
    map (map_keys / size), so both operator families ride one aggregation
    pass, emitted as sorted strings for cross-engine comparison."""
    e = _t(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct("event_type", "n"))
            )
        ).alias("m")
    )
    entries = F.transform(
        F.map_entries(F.col("m")),
        lambda kv: F.concat(kv["key"], F.lit(":"), kv["value"].cast("string")),
    )
    return m.select(
        "user_id",
        F.array_join(F.map_keys(F.col("m")), ",").alias("types"),
        F.size(F.col("m")).cast("long").alias("n_types"),
        F.array_join(entries, ",").alias("type_counts"),
    )


def _robots_bodies(n_hosts: int = 40) -> list[tuple[str, str]]:
    """Deterministic robots.txt corpus — every RFC 9309 feature the parser
    handles, as a pure function of the host index."""
    out = []
    for i in range(n_hosts):
        host = f"h{i:03d}.example.org"
        lines = []
        if i % 4 == 0:
            lines += ["User-agent: megabot", "Disallow: /", ""]
        if i % 9 == 0:
            # star-only host: the fallback group applies to us
            lines += ["User-agent: *", f"Disallow: /star{i % 3}", ""]
        else:
            lines += ["# generated", "User-agent: logcrawler"]
            if i % 6 == 0:
                lines += ["User-agent: friendcrawler"]
            lines += [f"Disallow: /d{i % 7}/"]
            if i % 3 == 0:
                lines += [f"Allow: /d{i % 7}/keep"]
            if i % 5 == 0:
                lines += [f"Disallow: /w{i % 4}*/x", "Disallow: /gone$"]
            if i % 2 == 0:
                lines += [f"Crawl-delay: {(i % 5) / 2}"]
            lines += ["", "User-agent: *", "Disallow: /everything"]
        out.append((host, "\n".join(lines)))
    return out


@register("q_robots_parse", fixture_sql("q_robots_parse"))
def q_robots_parse(spark, sf_dir):
    """F2 front half: raw /robots.txt bodies -> the broadcast rule table
    (RFC 9309 — group selection by most-specific agent, * fallback,
    full patterns carried verbatim incl. * wildcards and $ anchors,
    Crawl-delay). Exact oracle: an INDEPENDENT two-pass tokenizer parser
    (``oracles/robots_sim.py``) over the same bodies materializes the
    expected rows as the DuckDB fixture."""
    import pandas as pd

    from logcrawler_spark.functions.robots import robots_rules_from_bodies
    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.robots_sim import parse_robots_txt_py

    bodies = _robots_bodies()
    if oracle_applies(sf_dir):
        rows = []
        for host, body in bodies:
            rules, delay = parse_robots_txt_py(body, "logcrawler")
            for prefix, allow in rules:
                rows.append((host, prefix, allow, delay))
            if not rules and delay is not None:
                rows.append((host, None, True, delay))
        write_fixture(
            "q_robots_parse",
            sf_dir,
            pd.DataFrame(
                rows,
                columns=["host", "path_prefix", "allow", "crawl_delay_ms"],
            ).astype({"crawl_delay_ms": "Int32"}),
        )
    df = spark.createDataFrame(bodies, "host string, robots_txt string")
    return robots_rules_from_bodies(df, user_agent="logcrawler")


def _av_clips(n_clips: int = 24) -> list[tuple[int, bytes]]:
    """Deterministic WAV corpus: pure-integer sample synthesis as a
    function of clip index (no float trig — bit-identical everywhere)."""
    import numpy as np

    from logcrawler_spark.operators.av_codec import wav_encode

    out = []
    for cid in range(n_clips):
        n = 200 + 37 * cid
        ch = 1 + cid % 3
        bits = 8 if cid % 4 == 0 else 16
        idx = np.arange(n * ch, dtype=np.int64)
        if bits == 16:
            s = ((idx * (2_654_435_761 + cid) % 20011) - 10_005).astype(
                np.int16
            ).reshape(n, ch)
        else:
            s = (idx * (40_503 + cid) % 251).astype(np.uint8).reshape(n, ch)
        out.append(
            (cid, wav_encode(s, 8000 * (1 + cid % 2), bits=bits))
        )
    # structurally valid fmt but EMPTY data chunk: channels must come
    # from fmt (not from the absent frames), n_samples = 0
    out.append((98, wav_encode(np.zeros((0, 2), dtype=np.int16), 22050)))
    # one structurally broken clip: the kernel's T3 policy must emit a
    # NULL-stats row, identically in the oracle
    out.append((99, b"RIFF\x10\x00\x00\x00WAVEjunk"))
    return out


@register("q_av_decode", fixture_sql("q_av_decode"))
def q_av_decode(spark, sf_dir):
    """X-family closer (VERDICT r03 item 5): WAV/RIFF PCM decode + exact
    amplitude moments as a Spark kernel (``operators/av_codec.audio_stats``,
    Arrow-batched mapInPandas). Exact oracle: the INDEPENDENT sequential
    pure-Python parser (``oracles/av_sim.wav_decode_py``) recomputes the
    moments from the same deterministic clip bytes — engine numpy slicing
    vs oracle per-field struct reads."""
    import pandas as pd

    from logcrawler_spark.operators.av_codec import audio_stats
    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.av_sim import wav_decode_py

    clips = _av_clips()
    if oracle_applies(sf_dir):
        rows = []
        import math

        for cid, payload in clips:
            try:
                rate, n_ch, frames = wav_decode_py(payload)
            except ValueError:
                rows.append(
                    (cid, None, None, None, None, None, None, None, None)
                )
                continue
            flat = [v for fr in frames for v in fr]
            n = len(flat)
            sa = sum(flat)
            sq = sum(v * v for v in flat)
            pk = max((abs(v) for v in flat), default=0)
            rows.append(
                (
                    cid, rate, n_ch, n, sa, sq,
                    pk, sa / n if n else None,
                    # sqrt, NOT **0.5: pow is not required to be correctly
                    # rounded, sqrt is — both engines must use sqrt
                    math.sqrt(sq / n) if n else None,
                )
            )
        write_fixture(
            "q_av_decode",
            sf_dir,
            pd.DataFrame(
                rows,
                columns=[
                    "clip_id", "rate_hz", "channels", "n_samples",
                    "sum_amp", "sum_amp_sq", "peak", "mean_amp", "rms",
                ],
            ).astype(
                {
                    "rate_hz": "Int32", "channels": "Int32",
                    "n_samples": "Int64", "sum_amp": "Int64",
                    "sum_amp_sq": "Int64", "peak": "Int32",
                }
            ),
        )
    df = spark.createDataFrame(
        [(cid, bytearray(p)) for cid, p in clips],
        "clip_id long, payload binary",
    )
    return audio_stats(df)


def _av_clips_video(n_clips: int = 6):
    """Deterministic MJPEG-in-AVI corpus: per-clip frame sequences of
    smooth gradient images (quantization-friendly, any quality), built
    with the in-repo encoders only."""
    import numpy as np

    from logcrawler_spark.operators.av_codec import avi_mjpeg_encode
    from logcrawler_spark.operators.jpeg_codec import jpeg_encode

    out = []
    for cid in range(n_clips):
        n_frames = 3 + cid % 3
        w = h = 16
        frames = []
        for fi in range(n_frames):
            y, x = np.mgrid[0:h, 0:w]
            img = ((x * (3 + cid) + y * (5 + fi) + 7 * cid + 11 * fi) % 251
                   ).astype(np.uint8)
            frames.append(jpeg_encode(img, quality=85))
        out.append((cid, avi_mjpeg_encode(frames, w, h, fps=10)))
    out.append((99, b"RIFF\x08\x00\x00\x00AVI junk"))  # T3: dropped
    return out


@register("q_video_frames", fixture_sql("q_video_frames"))
def q_video_frames(spark, sf_dir):
    """X-family video content path (reference ``09_input_videos.py``'s
    ffmpeg role): MJPEG-in-AVI split + per-sampled-frame exact luma
    moments as a Spark kernel (``operators/av_codec.video_frame_stats``).
    Exact oracle: the INDEPENDENT stack-walk AVI parser
    (``oracles/av_sim.avi_frames_py``) + the INDEPENDENT per-coefficient
    JPEG oracle decoder (``oracles/jpeg_sim.jpeg_decode_py``) recompute
    every sampled frame's moments from the same deterministic clip bytes
    — two parser implementations and two JPEG decoders, nothing shared
    past the spec."""
    import pandas as pd

    from logcrawler_spark.operators.av_codec import video_frame_stats
    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.av_sim import avi_frames_py
    from logcrawler_spark.oracles.jpeg_sim import jpeg_decode_py

    every_nth = 2
    clips = _av_clips_video()
    if oracle_applies(sf_dir):
        rows = []
        for cid, payload in clips:
            try:
                frames = avi_frames_py(payload)
            except ValueError:
                continue
            for i in range(0, len(frames), every_nth):
                pixels, fw, fh, ncomp = jpeg_decode_py(frames[i])
                assert ncomp == 1  # grayscale clips
                flat = [int(v) for row in pixels for v in row]
                n = len(flat)
                s = sum(flat)
                rows.append((cid, i, fw, fh, n, s, s / n))
        write_fixture(
            "q_video_frames",
            sf_dir,
            pd.DataFrame(
                rows,
                columns=["clip_id", "frame_idx", "width", "height",
                         "n_pix", "sum_y", "brightness"],
            ).astype({"frame_idx": "int32", "width": "int32",
                      "height": "int32"}),
        )
    df = spark.createDataFrame(
        [(cid, bytearray(p)) for cid, p in clips],
        "clip_id long, payload binary",
    )
    return video_frame_stats(df, every_nth=every_nth)


@register(
    "q_decontaminate",
    """
    WITH corpus_grams AS (
      SELECT doc_id, unnest(list_distinct(grams)) AS g FROM (
        SELECT doc_id,
               [array_to_string(words[i : i + 12], ' ')
                FOR i IN range(1, greatest(len(words) - 12, 1) + 1)] AS grams
        FROM (SELECT doc_id,
                     string_split_regex(trim(text), '\\s+') AS words
              FROM documents))),
    bench_grams AS (
      SELECT DISTINCT unnest(list_distinct(grams)) AS g FROM (
        SELECT [array_to_string(words[i : i + 12], ' ')
                FOR i IN range(1, greatest(len(words) - 12, 1) + 1)] AS grams
        FROM (SELECT string_split_regex(trim(text), '\\s+') AS words
              FROM documents WHERE doc_id % 97 = 0)))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_contaminated_grams
    FROM corpus_grams JOIN bench_grams USING (g)
    GROUP BY doc_id HAVING count(*) >= 1
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (13-gram overlap vs an eval set — the
    standard pre-training leak filter). The synthetic eval set is every
    97th document, so its own rows flag themselves plus any true 13-gram
    duplicates. Broadcast benchmark grams; corpus streams map-side."""
    from logcrawler_spark.operators.dedup import decontaminate

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return (
        decontaminate(d, bench, n=13)
        .select(F.col("id").alias("doc_id"), "n_contaminated_grams")
    )


@register("q_pagerank", fixture_sql("q_pagerank"))
def q_pagerank(spark, sf_dir):
    """Iterative link-graph PageRank over a deterministic synthetic
    outlink graph (3 closed-form edges per non-dangling doc; every 11th
    doc dangles). Exact-arithmetic formulation (int64 at 1e-12
    resolution — every step integer add/mul/floor-div, order-free sums)
    so the 5-iteration distributed result matches the pure-Python oracle
    (``oracles/graph_sim.py``) BIT-EXACTLY — an iterative algorithm
    under the full rows+schema+hash gate, not a rows-only check."""
    import pandas as pd

    from logcrawler_spark.operators.graph import pagerank_int
    from logcrawler_spark.oracles import write_fixture
    from logcrawler_spark.oracles.graph_sim import pagerank_int_py

    n = 400
    n_iter = 5

    def edge_list():
        out = []
        for s in range(n):
            if s % 11 == 0:
                continue  # dangling
            for a, b in ((7, 1), (13, 5), (29, 11)):
                out.append((s, (s * a + b) % n))
        return out

    if oracle_applies(sf_dir):
        ranks = pagerank_int_py(edge_list(), n, n_iter=n_iter)
        write_fixture(
            "q_pagerank",
            sf_dir,
            pd.DataFrame(
                {
                    "node": range(n),
                    "rank_int": ranks,
                    "rank": [r / 1e12 for r in ranks],
                }
            ).astype({"node": "int64", "rank_int": "int64"}),
        )
    edges = spark.createDataFrame(edge_list(), "src long, dst long")
    return pagerank_int(edges, n, n_iter=n_iter)
