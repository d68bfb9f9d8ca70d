"""Video catalog ingest (reference 09_input_videos.py semantics):
metadata-only listing, filename-field parsing, idempotent upsert."""

from __future__ import annotations

import os

from logcrawler_spark.catalog import Catalog
from logcrawler_spark.sources.video_catalog import (
    ingest_video_catalog,
    parse_video_catalog,
    scan_video_files,
)


def _mk_tree(root):
    files = {
        "2024-04-22_RC24/videos/"
        "2024-04-22_10-30-00_BU_vs_X_half1_cam0_GoPro.mp4": b"v" * 64,
        "2024-04-22_RC24/videos/"
        "2024-04-22_12-00-00_BU_vs_Y_half2_cam1_top.mp4": b"vv" * 64,
        # non-conforming name (too few '_' fields) -> NULL type, row kept
        "2024-04-23_T1/videos/short_name.mp4": b"x" * 10,
        # outside a videos/ folder -> excluded entirely
        "2024-04-23_T1/logs/not_a_video_but_8_fields_a_b_c.mp4": b"n",
    }
    for rel, content in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(content)
    return files


def test_parse_matches_reference_field_semantics(spark, tmp_path):
    root = str(tmp_path / "logroot")
    _mk_tree(root)
    rows = {
        r["video_path"]: r
        for r in parse_video_catalog(
            scan_video_files(spark, root), root
        ).collect()
    }
    assert len(rows) == 3  # the logs/ file is excluded
    r1 = rows[
        "2024-04-22_RC24/videos/"
        "2024-04-22_10-30-00_BU_vs_X_half1_cam0_GoPro.mp4"
    ]
    # reference: video_parsed[7] with extension stripped -> 8th field
    assert r1["video_type"] == "GoPro"
    assert r1["game_folder"] == "2024-04-22_RC24"
    assert r1["n_bytes"] == 64
    r2 = rows[
        "2024-04-22_RC24/videos/"
        "2024-04-22_12-00-00_BU_vs_Y_half2_cam1_top.mp4"
    ]
    assert r2["video_type"] == "top"
    assert rows["2024-04-23_T1/videos/short_name.mp4"]["video_type"] is None


def test_ingest_is_idempotent_and_incremental(spark, tmp_path):
    root = str(tmp_path / "logroot")
    _mk_tree(root)
    cat = Catalog(spark, str(tmp_path / "cat"))
    first = ingest_video_catalog(spark, root, cat).collect()
    assert len(first) == 3
    # re-ingest unchanged -> same rows (upsert by key, no duplicates)
    again = ingest_video_catalog(spark, root, cat).collect()
    assert sorted(r["video_path"] for r in again) == sorted(
        r["video_path"] for r in first
    )
    # new footage lands -> one new row, old rows untouched
    extra = os.path.join(
        root, "2024-04-23_T1/videos/a_b_c_d_e_f_g_new.mp4"
    )
    with open(extra, "wb") as f:
        f.write(b"z" * 5)
    third = ingest_video_catalog(spark, root, cat).collect()
    assert len(third) == 4
    by_path = {r["video_path"]: r for r in third}
    assert by_path["2024-04-23_T1/videos/a_b_c_d_e_f_g_new.mp4"][
        "video_type"
    ] == "new"


def test_layout_gate_second_segment_and_root(spark, tmp_path):
    """ADVICE r03: only <game_folder>/videos/<file> rows qualify — a
    'videos' segment at any other depth is excluded, as is a file whose
    path never had the scan root as a prefix (bogus game_folder)."""
    import pandas as pd
    from pyspark.sql import functions as F

    root = str(tmp_path / "logs")
    _mk_tree(root)
    extra = {
        # deeper nesting: videos not at segment 2
        "2024-04-22_RC24/extra/videos/a_b_c_d_e_f_g_zzdeep.mp4": b"d",
        # videos as the FIRST segment (no game folder)
        "videos/a_b_c_d_e_f_g_zztop.mp4": b"t",
        # file directly under videos/<dir>/: 4 segments
        "2024-04-22_RC24/videos/sub/a_b_c_d_e_f_g_zzsub.mp4": b"s",
    }
    for rel, content in extra.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(content)
    rows = parse_video_catalog(scan_video_files(spark, root), root).collect()
    paths = {r["video_path"] for r in rows}
    assert not any(
        "zzdeep" in p or "zztop" in p or "zzsub" in p for p in paths
    )
    assert len(paths) == 3  # the three conforming originals

    # out-of-root absolute path with a /videos/ segment: bogus game_folder
    out = spark.createDataFrame(
        pd.DataFrame(
            {
                "path": [f"file:/elsewhere/gameX/videos/a_b_c_d_e_f_g_h.mp4"],
                "length": [1],
                "modificationTime": [pd.Timestamp("2024-01-01").to_pydatetime()],
            }
        )
    )
    assert parse_video_catalog(out, root).count() == 0
