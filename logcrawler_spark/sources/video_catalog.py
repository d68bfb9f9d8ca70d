"""Video catalog ingest — the reference's ``09_input_videos.py`` re-shaped.

The reference walks ``<root>/<game_folder>/videos/*``, splits the filename
on ``_`` taking field index 7 (extension stripped) as the video type, and
upserts ``(game, relative path, type)`` rows one REST call at a time
(``09_input_videos.py:29-33``). Spark-first: one metadata-only
``binaryFile`` scan (column pruning keeps the content column unread — the
listing never pays for the video bytes), pure Column expressions for the
path/field parsing, and a single batched idempotent upsert through
``catalog.merge_into`` instead of a per-file API round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VIDEO_CATALOG_COLS = [
    "game_folder", "video_path", "video_type", "n_bytes", "modified_ts",
]


def scan_video_files(
    spark: SparkSession, root: str, glob: str = "*.mp4"
) -> DataFrame:
    """Recursive metadata-only listing of ``root`` (path, size, mtime).

    ``binaryFile`` with only path/length/modificationTime selected prunes
    the ``content`` column, so no video byte is ever read — at a real
    archive (TBs of footage) this is a listing job, not a scan job.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "length", "modificationTime")
    )


def parse_video_catalog(files: DataFrame, root: str) -> DataFrame:
    """(path, length, modificationTime) -> catalog rows.

    Semantics pinned to the reference: ``video_path`` is the path relative
    to the log root (``str(video).removeprefix(log_root_path).strip('/')``),
    ``game_folder`` the first relative segment, and ``video_type`` the
    8th ``_``-separated filename field with its extension stripped
    (``video_parsed[7]``, ``Path(...).stem``). Only files exactly at
    ``<game_folder>/videos/<file>`` (the reference globs only that folder)
    are catalog rows — a ``videos`` segment at any other depth, or a file
    outside ``root`` (rel path still absolute after the strip), is
    excluded; within the layout, a filename with too few ``_`` fields
    yields a NULL type rather than dropping the row (the reference would
    crash on IndexError instead).
    """
    # normalize: strip the scheme (file:), then the literal root prefix by
    # LENGTH (no regex — a root containing regex metacharacters must not
    # break the strip); paths outside root keep their absolute form and
    # fall out at the videos/ filter
    no_scheme = F.regexp_replace(
        F.col("path"), r"^[a-zA-Z][a-zA-Z0-9+.-]*:", ""
    )
    prefix = root.rstrip("/") + "/"
    rel = F.when(
        no_scheme.startswith(prefix),
        F.substring(no_scheme, len(prefix) + 1, 1 << 20),
    ).otherwise(no_scheme)
    fname = F.element_at(F.split(rel, "/"), -1)
    fields = F.split(fname, "_")
    vtype = F.when(
        F.size(fields) >= 8,
        F.regexp_replace(F.element_at(fields, 8), r"\.[^.]*$", ""),
    )
    # layout gate (ADVICE r03): the reference scans exactly
    # <game_folder>/videos/* — so the SECOND path segment must be
    # 'videos' (not any depth), and a rel path that is still absolute
    # (root-strip failed: file outside root) is dropped rather than
    # minting a bogus game_folder from a parent directory name
    segs = F.split(rel, "/")
    in_layout = (
        ~rel.startswith("/")
        & (F.size(segs) == 3)
        & (F.try_element_at(segs, F.lit(2)) == "videos")
    )
    return files.select(
        F.element_at(segs, 1).alias("game_folder"),
        rel.alias("video_path"),
        vtype.alias("video_type"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").cast("timestamp").alias("modified_ts"),
    ).filter(in_layout)


def ingest_video_catalog(
    spark: SparkSession,
    root: str,
    catalog,
    table: str = "videos",
    glob: str = "*.mp4",
) -> DataFrame:
    """Scan ``root`` and upsert the parsed rows into ``catalog.<table>``
    keyed by (game_folder, video_path). The merge source is the DELTA
    only — rows identical to the committed table (all columns) are
    anti-joined away first — so re-running over an unchanged archive
    writes nothing and an incremental run writes O(new files), never a
    full-listing data dir per run. Returns the committed table."""
    rows = parse_video_catalog(scan_video_files(spark, root, glob), root)
    if catalog.exists(table):
        cur = catalog.read(table)
        # null-safe equality: a NULL video_type row must match its
        # committed twin, or it would re-append on every run
        cond = None
        for c in rows.columns:
            term = rows[c].eqNullSafe(cur[c])
            cond = term if cond is None else cond & term
        delta = rows.join(cur, on=cond, how="left_anti")
        if not delta.isEmpty():
            catalog.merge_into(
                table,
                delta,
                key_cols=["game_folder", "video_path"],
                order_col="modified_ts",
            )
    else:
        catalog.overwrite(table, rows)
    return catalog.read(table)
