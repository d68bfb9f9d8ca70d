"""spark-submit packaging: the built zip must mirror the source tree.

ADVICE r01: a stale committed artifact silently shipped outdated executor
code. dist/ is no longer versioned; this gate asserts the builder script
packages exactly the current package sources.
"""

from __future__ import annotations

import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_build_zip_matches_source_tree(tmp_path):
    env = dict(os.environ)
    subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "build_zip.sh")],
        check=True,
        cwd=REPO,
        env=env,
        capture_output=True,
    )
    zpath = os.path.join(REPO, "dist", "logcrawler_spark.zip")
    with zipfile.ZipFile(zpath) as z:
        packaged = set(z.namelist())
        # byte-identical contents, not just the same file list
        contents = {n: z.read(n) for n in packaged}

    on_disk = set()
    for root, _dirs, files in os.walk(os.path.join(REPO, "logcrawler_spark")):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                on_disk.add(os.path.relpath(p, REPO))

    assert packaged == on_disk
    for name in packaged:
        with open(os.path.join(REPO, name), "rb") as f:
            assert f.read() == contents[name], name


def test_implementation_map_query_names_are_registered():
    """IMPLEMENTATION_MAP.md is the auditor-facing coverage document: every
    q_* token it cites must be a registered query, so the map can never
    again cite queries that were consolidated away (VERDICT r04: 11 stale
    names survived the r2 pack consolidation)."""
    import re

    from logcrawler_spark.queries import QUERIES

    with open(os.path.join(REPO, "IMPLEMENTATION_MAP.md")) as f:
        cited = set(re.findall(r"\bq_[a-z0-9_]+\b", f.read()))
    unknown = sorted(cited - set(QUERIES))
    assert not unknown, f"IMPLEMENTATION_MAP.md cites unregistered: {unknown}"
