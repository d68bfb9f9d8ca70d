"""Recursive tree flattener (X6): nested JSON documents -> rows at any
depth.

Reference analog: the sparse-option behavior tree walked by
``parse_sparse_option`` (``10_input_behavior_frames.py:64-93``) — each
Option node emits a row (frame, option id, active state) and recursion
descends only into Option-typed children, skipping SymbolAssignment nodes.
Here the tree is a generic JSON document::

    {"id": long, "state": long, "type": "option"|..., "children": [...]}

and the flattener is an Arrow-batched ``mapInPandas`` kernel (the UDTF
shape): one Python call per batch, an explicit work-stack per document (no
Python recursion limit), rows emitted with (parent_id, depth, path) lineage
so any-depth trees land in one relational table. Emission and descent both
require ``type == "option"`` — other node types are pruned subtree-and-all,
matching the reference's type filter.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FLAT_SCHEMA = (
    "doc_id long, node_id long, parent_id long, depth int, path string, "
    "state long"
)


def _flatten_one(doc_id: int, tree: dict) -> list[tuple]:
    rows: list[tuple] = []
    stack: list[tuple] = [(tree, None, 0, "0")]
    while stack:
        node, parent, depth, path = stack.pop()
        if node.get("type") != "option":
            continue
        rows.append(
            (doc_id, node["id"], parent, depth, path, node["state"])
        )
        for ci, child in enumerate(node.get("children") or []):
            stack.append((child, node["id"], depth + 1, f"{path}.{ci}"))
    return rows


def flatten_tree(
    df: DataFrame, id_col: str = "doc_id", json_col: str = "tree_json"
) -> DataFrame:
    """(id, tree_json) -> one row per option node at any depth."""

    def _flat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import sys

        # the traversal is stack-based, but json.loads recurses per nesting
        # level — lift the parser's limit so deep documents decode
        sys.setrecursionlimit(max(sys.getrecursionlimit(), 20_000))
        for pdf in batches:
            rows: list[tuple] = []
            for doc_id, js in zip(pdf[id_col], pdf[json_col]):
                if js is None:
                    continue
                rows.extend(_flatten_one(int(doc_id), json.loads(js)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "node_id", "parent_id", "depth", "path",
                    "state",
                ],
            )

    return df.select(id_col, json_col).mapInPandas(_flat, schema=FLAT_SCHEMA)
