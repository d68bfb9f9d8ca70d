"""Recursive pure-Python tree oracle + deterministic tree synthesis.

The flatten oracle mirrors the reference's plain recursion
(``10_input_behavior_frames.py:64-93``) against the engine's iterative
stack kernel (``operators/flatten.py``) — two traversal strategies, one
expected row set.
"""

from __future__ import annotations

import itertools


def make_tree(doc_id: int) -> dict:
    """Deterministic option tree for a doc id: depth = doc_id % 3 + 1,
    fan-out (node_id + depth) % 3, every 4th child a non-option
    (SymbolAssignment analog, pruned by the flattener)."""
    counter = itertools.count()

    def node(depth: int, typ: str) -> dict:
        nid = doc_id * 1000 + next(counter)
        children = []
        if typ == "option" and depth < doc_id % 3 + 1:
            for c in range((nid + depth) % 3):
                child_typ = "assign" if (nid + c) % 4 == 0 else "option"
                children.append(node(depth + 1, child_typ))
        return {
            "id": nid,
            "state": nid * 7 % 5,
            "type": typ,
            "children": children,
        }

    return node(0, "option")


def flatten_tree_py(
    doc_id: int,
    node: dict,
    parent: int | None = None,
    depth: int = 0,
    path: str = "0",
) -> list[tuple]:
    """(doc_id, node_id, parent_id, depth, path, state) rows, recursive."""
    if node["type"] != "option":
        return []
    rows = [(doc_id, node["id"], parent, depth, path, node["state"])]
    for ci, child in enumerate(node["children"]):
        rows.extend(
            flatten_tree_py(
                doc_id, child, node["id"], depth + 1, f"{path}.{ci}"
            )
        )
    return rows
