"""Independent pure-Python integer PageRank — oracle twin of
``operators/graph.pagerank_int``. Dict/list arithmetic, no Spark, no
numpy; bit-identical by construction (every step is integer add/mul/
floor-div and int sums are order-free)."""

from __future__ import annotations


def pagerank_int_py(
    edges: list[tuple[int, int]],
    n_nodes: int,
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> list[int]:
    out_deg = [0] * n_nodes
    for s, _d in edges:
        out_deg[s] += 1
    base = (damping_den - damping_num) * scale // (damping_den * n_nodes)
    ranks = [scale // n_nodes] * n_nodes
    for _ in range(n_iter):
        dang = sum(r for node, r in enumerate(ranks) if out_deg[node] == 0)
        dang_share = dang // n_nodes
        contrib = [0] * n_nodes
        for s, d in edges:
            contrib[d] += ranks[s] // out_deg[s]
        ranks = [
            base + damping_num * (contrib[v] + dang_share) // damping_den
            for v in range(n_nodes)
        ]
    return ranks
