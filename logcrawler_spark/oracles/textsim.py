"""Pure-Python SimHash oracle (no numpy — independent of the Spark kernel).

Dual implementation of ``operators.dedup.simhash64`` + the 16-bit banded
candidate join in ``simhash_dup_pairs``: per-bit integer vote loops here vs
the vectorized bit-matrix kernel there. Any divergence (hash width,
endianness, gram window, band slicing, threshold) fails the fixture oracle.
"""

from __future__ import annotations

import hashlib


def py_simhash(text: str | None, n: int = 3) -> int | None:
    """64-bit SimHash as signed int64 (matches the kernel's output type)."""
    if text is None:
        return None
    words = text.split()
    grams = {
        " ".join(words[j : j + n]) for j in range(max(len(words) - n + 1, 1))
    }
    votes = [0] * 64
    for g in grams:
        h = int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    fp = 0
    for b in range(64):
        if votes[b] > 0:
            fp |= 1 << b
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def simhash_pairs(
    docs: list[tuple[int, str | None]],
    max_hamming: int = 8,
    n: int = 3,
) -> list[tuple[int, int, int]]:
    """(id_a, id_b, hamming) pairs for ids sharing >=1 of the four 16-bit
    simhash bands, with hamming <= max_hamming; id_a < id_b; sorted."""
    fps = {}
    for doc_id, text in docs:
        fp = py_simhash(text, n)
        if fp is not None:
            fps[doc_id] = fp & ((1 << 64) - 1)  # unsigned view for bit ops
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, ufp in fps.items():
        for b in range(4):
            buckets.setdefault((b, (ufp >> (16 * b)) & 0xFFFF), []).append(
                doc_id
            )
    seen: set[tuple[int, int]] = set()
    out: list[tuple[int, int, int]] = []
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pair = (ids[i], ids[j])
                if pair in seen:
                    continue
                seen.add(pair)
                ham = bin(fps[pair[0]] ^ fps[pair[1]]).count("1")
                if ham <= max_hamming:
                    out.append((pair[0], pair[1], ham))
    out.sort()
    return out
