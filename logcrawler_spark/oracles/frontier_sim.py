"""Single-process pure-Python crawl-frontier simulator — the oracle.

Dual-implementation oracle in the reference's style: a naive, obviously-
correct re-implementation kept beside the distributed one
(``/root/reference/14_calculate_closest_frames.py:7-34`` keeps an O(n^2)
checker beside its bisect algorithm). The Spark pipeline in
``logcrawler_spark.plans.frontier`` must match this simulator's crawl
ordering, URL-seen membership set, and politeness slots EXACTLY.

No Spark imports here — plain dict/list/regex Python over pandas inputs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

PRIORITY_DECAY = 0.5
DEFAULT_DELAY_MS = 200

_SCHEME_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://")
_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_A_RE = re.compile(r'<a\s+href="([^"]*)"')


def canonicalize(url: str) -> str:
    m = _SCHEME_RE.match(url)
    scheme = m.group(1).lower() if m else "http"
    rest = _SCHEME_RE.sub("", url)
    auth = re.match(r"^([^/?#]*)", rest).group(1)
    hostport = re.sub(r"^[^@/]*@", "", auth)
    host = re.match(r"^([^:]*)", hostport).group(1).lower().rstrip(".")
    pm = re.search(r":(\d+)$", hostport)
    port = pm.group(1) if pm else ""
    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port = ""
    pqf = re.sub(r"^[^/?#]*", "", rest)
    path = re.match(r"^([^?#]*)", pqf).group(1)
    path = re.sub(r"//+", "/", path) or "/"
    qm = re.search(r"\?([^#]*)", pqf)
    q = "&".join(sorted(p for p in (qm.group(1).split("&") if qm else []) if p))
    return (
        scheme
        + "://"
        + host
        + (f":{port}" if port else "")
        + path
        + (f"?{q}" if q else "")
    )


def host_of(canonical: str) -> str:
    rest = _SCHEME_RE.sub("", canonical)
    auth = re.match(r"^([^/?#]*)", rest).group(1)
    return re.match(r"^([^:]*)", auth).group(1)


def path_of(canonical: str) -> str:
    rest = _SCHEME_RE.sub("", canonical)
    pqf = re.sub(r"^[^/?#]*", "", rest)
    return re.match(r"^([^?#]*)", pqf).group(1) or "/"


def resolve_link(base_canonical: str, href: str) -> str:
    m = _SCHEME_RE.match(base_canonical)
    scheme = m.group(1).lower() if m else "http"
    host = host_of(base_canonical)
    if _SCHEME_RE.match(href):
        return href
    if href.startswith("//"):
        return f"{scheme}:{href}"
    if href.startswith("/"):
        return f"{scheme}://{host}{href}"
    base_dir = re.sub(r"[^/]*$", "", path_of(base_canonical))
    return f"{scheme}://{host}{base_dir}{href}"


def extract_text(html: bytes) -> str:
    return " ".join(_P_RE.findall(html.decode("utf-8", "replace")))


def extract_links(html: bytes) -> list[str]:
    return _A_RE.findall(html.decode("utf-8", "replace"))


@dataclass
class SimResult:
    # ordered by the defined crawl order (round, host, -priority, canonical)
    schedule: list[tuple] = field(default_factory=list)
    url_seen: set[str] = field(default_factory=set)
    extracted: dict[str, str] = field(default_factory=dict)


def simulate_crawl(
    pages_pdf,
    seeds_pdf,
    robots_pdf,
    rounds: int = 2,
    budget: int = 8,
    ttl_rounds: int | None = None,
    windows_per_round: int = 1,
    window_ms: int = 60_000,
    priority_source: str = "inherit",
    pagerank_iters: int = 4,
) -> SimResult:
    """pages/seeds/robots as pandas DataFrames (column names per FIXTURES.md).

    ``ttl_rounds``: recrawl TTL — a URL seen at round s is schedulable
    again from round s + ttl_rounds (mirrors the engine's cuckoo-backed
    aging; None = seen forever).

    ``windows_per_round``/``window_ms``: windowed politeness — each round
    spans that many fetch windows, each admitting at most ``budget`` URLs
    per host; over-budget candidates roll to the next window (slot offset
    += the host's window stride, max(window_ms, budget*delay) so slow
    hosts never collide across window boundaries), and past the last
    window they stay unscheduled.

    ``priority_source="pagerank"``: after each round, candidate priorities
    are replaced by the exact-int64 PageRank of the candidate URL over the
    cumulative outlink graph (``oracles/graph_sim.pagerank_int_py``, same
    arithmetic as the engine's ``operators/graph.pagerank_int``; node
    space = the raw endpoint strings as emitted; rank_int used verbatim as
    the float priority — exact below 2^53). Mirrors
    ``plans/frontier.run_crawl(priority_source="pagerank")``."""
    # one page per canonical URL, keeping the max (warc_ts, url) row —
    # matches plans.frontier.dedup_pages_lww (with unique canonicals, as in
    # the generated corpus, this reduces to identity)
    page_by_canon = {}
    page_key: dict[str, tuple] = {}
    for r in pages_pdf.itertuples():
        c = canonicalize(r.url)
        key = (r.warc_ts, r.url)
        if c not in page_key or key > page_key[c]:
            page_key[c] = key
            page_by_canon[c] = bytes(r.html)

    rules = {}
    delays = {}
    for r in robots_pdf.itertuples():
        rules.setdefault(r.host, []).append((r.path_prefix, bool(r.allow)))
        delays[r.host] = max(delays.get(r.host, 0), int(r.crawl_delay_ms))

    # wildcard-aware rule matching (RFC 9309 §2.2.2, pinned identically in
    # plans/frontier.py:apply_robots): * spans any octets, a trailing $
    # anchors the end, $ elsewhere is literal; most specific match wins
    # with specificity = octet length of the full pattern, allow on ties
    pat_cache: dict[str, object] = {}

    def _pat_rx(pattern: str):
        if pattern not in pat_cache:
            anchored = pattern.endswith("$")
            core = pattern[:-1] if anchored else pattern
            if "*" not in core and not anchored:
                pat_cache[pattern] = None  # plain prefix
            else:
                pat_cache[pattern] = re.compile(
                    "^"
                    + ".*".join(re.escape(seg) for seg in core.split("*"))
                    + ("$" if anchored else "")
                )
        return pat_cache[pattern]

    def allowed(host: str, path: str) -> bool:
        best = None  # (specificity, allow)
        for pattern, allow in rules.get(host, []):
            if not isinstance(pattern, str):
                continue  # delay-only marker row (None/NaN pattern)
            rx = _pat_rx(pattern)
            hit = (
                path.startswith(pattern)
                if rx is None
                else rx.match(path) is not None
            )
            if hit:
                key = (len(pattern), allow)
                if best is None or key > best:
                    best = key
        return True if best is None else best[1]

    res = SimResult()
    seen_round: dict[str, int] = {}  # canonical -> round last scheduled
    candidates = [(r.url, float(r.priority)) for r in seeds_pdf.itertuples()]
    edges: list[tuple[str, str]] = []  # cumulative (src, dst) outlink graph

    for rnd in range(1, rounds + 1):
        # 1. canonicalize + within-batch last-writer-wins (max priority)
        best_prio: dict[str, float] = {}
        for url, prio in candidates:
            c = canonicalize(url)
            if c not in best_prio or prio > best_prio[c]:
                best_prio[c] = prio
        # 2. URL-seen anti-join (aged-out keys are schedulable again)
        unseen = {
            c: p
            for c, p in best_prio.items()
            if c not in seen_round
            or (ttl_rounds is not None and rnd - seen_round[c] >= ttl_rounds)
        }
        # 3. robots
        ok = {
            c: p for c, p in unseen.items() if allowed(host_of(c), path_of(c))
        }
        # 4. per-host politeness budget: (-priority, canonical) order
        by_host: dict[str, list[tuple[float, str]]] = {}
        for c, p in ok.items():
            by_host.setdefault(host_of(c), []).append((p, c))
        scheduled = []
        total = budget * windows_per_round
        for host, items in by_host.items():
            items.sort(key=lambda t: (-t[0], t[1]))
            delay = delays.get(host, DEFAULT_DELAY_MS)
            stride = max(window_ms, budget * delay)
            for rank, (p, c) in enumerate(items[:total], start=1):
                widx, in_w = divmod(rank - 1, budget)
                scheduled.append(
                    (rnd, host, p, c, rank, widx * stride + in_w * delay)
                )
        # defined total crawl order
        scheduled.sort(key=lambda t: (t[0], t[1], -t[2], t[3]))
        res.schedule.extend(scheduled)
        # 5. mark seen; 6. fetch + extract + expand
        candidates = []
        for rnd_, host, p, c, rank, slot in scheduled:
            res.url_seen.add(c)
            seen_round[c] = rnd_
            html = page_by_canon.get(c)
            if html is None:
                continue  # 404 analog
            res.extracted[c] = extract_text(html)
            for href in extract_links(html):
                dst = resolve_link(c, href)
                candidates.append((dst, p * PRIORITY_DECAY))
                if priority_source == "pagerank":
                    edges.append((c, dst))
        # 7. pagerank priority seeding over the cumulative graph
        if priority_source == "pagerank" and edges:
            from logcrawler_spark.oracles.graph_sim import pagerank_int_py

            nodes = sorted({u for e in edges for u in e})
            idx = {u: i for i, u in enumerate(nodes)}
            ranks = pagerank_int_py(
                [(idx[s], idx[d]) for s, d in edges],
                len(nodes),
                n_iter=pagerank_iters,
            )
            candidates = [
                (u, float(ranks[idx[u]])) for u, _p in candidates
            ]
    return res
