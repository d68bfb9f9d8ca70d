"""Independent robots.txt parser — oracle twin of ``functions/robots.py``.

Different implementation shape on purpose: a two-pass tokenizer (lines ->
(field, value) tuples, then an index-based group scanner) instead of the
engine's single-pass state machine, so a shared parsing bug cannot hide.
Semantics pinned to RFC 9309 identically: most-specific agent token wins,
tied groups merge, ``*`` fallback, empty patterns are no-ops, patterns
carried IN FULL (``*`` wildcards and trailing ``$`` anchors included —
the matcher resolves them), Crawl-delay in seconds -> ms.
"""

from __future__ import annotations


def _tokenize(body: str) -> list[tuple[str, str]]:
    toks = []
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        f, _, v = line.partition(":")
        toks.append((f.strip().lower(), v.strip()))
    return toks


def parse_robots_txt_py(body: str, user_agent: str = "logcrawler"):
    """-> ([(path_prefix, allow_bool)], crawl_delay_ms_or_None)."""
    toks = _tokenize(body)
    # group boundaries: a user-agent token that does NOT directly follow
    # another user-agent token starts a new group
    groups = []  # (agent_set, rule_tokens)
    i = 0
    while i < len(toks):
        if toks[i][0] != "user-agent":
            i += 1
            continue
        agents = set()
        while i < len(toks) and toks[i][0] == "user-agent":
            agents.add(toks[i][1].lower())
            i += 1
        rules = []
        while i < len(toks) and toks[i][0] != "user-agent":
            rules.append(toks[i])
            i += 1
        groups.append((agents, rules))

    ua = user_agent.lower()
    specific = [
        len(a)
        for agents, _ in groups
        for a in agents
        if a != "*" and a in ua
    ]
    best = max(specific) if specific else None

    out_rules = []
    delay = None
    for agents, rules in groups:
        if best is not None:
            applies = any(
                a != "*" and a in ua and len(a) == best for a in agents
            )
        else:
            applies = "*" in agents
        if not applies:
            continue
        g_delay = None
        for f, v in rules:
            if f in ("allow", "disallow") and v:
                out_rules.append((v, f == "allow"))
            elif f == "crawl-delay":
                try:
                    g_delay = int(float(v) * 1000)  # last in group wins
                except ValueError:
                    continue
        if g_delay is not None:
            delay = g_delay if delay is None else max(delay, g_delay)
    return out_rules, delay
