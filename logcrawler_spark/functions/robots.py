"""robots.txt parsing (RFC 9309) -> the engine's broadcast rule table.

The crawl consumes robots as a TABLE (host, path_prefix, allow,
crawl_delay_ms) broadcast per host (``plans/frontier.py:apply_robots``).
This module closes the loop from raw fetched ``/robots.txt`` bodies to
that table, per the PUBLIC spec (RFC 9309):

- groups = runs of ``User-agent:`` lines followed by rules; a group
  applies to us if one of its agent tokens is the most specific match
  for our product token (longest case-insensitive token that is a
  substring of ours), with ``*`` as the fallback group (RFC 9309 §2.2.1);
  ALL groups tied at the most-specific agent merge (ibid.).
- rules: ``Allow`` / ``Disallow`` with a path pattern; empty-pattern
  rules are no-ops (§2.2.2). ``Crawl-delay`` is honored as the common
  extension (seconds -> ms, max over merged groups).
- patterns are carried IN FULL (RFC 9309 §2.2.2, r4 — the r3 engine
  reduced them to their literal prefix): ``*`` matches any character
  sequence including empty, a trailing ``$`` anchors the end of the
  path, and a ``$`` anywhere else is a literal octet (the convention of
  the public reference implementations). The broadcast matcher
  (``plans/frontier.py:apply_robots``) evaluates plain prefixes with
  ``startswith`` (the overwhelmingly common case — zero regex cost) and
  wildcard patterns with a regex precompiled once per RULE, never per
  candidate row. Rule precedence: most specific match wins, specificity
  = octet length of the full pattern as written (``*``/``$`` count),
  allow wins ties — pinned identically in the pure-Python simulator
  (``oracles/frontier_sim.py``) and the independent parser oracle
  (``oracles/robots_sim.py``).

The parser is pure Python per file inside ``mapInPandas`` — robots
bodies are tiny and per-host (the SMALL broadcast side at any scale), so
a vectorized formulation would buy nothing; the output table is what
must stay small and broadcastable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ROBOTS_RULES_SCHEMA = (
    "host string, path_prefix string, allow boolean, crawl_delay_ms int"
)


def parse_robots_txt(
    body: str, user_agent: str = "logcrawler"
) -> tuple[list[tuple[str, bool]], int | None]:
    """One robots.txt body -> ([(pattern, allow), ...], crawl_delay_ms).

    Group selection per RFC 9309 §2.2.1: the most specific matching
    user-agent token wins; every group tied at that token contributes
    rules; ``*`` groups apply only when no specific group matches.
    """
    ua = user_agent.lower()
    groups: list[tuple[list[str], list[tuple[str, bool]], int | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: int | None = None
    in_group_header = True

    def flush() -> None:
        nonlocal cur_agents, cur_rules, cur_delay
        if cur_agents:
            groups.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_group_header:
                flush()
                in_group_header = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_group_header = False
            if value:  # empty pattern = no-op rule (RFC 9309 §2.2.2)
                # full pattern, wildcards and all — the matcher resolves
                # *, trailing $, and specificity (r4, ADVICE/VERDICT r03)
                cur_rules.append((value, field == "allow"))
        elif field == "crawl-delay":
            in_group_header = False
            try:
                cur_delay = int(float(value) * 1000)  # last in group wins
            except ValueError:
                pass
        else:
            # sitemap / unrecognized fields: ignored as rules, but any
            # non-user-agent line ENDS a user-agent header run — a later
            # User-agent line starts a NEW group (RFC 9309 §2.2.1)
            in_group_header = False
    flush()

    # most specific agent token = longest token that is a substring of ua
    best_len = -1
    for agents, _r, _d in groups:
        for a in agents:
            if a != "*" and a in ua and len(a) > best_len:
                best_len = len(a)
    rules: list[tuple[str, bool]] = []
    delay: int | None = None
    for agents, grules, gdelay in groups:
        specific = any(
            a != "*" and a in ua and len(a) == best_len for a in agents
        )
        fallback = best_len < 0 and "*" in agents
        if specific or fallback:
            rules.extend(grules)
            if gdelay is not None:
                delay = gdelay if delay is None else max(delay, gdelay)
    return rules, delay


def robots_rules_from_bodies(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "logcrawler",
) -> DataFrame:
    """(host, robots_txt) -> the engine's rule table, one row per rule.

    Hosts whose body yields no applicable rules emit NO rows (the
    broadcast matcher treats an absent host as allow-all, exactly the
    RFC's default); a group with only a crawl-delay emits one delay-only
    marker row with a NULL path so the delay survives aggregation.
    """

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                rules, delay = parse_robots_txt(body or "", user_agent)
                for prefix, allow in rules:
                    out.append((host, prefix, allow, delay))
                if not rules and delay is not None:
                    out.append((host, None, True, delay))
            yield pd.DataFrame(
                out,
                columns=["host", "path_prefix", "allow", "crawl_delay_ms"],
            )

    return df.select(host_col, body_col).mapInPandas(
        _parse, schema=ROBOTS_RULES_SCHEMA
    )
