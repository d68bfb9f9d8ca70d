"""RFC 9309 robots.txt parsing -> engine rule table -> broadcast matcher."""

from __future__ import annotations

from logcrawler_spark.functions.robots import (
    parse_robots_txt,
    robots_rules_from_bodies,
)

BODY = """
# comments are stripped
User-agent: MegaBot
Disallow: /private
Crawl-delay: 2

User-agent: logcrawler
User-agent: otherbot
Disallow: /tmp/
Allow: /tmp/public
Crawl-delay: 1.5

User-agent: *
Disallow: /
"""


def test_group_selection_prefers_most_specific_agent():
    rules, delay = parse_robots_txt(BODY, user_agent="logcrawler/1.0")
    assert rules == [("/tmp/", False), ("/tmp/public", True)]
    assert delay == 1500
    # unknown UA falls back to the * group
    rules, delay = parse_robots_txt(BODY, user_agent="somebody-else")
    assert rules == [("/", False)]
    assert delay is None


def test_tied_specific_groups_merge():
    body = (
        "User-agent: bot\nDisallow: /a\n\n"
        "User-agent: bot\nDisallow: /b\nCrawl-delay: 3\n"
    )
    rules, delay = parse_robots_txt(body, user_agent="bot")
    assert rules == [("/a", False), ("/b", False)] and delay == 3000


def test_patterns_carried_in_full_and_empty_is_noop():
    """r4: wildcard patterns survive parsing verbatim (the matcher resolves
    * and $); only empty patterns are dropped (RFC 9309 §2.2.2 no-op)."""
    body = (
        "User-agent: *\n"
        "Disallow: /search/*/results\n"
        "Disallow: /exact$\n"
        "Disallow:\n"                     # empty pattern: no-op
        "Allow: /search/cached\n"
    )
    rules, _ = parse_robots_txt(body, user_agent="x")
    assert rules == [
        ("/search/*/results", False), ("/exact$", False),
        ("/search/cached", True),
    ]


def test_bodies_to_rule_table_and_matcher_roundtrip(spark):
    """Parsed bodies feed apply_robots directly: longest-prefix-wins over
    the parsed rules, allow-all for hosts without rows."""
    from pyspark.sql import functions as F

    from logcrawler_spark.plans.frontier import apply_robots

    bodies = spark.createDataFrame(
        [
            ("a.org", "User-agent: *\nDisallow: /d\nAllow: /d/ok\n"
                      "Crawl-delay: 0.2\n"),
            ("b.org", "User-agent: megabot\nDisallow: /\n"),  # not us
            ("c.org", None),
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules_from_bodies(bodies)
    got = {
        (r["host"], r["path_prefix"], r["allow"], r["crawl_delay_ms"])
        for r in rules.collect()
    }
    assert got == {("a.org", "/d", False, 200), ("a.org", "/d/ok", True, 200)}

    cand = spark.createDataFrame(
        [
            ("http://a.org/d/no", "a.org", "/d/no", 1, 0.5),
            ("http://a.org/d/ok/x", "a.org", "/d/ok/x", 2, 0.5),
            ("http://a.org/fine", "a.org", "/fine", 3, 0.5),
            ("http://b.org/d/no", "b.org", "/d/no", 4, 0.5),
        ],
        "canonical_url string, host string, path string, url_hash long,"
        " priority double",
    )
    out = apply_robots(cand, rules)
    kept = {r["canonical_url"]: r["crawl_delay_ms"] for r in out.collect()}
    assert set(kept) == {
        "http://a.org/d/ok/x",   # allow overrides the shorter disallow
        "http://a.org/fine",     # no matching rule
        "http://b.org/d/no",     # no rows for this host -> allow-all
    }
    assert kept["http://a.org/fine"] == 200
    assert kept["http://b.org/d/no"] is None


def test_wildcard_and_anchor_matching_full_rfc(spark):
    """RFC 9309 §2.2.2 wildcard semantics end-to-end (VERDICT r03 item 3):
    mid-pattern *, $ anchors, specificity = pattern octet length with
    allow winning ties — engine matcher vs the pure-Python simulator on
    the same rule table."""
    import pandas as pd

    from logcrawler_spark.oracles.frontier_sim import simulate_crawl
    from logcrawler_spark.plans.frontier import apply_robots

    robots_rows = [
        ("w.org", "/search/*/res", False, 100),  # mid-pattern wildcard
        ("w.org", "/search/*/res/keep*", True, 100),  # longer allow
        ("w.org", "/exact$", False, 100),        # end anchor
        ("w.org", "/p*.php$", False, 100),       # star + anchor
        ("w.org", "/tie*", False, 100),          # specificity tie:
        ("w.org", "/tie$", True, 100),           # same octets -> allow
    ]
    paths = [
        ("/search/a/res/x", False),    # mid-* deny
        ("/search/a/res/keep/x", True),# longer wildcard allow wins
        ("/exact", False),             # anchored exact
        ("/exact/sub", True),          # anchor must not match deeper
        ("/pq.php", False),            # star+anchor
        ("/pq.phpx", True),            # anchor rejects trailing octets
        ("/tie", True),                # 5-octet tie -> allow wins
        ("/elsewhere", True),
    ]
    robots = spark.createDataFrame(
        robots_rows,
        "host string, path_prefix string, allow boolean, crawl_delay_ms long",
    )
    cand = spark.createDataFrame(
        [
            (f"http://w.org{p}", "w.org", p, i, 1.0)
            for i, (p, _) in enumerate(paths)
        ],
        "canonical_url string, host string, path string, url_hash long,"
        " priority double",
    )
    got = {r["path"] for r in apply_robots(cand, robots).collect()}
    for p, want in paths:
        assert (p in got) == want, f"{p}: engine said {'allow' if p in got else 'deny'}"

    # simulator twin agrees rule-for-rule (schedules exactly the allowed set)
    sim = simulate_crawl(
        pd.DataFrame(columns=["url", "warc_ts", "html"]),
        pd.DataFrame(
            [(f"http://w.org{p}", 1.0) for p, _ in paths],
            columns=["url", "priority"],
        ),
        pd.DataFrame(
            robots_rows,
            columns=["host", "path_prefix", "allow", "crawl_delay_ms"],
        ),
        rounds=1,
        budget=50,
    )
    sim_allowed = {t[3].replace("http://w.org", "") for t in sim.schedule}
    assert sim_allowed == {p for p, want in paths if want}
