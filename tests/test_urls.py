"""Canonicalization / SURT unit tests (property + example based)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logcrawler_spark.functions.urls import (
    canonicalize_url,
    surt,
    url_hash,
    url_host,
)
from logcrawler_spark.oracles import frontier_sim as o

CASES = [
    ("HTTP://WWW.Example.COM:80/a/b?z=1&a=2#frag", "http://www.example.com/a/b?a=2&z=1"),
    ("http://host1.example.com//d1//p1", "http://host1.example.com/d1/p1"),
    ("https://example.org:443/", "https://example.org/"),
    ("http://example.org", "http://example.org/"),
    ("http://user:pw@Example.net:8080/x?b=&a=1", "http://example.net:8080/x?a=1&b="),
    ("http://example.com./p", "http://example.com/p"),
    ("http://example.com/p?", "http://example.com/p"),
]


def test_canonicalize_examples(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r[0]
        for r in df.select(canonicalize_url(F.col("url"))).collect()
    ]
    assert got == [want for _, want in CASES]


def test_canonicalize_matches_python_oracle(spark):
    urls = [u for u, _ in CASES] + [
        "http://mega1.example.com/d13/p7?b=2&a=1&",
        "HTTPS://A.B.C.D.ORG/deep/path/x?q=1#z",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [o.canonicalize(u) for u in urls]


def test_canonicalize_idempotent(spark):
    urls = [u for u, _ in CASES]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c2"))
    assert [r[0] for r in twice.collect()] == [
        r[0] for r in once.collect()
    ]


def test_surt_is_sort_friendly(spark):
    df = spark.createDataFrame(
        [("http://b.example.com/x",), ("http://a.example.com/y",),
         ("http://example.com/z",)],
        "url string",
    )
    got = [r[0] for r in df.select(surt(F.col("url"))).collect()]
    assert got == [
        "com,example,b)/x",
        "com,example,a)/y",
        "com,example)/z",
    ]
    # same registered domain sorts adjacently
    assert sorted(got)[0].startswith("com,example")


def test_url_hash_is_canonical_invariant(spark):
    """Trap variants of the same URL must hash identically."""
    df = spark.createDataFrame(
        [
            ("http://Example.COM:80/p?b=2&a=1#f",),
            ("http://example.com/p?a=1&b=2",),
        ],
        "url string",
    )
    hs = [r[0] for r in df.select(url_hash(F.col("url"))).collect()]
    assert hs[0] == hs[1]


def test_host_extraction(spark):
    df = spark.createDataFrame(
        [("http://u@HOST.Example.ORG.:8080/p",)], "url string"
    )
    assert df.select(url_host(F.col("url"))).collect()[0][0] == "host.example.org"


def test_canonicalize_fuzz_agreement_spark_vs_simulator(spark):
    """Seeded fuzz over realistic web URLs: the Spark expression pipeline
    and the pure-Python simulator must canonicalize IDENTICALLY — any
    divergence corrupts the URL-seen keying. Grammar: http/https, cased
    hosts, trailing host dots, userinfo, default/explicit ports, duplicate
    slashes, query param orderings/empties, fragments."""
    import random

    rng = random.Random(42)
    schemes = ["http", "https", "HTTP", "Http"]
    hosts = [
        "example.com", "EXAMPLE.com", "Sub.Example.COM", "host7.example.net",
        "example.com.", "xn--bcher-kva.example", "a.b.c.d.example.org",
    ]
    users = ["", "", "", "user@", "u:p@"]
    ports = ["", "", ":80", ":443", ":8080", ":8443"]
    paths = [
        "", "/", "/a", "/a/b/c", "//a", "/a//b", "/a///b//", "/d13/p5",
        "/a.b/c.d", "/%7Euser/x",
    ]
    queries = [
        "", "?b=2&a=1", "?a=1&b=2&", "?z=9", "?a=1&&b=2", "?single",
        "?b=2&a=1&a=0",
    ]
    frags = ["", "#frag", "#a/b?c=1"]

    urls = []
    for _ in range(600):
        urls.append(
            rng.choice(schemes) + "://" + rng.choice(users)
            + rng.choice(hosts) + rng.choice(ports) + rng.choice(paths)
            + rng.choice(queries) + rng.choice(frags)
        )

    from logcrawler_spark.functions.urls import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["c"]
        for r in df.select(
            "url", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    mismatches = [
        (u, got[u], o.canonicalize(u)) for u in urls if got[u] != o.canonicalize(u)
    ]
    assert not mismatches, mismatches[:5]
