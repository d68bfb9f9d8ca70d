"""Deterministic synthetic crawl tables per BASELINE.json ``input_hint``.

Builds the canonical input table
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``
plus ``seeds(url, priority)`` and ``robots_rules(host, path_prefix, allow,
crawl_delay_ms)`` — all derived with pure column expressions from the
driver-provided ``documents`` parquet (seed=42, read-only), so the tables are
deterministic at every scale factor and involve no external data.

Reference analog: the directory-tree catalog that the reference's scripts
discover work from (``01_input_game_data.py:77-99``) — here the "catalog" is
a generated page corpus whose URL population has:

- a Zipf-skewed host distribution (log-uniform host rank => density ~ 1/rank)
  with designated mega-hosts, for skew-handling tests (SURVEY.md §4 R12);
- canonicalization traps (uppercase hosts, default ports, fragments,
  duplicate slashes, shuffled query params) keyed by ``doc_id % 13``;
- html bytes that embed the expected extraction output (the ``text`` column)
  as ``<p>`` blocks plus 3 outlinks in mixed absolute/relative/
  protocol-relative form (link-extraction analog of the option-tree
  flattener, ``10_input_behavior_frames.py:64-93``).

Host/path/url of ANY doc_id are closed-form column expressions, so outlink
targets are computed inline without joins; all arithmetic uses explicit
integer constants (Knuth multiplicative hash 2654435761) so the pure-Python
oracle simulator in ``tests/`` reproduces priorities exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

KNUTH = 2654435761  # Knuth multiplicative hash constant (public domain)
MEGA_HOSTS = 2  # host ranks 1..MEGA_HOSTS are "mega" (receive most URLs)


def _mix(idcol: Column, salt: int) -> Column:
    """Deterministic integer mix, replicable in plain Python/SQL."""
    return F.pmod((idcol + F.lit(salt)) * F.lit(KNUTH), F.lit(2**31))


def _host_rank(idcol: Column, n_hosts: int) -> Column:
    """Zipf(1)-ish host rank in [1, n_hosts]: rank = floor(n_hosts ** u)."""
    u = _mix(idcol, 1) / F.lit(float(2**31))
    rank = F.floor(F.pow(F.lit(float(n_hosts)), u)).cast("long")
    return F.least(rank, F.lit(n_hosts))


def host_expr(idcol: Column, n_hosts: int) -> Column:
    """Canonical (lowercase) host for a doc id."""
    rank = _host_rank(idcol, n_hosts)
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        (F.pmod(rank, F.lit(3)) + 1).cast("int"),
    )
    return F.when(rank <= MEGA_HOSTS, F.concat(F.lit("mega"), rank, F.lit(".example.com"))).otherwise(
        F.concat(F.lit("host"), rank, F.lit(".example."), tld)
    )


def path_expr(idcol: Column) -> Column:
    return F.concat(
        F.lit("/d"), F.pmod(idcol, F.lit(97)), F.lit("/p"), idcol
    )


def canonical_url_expr(idcol: Column, n_hosts: int) -> Column:
    """The canonical URL for a doc id (what canonicalize_url must produce)."""
    return F.concat(F.lit("http://"), host_expr(idcol, n_hosts), path_expr(idcol))


def trapped_url_expr(idcol: Column, n_hosts: int) -> Column:
    """URL with canonicalization traps keyed by ``doc_id % 13``."""
    host = host_expr(idcol, n_hosts)
    path = path_expr(idcol)
    trap = F.pmod(idcol, F.lit(13))
    base = F.concat(F.lit("http://"), host, path)
    return (
        F.when(trap == 0, F.concat(F.lit("http://"), F.upper(host), path))
        .when(trap == 1, F.concat(F.lit("http://"), host, F.lit(":80"), path))
        .when(trap == 2, F.concat(F.lit("http://"), host, path, F.lit("#frag")))
        .when(trap == 3, F.concat(F.lit("http://"), host, F.regexp_replace(path, "/p", "//p")))
        .when(trap == 4, F.concat(base, F.lit("?b=2&a=1")))
        .when(trap == 5, F.concat(base, F.lit("?a=1&b=2&")))
        .otherwise(base)
    )


def priority_expr(idcol: Column) -> Column:
    """Crawl priority in [0, 100), step 0.1 — exact-in-both-engines double."""
    return (_mix(idcol, 7) % F.lit(1000)).cast("double") / F.lit(10.0)


def _outlink_target(idcol: Column, salt: int, n_docs: int) -> Column:
    return F.pmod(_mix(idcol, salt), F.lit(n_docs))


def generate_pages(
    spark: SparkSession, sf_dir: str, n_hosts: int = 500,
    explode_factor: int = 1, html_pad: int = 0,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) from ``{sf_dir}/documents.parquet``.

    ``explode_factor`` E deterministically amplifies the corpus (bench
    scale): each document becomes E pages with ids ``doc_id*E + k`` (unique,
    closed-form), reusing the document text so the extraction invariant is
    unchanged. E=1 (tests) is the identity.

    ``html_pad`` P inserts P copies of a 40-byte non-paragraph filler block
    into the html body (markup the extraction kernel must scan and skip),
    approximating realistic page sizes (P=256 ~ 10 KB) without changing the
    expected extraction output.
    """
    docs = _expanded_docs(spark, sf_dir, explode_factor)
    n_docs = docs.count()
    d = F.col("doc_id")

    # text split into <=2 paragraphs so extraction is non-trivial:
    # p1 = first 10 words, p2 = remainder; kernel re-joins with one space.
    p1 = F.substring_index(F.col("text"), " ", 10)
    p2 = F.expr("substring(text, length(substring_index(text, ' ', 10)) + 2)")

    # three outlinks per page in mixed forms
    t1, t2, t3 = (_outlink_target(d, s, n_docs) for s in (11, 13, 17))
    link_abs = trapped_url_expr(t1, n_hosts)  # absolute, possibly trapped
    link_rel = F.concat(F.lit("p"), t2)  # relative to page dir
    link_root = path_expr(t3)  # root-relative (same host as target? no: same host as page)

    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d,
        F.lit("</title></head><body><p>"),
        p1,
        F.when(p2 != "", F.concat(F.lit("</p><p>"), p2)).otherwise(F.lit("")),
        F.lit("</p>"),
        F.repeat(
            F.lit('<div class="nav"><span>menu item</span></div>'),
            html_pad,
        ),
        F.lit('<a href="'),
        link_abs,
        F.lit('">l1</a><a href="'),
        link_rel,
        F.lit('">l2</a><a href="'),
        link_root,
        F.lit('">l3</a></body></html>'),
    )

    warc_ts = F.to_timestamp(F.lit("2024-01-01 00:00:00")) + F.make_dt_interval(
        secs=(d * 3 + F.pmod(_mix(d, 3), F.lit(120))).cast("double")
    )

    return docs.select(
        trapped_url_expr(d, n_hosts).alias("url"),
        warc_ts.alias("warc_ts"),
        html.cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def _expanded_docs(
    spark: SparkSession, sf_dir: str, explode_factor: int
) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    if explode_factor <= 1:
        return docs
    e = F.lit(explode_factor)
    reps = spark.range(explode_factor).select(F.col("id").alias("__k"))
    return docs.crossJoin(reps).select(
        (F.col("doc_id") * e + F.col("__k")).alias("doc_id"), "text", "lang"
    )


def generate_seeds(
    spark: SparkSession, sf_dir: str, n_hosts: int = 500,
    explode_factor: int = 1,
) -> DataFrame:
    """seeds(url, priority): every 11th doc, plus some 404s (no page)."""
    docs = _expanded_docs(spark, sf_dir, explode_factor)
    n_docs = docs.count()
    d = F.col("doc_id")
    live = docs.filter(F.pmod(d, F.lit(11)) == 0).select(
        trapped_url_expr(d, n_hosts).alias("url"),
        priority_expr(d).alias("priority"),
    )
    dead = docs.filter(F.pmod(d, F.lit(101)) == 0).select(
        canonical_url_expr(d + F.lit(n_docs), n_hosts).alias("url"),
        priority_expr(d + F.lit(n_docs)).alias("priority"),
    )
    return live.unionByName(dead)


def generate_robots_rules(
    spark: SparkSession, n_hosts: int = 500
) -> DataFrame:
    """robots_rules(host, path_prefix, allow, crawl_delay_ms).

    Every 5th host rank disallows ``/d13``; every 10th additionally
    re-allows the deeper ``/d13/p`` prefix (longest-prefix-wins semantics,
    reference analog: folder exclusion rules ``01_input_game_data.py:88-93``);
    every 20th ALSO carries a same-length ``/d13`` allow rule — the
    equal-length tie case, where allow wins (RFC 9309 convention, pinned in
    both the Spark filter and the pure-Python simulator). Every 7th host
    carries a WILDCARD rule ``/d2*/p4$`` (mid-pattern star + end anchor,
    r4: the full-RFC matcher path exercised inside the driver-checked
    flagship crawl, not just in the parser fixtures).
    """
    ranks = spark.range(1, n_hosts + 1).select(F.col("id").alias("rank"))
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        (F.pmod(F.col("rank"), F.lit(3)) + 1).cast("int"),
    )
    hostcol = F.when(
        F.col("rank") <= MEGA_HOSTS,
        F.concat(F.lit("mega"), F.col("rank"), F.lit(".example.com")),
    ).otherwise(F.concat(F.lit("host"), F.col("rank"), F.lit(".example."), tld))

    disallow = ranks.filter(F.pmod(F.col("rank"), F.lit(5)) == 0).select(
        hostcol.alias("host"),
        F.lit("/d13").alias("path_prefix"),
        F.lit(False).alias("allow"),
        F.lit(500).cast("long").alias("crawl_delay_ms"),
    )
    reallow = ranks.filter(F.pmod(F.col("rank"), F.lit(10)) == 0).select(
        hostcol.alias("host"),
        F.lit("/d13/p").alias("path_prefix"),
        F.lit(True).alias("allow"),
        F.lit(500).cast("long").alias("crawl_delay_ms"),
    )
    tie_allow = ranks.filter(F.pmod(F.col("rank"), F.lit(20)) == 0).select(
        hostcol.alias("host"),
        F.lit("/d13").alias("path_prefix"),
        F.lit(True).alias("allow"),
        F.lit(500).cast("long").alias("crawl_delay_ms"),
    )
    wildcard = ranks.filter(F.pmod(F.col("rank"), F.lit(7)) == 0).select(
        hostcol.alias("host"),
        F.lit("/d2*/p4$").alias("path_prefix"),
        F.lit(False).alias("allow"),
        F.lit(500).cast("long").alias("crawl_delay_ms"),
    )
    return (
        disallow.unionByName(reallow)
        .unionByName(tie_allow)
        .unionByName(wildcard)
    )
