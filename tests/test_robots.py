"""robots.txt parsing + longest-prefix admission (operators/robots) vs
an independent single-process implementation, plus the DuckDB twin."""

from __future__ import annotations

import re

import duckdb

from deepee_spark.operators.robots import (
    parse_robots,
    robots_decisions,
    robots_oracle_sql,
)

_ROBOTS = [
    (
        "a.example",
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/   # carve-out\n"
        "disallow: /tmp\n"
        "Disallow:\n"  # empty path: matches nothing
        "Sitemap: http://a.example/sitemap.xml\n",
    ),
    (
        "b.example",
        "# fully open except /x, with an equal-length tie on /y/\n"
        "DISALLOW: /x\n"
        "Allow: /y/\n"
        "Disallow: /y/\n",  # tie with Allow: /y/ -> Allow wins
    ),
    ("c.example", "some noise\nnothing parses here\n"),
]

_URLS = [
    "http://a.example/private/ok/page.html",  # allow (longer Allow)
    "http://a.example/private/no.html",  # disallow
    "http://a.example/tmpfile",  # disallow (/tmp prefix)
    "http://a.example/public/",  # allow (no match)
    "http://a.example",  # path '/', no match -> allow
    "http://b.example/x/deep/page",  # disallow
    "http://b.example/y/page",  # tie -> allow
    "http://b.example/",  # allow
    "http://c.example/anything",  # no rules -> allow
    "http://d.example/whatever",  # unknown host -> allow
]


def _ref_rules():
    out = set()
    for host, body in _ROBOTS:
        for line in body.split("\n"):
            line = re.sub("#.*$", "", line)
            m = re.match(r"^\s*(allow|disallow)\s*:\s*(\S*)", line, re.I)
            if m and m.group(2):
                out.add((host, m.group(2), m.group(1).lower() == "allow"))
    return out


def _ref_decide(url):
    m = re.match(r"^[a-z]+://([^/]+)(/.*)?$", url)
    host, path = m.group(1), m.group(2) or "/"
    hits = [
        (len(p), allow)
        for h, p, allow in _ref_rules()
        if h == host and path.startswith(p)
    ]
    return max(hits)[1] if hits else True


def test_parse_robots(spark):
    rdf = spark.createDataFrame(_ROBOTS, "host string, robots string")
    got = {(r.host, r.prefix, r.allow) for r in parse_robots(rdf).collect()}
    assert got == _ref_rules()
    assert ("a.example", "", False) not in got  # empty Disallow dropped
    assert ("a.example", "/private/ok/", True) in got  # comment stripped


def test_decisions_vs_reference(spark):
    rdf = parse_robots(spark.createDataFrame(_ROBOTS, "host string, robots string"))
    udf_ = spark.createDataFrame([(u,) for u in _URLS], "url string")
    got = {r.url: r.allowed for r in robots_decisions(udf_, rdf).collect()}
    assert got == {u: _ref_decide(u) for u in _URLS}
    # spot semantics
    assert got["http://a.example/private/ok/page.html"] is True
    assert got["http://a.example/private/no.html"] is False
    assert got["http://b.example/y/page"] is True  # Allow wins the tie
    assert got["http://d.example/whatever"] is True


def test_duckdb_twin(spark):
    con = duckdb.connect()
    urls_sql = "SELECT * FROM (VALUES " + ",".join(
        f"($${u}$$)" for u in _URLS
    ) + ") t(url)"
    robots_sql = "SELECT * FROM (VALUES " + ",".join(
        f"($${h}$$, $${b}$$)" for h, b in _ROBOTS
    ) + ") t(host, robots)"
    oracle = {
        u: bool(a)
        for u, _, a in con.execute(robots_oracle_sql(urls_sql, robots_sql)).fetchall()
    }
    rdf = parse_robots(spark.createDataFrame(_ROBOTS, "host string, robots string"))
    udf_ = spark.createDataFrame([(u,) for u in _URLS], "url string")
    got = {r.url: r.allowed for r in robots_decisions(udf_, rdf).collect()}
    assert got == oracle == {u: _ref_decide(u) for u in _URLS}


def test_no_url_side_window(spark):
    """The decision plan must not contain a Window over the URL stream —
    only join + partial-agg shapes."""
    rdf = parse_robots(spark.createDataFrame(_ROBOTS, "host string, robots string"))
    udf_ = spark.createDataFrame([(u,) for u in _URLS], "url string")
    plan = (
        robots_decisions(udf_, rdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan


def test_extract_sitemap_urls(spark):
    from deepee_spark.operators.robots import extract_sitemap_urls

    body = ("User-agent: *\nDisallow: /private\n"
            "Sitemap: https://a.ex/s1.xml\n"
            "  SITEMAP:https://a.ex/s2.xml  \n"
            "NotSitemap: https://a.ex/no.xml\n")
    df = spark.createDataFrame([("a.ex", body), ("b.ex", "Disallow: /")],
                               "host string, body string")
    rows = extract_sitemap_urls(df).orderBy("host", "idx").collect()
    assert [(r.host, r.idx, r.sitemap_url) for r in rows] == [
        ("a.ex", 0, "https://a.ex/s1.xml"),
        ("a.ex", 1, "https://a.ex/s2.xml"),
    ]


def test_extract_crawl_delays(spark):
    import duckdb

    from deepee_spark.operators.robots import (
        crawl_delays_oracle_sql,
        extract_crawl_delays,
    )

    rows = [
        ("a.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x"),
        ("b.com", "Crawl-delay: 0.5  # be gentle\nCrawl-delay: 10"),
        ("c.com", "Crawl-delay: nonsense\nDisallow: /"),
        ("d.com", "no directives here"),
    ]
    df = spark.createDataFrame(rows, "host string, robots string")
    got = {
        r.host: r.crawl_delay_ms
        for r in extract_crawl_delays(df).collect()
    }
    # max wins on b.com; invalid/missing hosts emit nothing
    assert got == {"a.com": 2000, "b.com": 10000}
    con = duckdb.connect()
    con.execute("CREATE TABLE r(host VARCHAR, robots VARCHAR)")
    con.executemany("INSERT INTO r VALUES (?,?)", rows)
    oracle = dict(
        con.execute(
            crawl_delays_oracle_sql("SELECT host, robots FROM r")
        ).fetchall()
    )
    assert got == oracle
    con.close()
