"""robots.txt parsing + longest-prefix-wins crawl admission.

The ingestion edge of a Common-Crawl-style pipeline: before a URL is
fetched (or before a stored page is admitted into the corpus, when
honoring retroactive exclusions) it must pass the host's robots rules.
The reference repo starts from already-collected corpora (DeepEE loads
ACE/DuEE files); this is the upstream admission operator a web-scale
build needs.

Semantics implemented (RFC 9309 core, documented simplifications):
  - a robots body is parsed line-wise: optional whitespace,
    case-insensitive `Allow:` / `Disallow:` directives, `#` comments
    stripped, other lines (User-agent, Sitemap, noise) ignored — i.e.
    the single-agent (`*`) reading;
  - a directive with an empty path matches nothing (per the RFC,
    `Disallow:` empty = no restriction);
  - matching is pure path-prefix (the RFC core; the `*`/`$` wildcard
    extension is out of scope and documented as such);
  - decision per URL = the LONGEST matching prefix wins; on a length
    tie Allow beats Disallow; no matching rule = allowed.

Scale shape: rules are one small row-set per host (robots files are
size-capped in practice), URLs are the 10^12-row side. The decision is
one equi-join on host followed by a partial-aggregatable max_by — no
window over the URL stream, no per-URL Python. Skew per host is
bounded by (rules on that host) x (URLs on that host); the join key is
the host, the same key the crawl is naturally partitioned by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIRECTIVE_RE = r"^\s*([Aa][Ll][Ll][Oo][Ww]|[Dd][Ii][Ss][Aa][Ll][Ll][Oo][Ww])\s*:\s*(\S*)"


def parse_robots(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots"
) -> DataFrame:
    """(host, prefix, allow): one row per effective directive. Comments
    stripped, non-directive lines dropped, empty paths dropped."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(robots_col), "\n")).alias("line"),
    ).withColumn("line", F.regexp_replace("line", "#.*$", ""))
    parsed = lines.select(
        "host",
        F.lower(F.regexp_extract("line", _DIRECTIVE_RE, 1)).alias("directive"),
        F.regexp_extract("line", _DIRECTIVE_RE, 2).alias("prefix"),
    ).filter((F.col("directive") != "") & (F.col("prefix") != ""))
    return parsed.select(
        "host", "prefix", (F.col("directive") == "allow").alias("allow")
    ).distinct()


def robots_decisions(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """(url, host, allowed): longest-prefix-wins admission per URL.

    One host equi-join + one max_by aggregation; both partial-agg and
    join are host-partitioned, so the URL side never sees a window or
    a driver round-trip.
    """
    # host via urls.host_of — the ONE host definition (case-insensitive
    # scheme, port stripped, lowercased). A bespoke ^[a-z]+:// regex
    # here would hand uppercase-scheme URLs an empty host, miss every
    # rule, and ADMIT them through the no-rule default.
    from .urls import host_of

    u = urls.select(
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("host"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    url_col, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/.*)$", 1
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("path"),
    )
    joined = u.join(rules, "host", "left").withColumn(
        "hit", F.col("prefix").isNotNull() & F.col("path").startswith(F.col("prefix"))
    )
    # winner = max over struct(prefix_len, allow): longer prefix wins,
    # Allow beats Disallow on ties; NULL when no rule matched
    decided = joined.groupBy("url", "host").agg(
        F.max(
            F.when(
                F.col("hit"),
                F.struct(
                    F.length("prefix").alias("l"), F.col("allow").alias("a")
                ),
            )
        ).alias("w")
    )
    return decided.select(
        "url", "host", F.coalesce(F.col("w.a"), F.lit(True)).alias("allowed")
    )


def robots_oracle_sql(urls_sql: str, robots_sql: str) -> str:
    """DuckDB twin: same parse, same longest-prefix/Allow-wins rule.
    urls_sql -> (url), robots_sql -> (host, robots)."""
    return f"""
WITH u AS (
  SELECT url,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)', 1)) AS host,
         coalesce(nullif(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]+(/.*)$', 1), ''), '/') AS path
  FROM ({urls_sql})
),
lines AS (
  SELECT host, regexp_replace(unnest(string_split(robots, chr(10))), '#.*$', '') AS line
  FROM ({robots_sql})
),
rules AS (
  SELECT DISTINCT host,
         regexp_extract(line, '^\\s*([Aa][Ll][Ll][Oo][Ww]|[Dd][Ii][Ss][Aa][Ll][Ll][Oo][Ww])\\s*:\\s*(\\S*)', 2) AS prefix,
         lower(regexp_extract(line, '^\\s*([Aa][Ll][Ll][Oo][Ww]|[Dd][Ii][Ss][Aa][Ll][Ll][Oo][Ww])\\s*:\\s*(\\S*)', 1)) = 'allow' AS allow
  FROM lines
  WHERE regexp_extract(line, '^\\s*([Aa][Ll][Ll][Oo][Ww]|[Dd][Ii][Ss][Aa][Ll][Ll][Oo][Ww])\\s*:\\s*(\\S*)', 1) <> ''
    AND regexp_extract(line, '^\\s*([Aa][Ll][Ll][Oo][Ww]|[Dd][Ii][Ss][Aa][Ll][Ll][Oo][Ww])\\s*:\\s*(\\S*)', 2) <> ''
),
joined AS (
  SELECT u.url, u.host,
         CASE WHEN r.prefix IS NOT NULL AND starts_with(u.path, r.prefix)
              THEN {{'l': length(r.prefix), 'a': r.allow}} END AS w
  FROM u LEFT JOIN rules r ON u.host = r.host
)
SELECT url, host, coalesce(max(w).a, TRUE) AS allowed
FROM joined GROUP BY url, host
"""


def extract_sitemap_urls(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """robots.txt bodies -> (host, sitemap_url): the `Sitemap:` lines
    (sitemaps.org autodiscovery — the protocol's third seed channel
    beside links and known sitemap paths). Case-insensitive directive,
    value trimmed, one row per occurrence in file order; the output
    feeds operators/sitemaps.parse_sitemaps / parse_sitemap_index.
    Pure regexp + explode, zero shuffle."""
    urls = F.regexp_extract_all(
        F.col(body_col), F.lit(r"(?im)^\s*sitemap\s*:\s*(\S+)\s*$"), F.lit(1)
    )
    return (
        robots.select(F.col(host_col).alias("host"), urls.alias("_u"))
        .select("host", F.posexplode("_u").alias("idx", "sitemap_url"))
    )


_DELAY_RE = (
    r"^\s*[Cc][Rr][Aa][Ww][Ll]-[Dd][Ee][Ll][Aa][Yy]\s*:\s*([0-9]+(?:\.[0-9]+)?)"
)


def extract_crawl_delays(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots"
) -> DataFrame:
    """(host, crawl_delay_ms): the `Crawl-delay:` directive feeding the
    politeness scheduler (non-standard but honored by major crawlers;
    same single-agent reading as parse_robots). Multiple directives on
    one host resolve to the MOST CONSERVATIVE (maximum) delay —
    deterministic and safe-side. Values parse as seconds (integer or
    decimal) and emit as integer milliseconds; hosts without a valid
    directive emit no row (caller supplies the fleet default).
    Same scale shape as parse_robots: line explode + one partial-agged
    groupBy(host)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(robots_col), "\n")).alias("line"),
    ).withColumn("line", F.regexp_replace("line", "#.*$", ""))
    vals = lines.select(
        "host",
        F.regexp_extract("line", _DELAY_RE, 1).alias("secs"),
    ).filter(F.col("secs") != "")
    return vals.groupBy("host").agg(
        F.max(F.bround(F.col("secs").cast("double") * 1000).cast("long"))
        .alias("crawl_delay_ms")
    )


def crawl_delays_oracle_sql(robots_sql: str) -> str:
    """DuckDB twin over (host, robots) rows."""
    return f"""
WITH lines AS (
  SELECT host,
         regexp_replace(UNNEST(string_split(robots, chr(10))),
                        '#.*$', '') AS line
  FROM ({robots_sql})),
vals AS (
  SELECT host,
         regexp_extract(line,
           '^\\s*[Cc][Rr][Aa][Ww][Ll]-[Dd][Ee][Ll][Aa][Yy]\\s*:\\s*([0-9]+(?:\\.[0-9]+)?)',
           1) AS secs
  FROM lines)
SELECT host,
       CAST(MAX(CAST(round_even(CAST(secs AS DOUBLE) * 1000, 0) AS BIGINT))
            AS BIGINT) AS crawl_delay_ms
FROM vals WHERE secs <> '' GROUP BY host
"""
