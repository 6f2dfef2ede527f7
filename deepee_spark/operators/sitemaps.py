"""Sitemap parsing (sitemaps.org XML protocol — public spec) — crawl
frontier seeding.

A crawl pipeline's frontier isn't only discovered links
(operators/links.py) — the other public seed channel is the sitemap:
``<urlset>`` documents listing ``<url><loc>/<lastmod>/<priority>``
entries, and ``<sitemapindex>`` documents listing child sitemaps. This
operator turns fetched sitemap bodies into frontier candidate rows the
existing admission stack consumes (Bloom frontier gate -> robots
admission -> politeness schedule -> refresh priorities).

Same narrow discipline as links.py/webtables.py: bodies decode once,
entries surface via regexp_extract_all + explode, per-entry fields via
plain per-row regexp_extract — zero shuffle, zero UDF, linear scan.
``<lastmod>`` ISO dates route through the shared timex normalizer so
malformed publisher dates degrade to NULL rather than poisoning the
refresh scheduler.

Rules (documented, oracle-replicable):
  - one row per <url> element in document order (urlset) or per
    <sitemap> element (index);
  - loc is required (entries without a parseable <loc> are dropped)
    and is whitespace-trimmed;
  - lastmod keeps the leading yyyy-MM-dd of whatever the publisher
    wrote if it validates under timex rules, else NULL;
  - priority must parse as a float in [0,1], else the protocol
    default 0.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepee_spark.operators.timex import normalize_expr

_URL_RE = r"(?si)<url>(.*?)</url\s*>"
_CHILD_RE = r"(?si)<sitemap>(.*?)</sitemap\s*>"
_LOC_RE = r"(?si)<loc>\s*(.*?)\s*</loc\s*>"
_LASTMOD_RE = r"(?si)<lastmod>\s*(.*?)\s*</lastmod\s*>"
_PRIORITY_RE = r"(?si)<priority>\s*(.*?)\s*</priority\s*>"


def _body(docs: DataFrame, xml_col: str):
    return (
        F.decode(F.col(xml_col), "UTF-8")
        if dict(docs.dtypes)[xml_col] == "binary"
        else F.col(xml_col)
    )


def parse_sitemaps(
    docs: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(sitemap_url, xml) -> (sitemap_url, entry_idx, loc, lastmod,
    priority): the urlset entries. Narrow map + one explode."""
    entries = F.regexp_extract_all(
        _body(docs, xml_col), F.lit(_URL_RE), F.lit(1)
    )
    per = docs.select(
        F.col(url_col).alias("sitemap_url"), entries.alias("_e")
    ).select(
        "sitemap_url", F.posexplode("_e").alias("entry_idx", "_entry")
    )
    loc = F.regexp_extract("_entry", _LOC_RE, 1)
    lastmod_raw = F.substring(
        F.regexp_extract("_entry", _LASTMOD_RE, 1), 1, 10
    )
    # try_cast: absent <priority> extracts as '', which ANSI cast rejects
    prio_raw = F.regexp_extract("_entry", _PRIORITY_RE, 1).try_cast("double")
    prio = F.when(prio_raw.between(0.0, 1.0), prio_raw).otherwise(F.lit(0.5))
    return (
        per.select(
            "sitemap_url",
            "entry_idx",
            loc.alias("loc"),
            normalize_expr(lastmod_raw).alias("lastmod"),
            prio.alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def parse_sitemap_index(
    docs: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(sitemap_url, xml) -> (sitemap_url, entry_idx, child_loc,
    lastmod): the sitemapindex fan-out — child sitemaps to fetch next.
    Same shape as parse_sitemaps; the crawl loop unions the children
    back into its fetch frontier."""
    entries = F.regexp_extract_all(
        _body(docs, xml_col), F.lit(_CHILD_RE), F.lit(1)
    )
    per = docs.select(
        F.col(url_col).alias("sitemap_url"), entries.alias("_e")
    ).select(
        "sitemap_url", F.posexplode("_e").alias("entry_idx", "_entry")
    )
    loc = F.regexp_extract("_entry", _LOC_RE, 1)
    lastmod_raw = F.substring(
        F.regexp_extract("_entry", _LASTMOD_RE, 1), 1, 10
    )
    return (
        per.select(
            "sitemap_url",
            "entry_idx",
            loc.alias("child_loc"),
            normalize_expr(lastmod_raw).alias("lastmod"),
        )
        .filter(F.col("child_loc") != "")
    )
