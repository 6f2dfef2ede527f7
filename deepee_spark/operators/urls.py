"""URL canonicalization for crawl-scale dedup and per-host statistics.

A Common-Crawl-style corpus keys everything on url (the pipeline's
partitioning column), but raw crawl URLs carry noise that splits one
logical page across keys: mixed-case scheme/host, default ports,
tracking query params, fragments, trailing slashes. Canonicalizing
BEFORE the url-hash repartition makes exact URL dedup and per-host
aggregation see through that noise.

Rules (each a pure JVM regexp/string expression — no UDF):
  1. scheme + host lowercased (path/query case preserved)
  2. default port stripped (:80 for http, :443 for https)
  3. fragment stripped (#...)
  4. tracking params dropped: utm_* / fbclid / gclid / ref
  5. empty query ('?' left over after 4) stripped
  6. trailing slash stripped from non-root paths

The reference has no URL handling (file-based corpora); this is engine
infrastructure for the 10^12-doc web-crawl setting the north rule
targets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = r"(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*"


def canonical_url(url: Column) -> Column:
    # 1. lowercase scheme://host (up to the first '/' after '://');
    #    empty extract (no scheme) degenerates to the identity
    prefix = F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    c = F.concat(F.lower(prefix), F.substr(url, F.length(prefix) + 1))
    # 2. default ports
    c = F.regexp_replace(c, r"^(https://[^/?#:]*):443(?=[/?#]|$)", r"$1")
    c = F.regexp_replace(c, r"^(http://[^/?#:]*):80(?=[/?#]|$)", r"$1")
    # 3. fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # 4. tracking params (with their connecting '&' either side)
    c = F.regexp_replace(c, r"&" + _TRACKING, "")
    c = F.regexp_replace(c, r"\?" + _TRACKING + r"&", "?")
    c = F.regexp_replace(c, r"\?" + _TRACKING + r"$", "")
    # 5. dangling '?'
    c = F.regexp_replace(c, r"\?$", "")
    # 6. trailing slash on a non-root path
    c = F.regexp_replace(c, r"(://[^/?#]*/[^?#]*?)/+(?=\?|$)", r"$1")
    return c


def host_of(url: Column) -> Column:
    """Lowercased host (no port) of a scheme://host... URL."""
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)", 1))


def filter_blocked_hosts(df: DataFrame, blocked_hosts: DataFrame,
                         url_col: str = "url") -> DataFrame:
    """Drop rows whose URL host appears in the blocklist dimension.

    The blocklist (a `host` column) is a curated dimension orders of
    magnitude smaller than the crawl, so it is broadcast and the crawl
    side runs a shuffle-free LEFT ANTI BroadcastHashJoin — the plan is
    gated in tests/test_plans.py.
    """
    b = F.broadcast(
        blocked_hosts.select(F.lower("host").alias("_blocked_host")).distinct()
    )
    return df.join(
        b, host_of(F.col(url_col)) == F.col("_blocked_host"), "left_anti"
    )


def url_host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-host crawl stats over canonicalized URLs: page count, distinct
    canonical pages (the exact-URL-dedup cardinality), dup fraction.
    One partial-agged shuffle on host."""
    canon = df.select(
        host_of(F.col(url_col)).alias("host"),
        canonical_url(F.col(url_col)).alias("canonical"),
    )
    return canon.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages"),
        F.countDistinct("canonical").alias("n_canonical"),
        F.round(
            1 - F.countDistinct("canonical") / F.count(F.lit(1)), 6
        ).alias("dup_frac"),
    )
