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


def politeness_schedule(
    df: DataFrame,
    gap_s: int,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "ts_s",
) -> DataFrame:
    """Per-host crawl politeness: serialize each host's fetch requests
    so consecutive fetches are >= gap_s apart, never before the request
    time. The defining recurrence (first fetch at its request time,
    then fetch_at_i = max(ts_i, fetch_at_{i-1} + gap)) LOOKS like a
    sequential per-host fold, but unrolls to

        fetch_at_i = max_{j<=i}(ts_j - j*gap) + i*gap

    — a running max over one monotone transform. So the whole schedule
    is two window functions over a single (host)-partitioned sort: one
    exchange on host, sequential only WITHIN a host (politeness is a
    per-host serial constraint by definition), parallel across the
    billions of hosts of a web crawl. No applyInPandas, no recursion,
    exact BIGINT seconds. Returns the input plus fetch_at and wait_s =
    fetch_at - ts (how long the queue delayed the request).

    The DuckDB oracle (politeness_oracle_sql) intentionally runs the
    RECURRENCE ITSELF via a recursive CTE — a different algorithm, so
    an unroll bug here cannot reproduce there; pytest also checks a
    driver-side Python fold.
    """
    from pyspark.sql import Window as W

    if gap_s < 0:
        raise ValueError("gap_s must be >= 0")
    order = W.partitionBy(host_col).orderBy(ts_col, url_col)
    rn = F.row_number().over(order)
    run = W.partitionBy(host_col).orderBy(ts_col, url_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    with_rn = df.withColumn("_rn", rn)
    fetch_at = (
        F.max(F.col(ts_col) - F.col("_rn") * F.lit(gap_s)).over(run)
        + F.col("_rn") * F.lit(gap_s)
    ).cast("long")
    return (
        with_rn.withColumn("fetch_at", fetch_at)
        .withColumn(
            "wait_s", (F.col("fetch_at") - F.col(ts_col)).cast("long")
        )
        .drop("_rn")
    )


def politeness_oracle_sql(source_sql: str, gap_s: int) -> str:
    """DuckDB twin of politeness_schedule over `source_sql` (a SELECT
    yielding host, url, ts_s) — by stepping the defining recurrence
    with a recursive CTE, one rank per step, NOT the window unroll the
    Spark side uses."""
    return f"""
WITH RECURSIVE ranked AS (
  SELECT host, url, ts_s,
         ROW_NUMBER() OVER (PARTITION BY host ORDER BY ts_s, url) AS rn
  FROM ({source_sql})),
sched(host, rn, fetch_at) AS (
  SELECT host, rn, ts_s FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.host, r.rn, GREATEST(r.ts_s, s.fetch_at + {gap_s})
  FROM ranked r JOIN sched s ON r.host = s.host AND r.rn = s.rn + 1
)
SELECT r.host, r.url, r.ts_s,
       CAST(s.fetch_at AS BIGINT) AS fetch_at,
       CAST(s.fetch_at - r.ts_s AS BIGINT) AS wait_s
FROM ranked r JOIN sched s ON s.host = r.host AND s.rn = r.rn
"""
