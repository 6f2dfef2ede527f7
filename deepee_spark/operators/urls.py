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


def politeness_schedule_adaptive(
    df: DataFrame,
    host_gaps: DataFrame,
    default_gap_s: int,
    host_col: str = "host",
    url_col: str = "url",
    ts_col: str = "ts_s",
    delay_col: str = "crawl_delay_ms",
) -> DataFrame:
    """Per-host politeness with robots Crawl-delay overrides — the
    composition the crawler actually runs: ``host_gaps`` is
    robots.extract_crawl_delays' (host, crawl_delay_ms) dimension; a
    host's gap is max(ceil(crawl_delay_ms / 1000), default_gap_s)
    seconds (the crawler never goes faster than its own fleet floor,
    and never faster than the site asks), hosts without a directive
    use the default.

    The gap is CONSTANT WITHIN a host, so politeness_schedule's
    window unroll still applies with the joined per-host value:
    fetch_at_i = max_{j<=i}(ts_j - j*g_h) + i*g_h. Scale shape: ONE
    broadcast join of the host-gap dimension (robots tables are
    host-cardinality — tiny next to the request stream) + the same
    single host-partitioned sort; no applyInPandas, no recursion,
    exact BIGINT seconds. Returns the input plus gap_s, fetch_at,
    wait_s. Oracle: politeness_adaptive_oracle_sql steps the
    recurrence itself (different algorithm, same semantics)."""
    from pyspark.sql import Window as W

    if default_gap_s < 0:
        raise ValueError("default_gap_s must be >= 0")
    gaps = host_gaps.select(
        F.col(host_col).alias("_g_host"),
        F.greatest(
            F.expr(f"({delay_col} + 999) DIV 1000"),
            F.lit(default_gap_s).cast("long"),
        ).cast("long").alias("_gap_s"),
    )
    with_gap = (
        df.join(F.broadcast(gaps), df[host_col] == gaps["_g_host"], "left")
        .drop("_g_host")
        .withColumn(
            "gap_s",
            F.coalesce(F.col("_gap_s"), F.lit(default_gap_s).cast("long")),
        )
        .drop("_gap_s")
    )
    order = W.partitionBy(host_col).orderBy(ts_col, url_col)
    run = W.partitionBy(host_col).orderBy(ts_col, url_col).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    with_rn = with_gap.withColumn("_rn", F.row_number().over(order))
    fetch_at = (
        F.max(F.col(ts_col) - F.col("_rn") * F.col("gap_s")).over(run)
        + F.col("_rn") * F.col("gap_s")
    ).cast("long")
    return (
        with_rn.withColumn("fetch_at", fetch_at)
        .withColumn(
            "wait_s", (F.col("fetch_at") - F.col(ts_col)).cast("long")
        )
        .drop("_rn")
    )


def politeness_adaptive_oracle_sql(
    requests_sql: str, gaps_sql: str, default_gap_s: int
) -> str:
    """DuckDB twin of politeness_schedule_adaptive: ``requests_sql``
    yields (host, url, ts_s), ``gaps_sql`` yields (host,
    crawl_delay_ms). Steps the defining recurrence via a recursive
    CTE — NOT the window unroll the Spark side uses."""
    d = int(default_gap_s)
    return f"""
WITH RECURSIVE ranked AS (
  SELECT r.host, r.url, r.ts_s,
         CAST(COALESCE(GREATEST((g.crawl_delay_ms + 999) // 1000, {d}),
                       {d}) AS BIGINT) AS gap_s,
         ROW_NUMBER() OVER (PARTITION BY r.host
                            ORDER BY r.ts_s, r.url) AS rn
  FROM ({requests_sql}) r
  LEFT JOIN ({gaps_sql}) g ON g.host = r.host),
sched(host, rn, fetch_at) AS (
  SELECT host, rn, ts_s FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.host, r.rn, GREATEST(r.ts_s, s.fetch_at + r.gap_s)
  FROM ranked r JOIN sched s ON r.host = s.host AND r.rn = s.rn + 1
)
SELECT r.host, r.url, r.ts_s, r.gap_s,
       CAST(s.fetch_at AS BIGINT) AS fetch_at,
       CAST(s.fetch_at - r.ts_s AS BIGINT) AS wait_s
FROM ranked r JOIN sched s ON s.host = r.host AND s.rn = r.rn
"""
