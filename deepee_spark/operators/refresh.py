"""Re-crawl scheduling: per-URL change-rate estimation + refresh priority.

A crawl that fetches 10^12 pages cannot re-fetch them uniformly; the
standard policy (Cho & Garcia-Molina, "Estimating Frequency of Change",
TOIT 2003 — the estimator behind production crawler refresh queues)
estimates each page's change rate from its OWN fetch history and
prioritizes stale-and-volatile pages:

  - per URL, order its fetch observations by time; a CHANGE is a fetch
    whose content hash differs from the previous fetch's;
  - rate    = (n_changes + 1) / (observed_span_s + SMOOTH_S)
              (+1/+SMOOTH Laplace smoothing: a never-observed-changing
              page still gets a small positive rate, a single-fetch page
              a finite one);
  - staleness = t_ref - last_fetch (seconds);
  - priority  = rate * staleness, rounded to 6dp — the expected number
    of missed changes, the quantity a refresh queue sorts by.

Shape: one per-URL window (lag over (ts, obs_id) — partitioned by url,
never global) + one groupBy url. Both are url-keyed, the same key the
fetch log is naturally partitioned by; all counting is integer-exact
and the two float ops (one divide, one multiply) are identical in both
engines, so results hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

SMOOTH_S = 86_400  # one day of pseudo-observation


def refresh_priorities(
    observations: DataFrame,
    t_ref: str,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    hash_col: str = "content_hash",
    id_col: str = "obs_id",
) -> DataFrame:
    """(url, n_fetches, n_changes, rate, staleness_s, priority).

    Sub-second fetch timestamps are floored to whole seconds on both
    engines (Spark unix_timestamp floors; the DuckDB twin floors
    epoch() explicitly — a bare BIGINT cast would ROUND and disagree
    by one second on .5+ fractions).

    t_ref: ISO timestamp literal ('2026-08-01 00:00:00') — passed
    explicitly so runs are deterministic (never now())."""
    w = W.partitionBy(url_col).orderBy(ts_col, id_col)
    obs = observations.withColumn(
        "_changed",
        (
            F.lag(hash_col).over(w).isNotNull()
            & (F.col(hash_col) != F.lag(hash_col).over(w))
        ).cast("long"),
    )
    agg = obs.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).cast("long").alias("n_fetches"),
        F.sum("_changed").cast("long").alias("n_changes"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("span_s"),
        (
            F.unix_timestamp(F.lit(t_ref).cast("timestamp"))
            - F.unix_timestamp(F.max(ts_col))
        ).alias("staleness_s"),
    )
    rate = (F.col("n_changes") + 1).cast("double") / (
        F.col("span_s") + SMOOTH_S
    ).cast("double")
    return agg.select(
        "url",
        "n_fetches",
        "n_changes",
        F.round(rate, 9).alias("rate"),
        "staleness_s",
        F.round(rate * F.col("staleness_s").cast("double"), 6).alias(
            "priority"
        ),
    )


def refresh_priorities_oracle_sql(observations_sql: str, t_ref: str) -> str:
    """DuckDB twin: identical lag/count/smoothing math.
    observations_sql -> (url, fetch_ts, content_hash, obs_id)."""
    return f"""
WITH obs AS (
  SELECT *, CASE WHEN lag(content_hash) OVER w IS NOT NULL
                  AND content_hash <> lag(content_hash) OVER w
            THEN 1 ELSE 0 END AS changed
  FROM ({observations_sql})
  WINDOW w AS (PARTITION BY url ORDER BY fetch_ts, obs_id)
),
agg AS (
  SELECT url,
         CAST(COUNT(*) AS BIGINT) AS n_fetches,
         CAST(SUM(changed) AS BIGINT) AS n_changes,
         CAST(floor(epoch(MAX(fetch_ts))) - floor(epoch(MIN(fetch_ts))) AS BIGINT) AS span_s,
         CAST(floor(epoch(TIMESTAMP '{t_ref}')) - floor(epoch(MAX(fetch_ts))) AS BIGINT) AS staleness_s
  FROM obs GROUP BY url
)
SELECT url, n_fetches, n_changes,
       round(CAST(n_changes + 1 AS DOUBLE) / CAST(span_s + {SMOOTH_S} AS DOUBLE), 9) AS rate,
       staleness_s,
       round(CAST(n_changes + 1 AS DOUBLE) / CAST(span_s + {SMOOTH_S} AS DOUBLE)
             * CAST(staleness_s AS DOUBLE), 6) AS priority
FROM agg
"""
