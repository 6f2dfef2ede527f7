"""DSIR-style importance weighting for domain-targeted data selection.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public): score every raw document by how much more likely its hashed
n-gram features are under a small TARGET corpus's feature distribution
than under the RAW corpus's, then resample by that weight. The engine
realizes the estimator's three stages as first-class distributed ops:

  1. hashed_feature_counts — unigram+bigram features hashed into B
     buckets (md5_long48 % B, the engine's portable hash), counted per
     document. Narrow: explode + local agg; nothing corpus-wide.
  2. bucket_logratio — the bucket-level bag-of-ngrams model:
     log((cnt_target[b]+1)/(total_target+B)) - log((cnt_raw[b]+1)/
     (total_raw+B)), add-1 smoothed so unseen buckets stay finite.
     Output is B rows — a broadcast dimension at any corpus size.
  3. importance_weights — per-document log weight: sum over the doc's
     buckets of cnt_doc[b] * logratio[b]. One broadcast join + one
     groupBy(doc): the corpus shuffles once, on doc_id, with map-side
     partials.

Determinism across engines: the bucket hash is exact integer md5
arithmetic; the smoothed ratio fed to ln() is a quotient of exact
integers, so both engines compute ln on bit-identical doubles; the
final sum is rounded to 6dp (the repo's float-oracle convention, same
as textstats.unigram_logprob — driver-green precedent).

Selection itself is gumbel_topk below — the paper's Gumbel-top-k
resampling with hash-derived (hence reproducible, engine-exact)
Gumbel noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .negatives import md5_long48, md5_long48_sql
from .textstats import tokens_of

N_BUCKETS = 256


def hashed_feature_counts(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """(doc_id, bucket, cnt): unigram + adjacent-bigram features hashed
    into `buckets` via md5_long48 — DSIR's hashed bag-of-ngrams."""
    toks = df.select(
        doc_col, tokens_of(F.col(text_col)).alias("_toks")
    )
    uni = toks.select(
        doc_col, F.explode("_toks").alias("feat")
    )
    bi = toks.select(
        doc_col,
        F.explode(
            F.when(
                F.size("_toks") > 1,
                F.zip_with(
                    F.slice("_toks", 1, F.size("_toks") - 1),
                    F.slice("_toks", 2, F.size("_toks") - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("feat"),
    )
    return (
        uni.unionByName(bi)
        .select(doc_col, (md5_long48(F.col("feat")) % buckets).alias("bucket"))
        .groupBy(doc_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def bucket_logratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """(bucket, logr): add-1-smoothed log p_target(b) - log p_raw(b).
    Inputs are (doc, bucket, cnt) feature tables; totals are scalar
    aggregates broadcast back. B rows out — a broadcast dim."""
    t = target_counts.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("ct")
    )
    r = raw_counts.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("cr")
    )
    tt = t.agg(F.sum("ct").cast("long").alias("tott"))
    tr = r.agg(F.sum("cr").cast("long").alias("totr"))
    all_b = raw_counts.sparkSession.range(buckets).select(
        F.col("id").alias("bucket")
    )
    return (
        all_b.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "bucket",
            F.log(
                (
                    (F.coalesce("ct", F.lit(0)) + 1)
                    * (F.col("totr") + buckets)
                ).cast("double")
                / (
                    (F.coalesce("cr", F.lit(0)) + 1)
                    * (F.col("tott") + buckets)
                ).cast("double")
            ).alias("logr"),
        )
    )


def importance_weights(
    doc_counts: DataFrame, logratio: DataFrame, doc_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_feats, logw): per-document DSIR log importance weight
    = sum of cnt * logr over the doc's feature buckets. The logratio
    side is B rows — broadcast; one corpus shuffle on doc_id."""
    return (
        doc_counts.join(F.broadcast(logratio), "bucket")
        .groupBy(doc_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.round(F.sum(F.col("cnt") * F.col("logr")), 6).alias("logw"),
        )
    )


def dsir_oracle_sql(
    table: str,
    target_pred: str,
    tokens_sql: str,
    doc_col: str = "doc_id",
    buckets: int = N_BUCKETS,
) -> str:
    """DuckDB twin: same md5 bucketing, same smoothing, same formula.
    `target_pred` is a boolean SQL predicate over `table` defining the
    target slice; `tokens_sql` the engine-shared tokenizer expression."""
    h = md5_long48_sql("feat")
    return f"""
WITH toks AS (
  SELECT {doc_col}, {tokens_sql} AS ts FROM {table}),
uni AS (SELECT {doc_col}, unnest(ts) AS feat FROM toks),
bi AS (
  SELECT {doc_col}, ts[i] || ' ' || ts[i+1] AS feat
  FROM toks, unnest(range(1, greatest(len(ts), 1))) AS t(i)),
feats AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
dc AS (
  SELECT {doc_col}, ({h}) % {buckets} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM feats GROUP BY 1, 2),
tdocs AS (SELECT {doc_col} FROM {table} WHERE {target_pred}),
t AS (SELECT bucket, SUM(cnt) AS ct FROM dc
      WHERE {doc_col} IN (SELECT {doc_col} FROM tdocs) GROUP BY bucket),
r AS (SELECT bucket, SUM(cnt) AS cr FROM dc GROUP BY bucket),
tt AS (SELECT COALESCE(SUM(ct), 0) AS tott FROM t),
tr AS (SELECT COALESCE(SUM(cr), 0) AS totr FROM r),
lr AS (
  SELECT b.bucket,
         ln(CAST((COALESCE(t.ct, 0) + 1) * (tr.totr + {buckets}) AS DOUBLE)
            / CAST((COALESCE(r.cr, 0) + 1) * (tt.tott + {buckets}) AS DOUBLE))
           AS logr
  FROM (SELECT unnest(range(0, {buckets})) AS bucket) b
  LEFT JOIN t ON t.bucket = b.bucket
  LEFT JOIN r ON r.bucket = b.bucket, tt, tr)
SELECT dc.{doc_col}, CAST(SUM(dc.cnt) AS BIGINT) AS n_feats,
       ROUND(SUM(dc.cnt * lr.logr), 6) AS logw
FROM dc JOIN lr ON lr.bucket = dc.bucket
GROUP BY dc.{doc_col}
"""


def gumbel_topk(
    weights: DataFrame,
    k: int,
    doc_col: str = "doc_id",
    logw_col: str = "logw",
) -> DataFrame:
    """The paper's actual selection step: Gumbel-top-k resampling.
    Adding independent Gumbel noise g = -ln(-ln(u)) to each log weight
    and taking the top-k is EXACTLY sampling k docs without replacement
    with probability proportional to exp(logw) (the Gumbel-max trick —
    standard public result). Here u is a deterministic hash of the doc
    id, so the "random" draw is reproducible and engine-exact: both
    engines build u as the same exact-integer ratio, hence feed ln()
    bit-identical doubles.

    Scale: orderBy + limit compiles to TakeOrderedAndProject —
    per-partition k-heaps merged at the driver, never a global sort
    (same rationale as operators/skew.py's top-k).

    Returns (doc_col, sel_key) for the k selected docs, sel_key
    rounded to 6dp."""
    u = (
        (
            md5_long48(F.concat(F.col(doc_col).cast("string"), F.lit("|g")))
            % 1_000_000
            + 1
        ).cast("double")
        / 1_000_001.0
    )
    key = F.col(logw_col) - F.log(-F.log(u))
    return (
        weights.withColumn("_key", key)
        .orderBy(F.desc("_key"), F.asc(doc_col))
        .limit(k)
        .select(doc_col, F.round("_key", 6).alias("sel_key"))
    )


def gumbel_topk_oracle_sql(
    weights_sql: str, k: int, doc_col: str = "doc_id"
) -> str:
    """DuckDB twin of gumbel_topk over a (doc, logw) subquery."""
    h = md5_long48_sql(f"CAST({doc_col} AS VARCHAR) || '|g'")
    return f"""
SELECT {doc_col},
       ROUND(logw - ln(-ln((({h}) % 1000000 + 1) / 1000001.0)), 6)
         AS sel_key
FROM ({weights_sql})
ORDER BY logw - ln(-ln((({h}) % 1000000 + 1) / 1000001.0)) DESC,
         {doc_col}
LIMIT {k}
"""
