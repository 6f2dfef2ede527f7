"""Similarity search over embedding columns (array<float>).

  brute_force_topk   exact cosine top-k: queries x corpus cross join with a
                     per-query window. Baseline path; at scale the corpus
                     side is the big relation and queries broadcast.
  lsh_bucket_topk    scale path: random-hyperplane LSH buckets both sides;
                     candidates meet only within a bucket (and its
                     1-bit-flip neighbors for recall), then exact cosine
                     top-k. Hyperplanes are deterministic arithmetic, no
                     stored model.

Dot products are ordered left-folds over double-cast elements, so results
are bit-deterministic across partitionings (and match the DuckDB oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(x, y, dim: int):
    prods = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.element_at(x, i).cast("double")
        * F.element_at(y, i).cast("double"),
    )
    return F.aggregate(prods, F.lit(0.0), lambda a, v: a + v)


def cosine(x, y, dim: int):
    return dot(x, y, dim) / (F.sqrt(dot(x, x, dim)) * F.sqrt(dot(y, y, dim)))


def hyperplane_plane(p: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane p (matches the SQL twin:
    plane[p][j] = ((p*73856093 + j*19349663) % 2000 - 1000)/1000, j=1..dim)."""
    return [
        ((p * 73856093 + j * 19349663) % 2000 - 1000) / 1000.0
        for j in range(1, dim + 1)
    ]


def hyperplane_bucket(vec, dim: int, planes: int = 8):
    """-> bigint LSH bucket: bit p = sign(vec . plane_p).

    One float64 gemm per Arrow batch (n x dim @ dim x planes) instead of
    `planes` interpreted Catalyst folds per row — the fold version cost
    ~4ms/row at dim=64/planes=8, which dominated every LSH consumer."""
    from pyspark.sql.functions import pandas_udf

    P = np.array(
        [hyperplane_plane(p, dim) for p in range(planes)], dtype=np.float64
    ).T  # dim x planes
    weights = (1 << np.arange(planes)).astype(np.int64)

    @pandas_udf("long")
    def _bucket(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        A = np.stack(s.to_numpy()).astype(np.float64)
        return pd.Series(((A @ P > 0).astype(np.int64) @ weights))

    return _bucket(vec)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
) -> DataFrame:
    """-> (q_id, rank, c_id, cosine); broadcast the (small) query side."""
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        "q_id",
        "c_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec"), dim), 6).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "cosine")
    )


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    and its single-bit-flip neighbor buckets (multi-probe)."""
    bucket = hyperplane_bucket(F.col(vec_col), dim, planes)
    c = corpus.select(
        F.col(id_col).alias("c_id"),
        F.col(vec_col).alias("c_vec"),
        bucket.alias("bucket"),
    )
    probes = F.array(
        F.col("q_bucket"),
        *[
            F.col("q_bucket").bitwiseXOR(F.lit(1 << p)).cast("long")
            for p in range(planes)
        ],
    )
    q = (
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            bucket.alias("q_bucket"),
        )
        .withColumn("bucket", F.explode(probes))
        .drop("q_bucket")
    )
    pairs = c.join(F.broadcast(q), "bucket").filter(F.col("q_id") != F.col("c_id"))
    scored = pairs.select(
        "q_id",
        "c_id",
        F.round(cosine(F.col("q_vec"), F.col("c_vec"), dim), 6).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "c_id", "cosine")
    )
