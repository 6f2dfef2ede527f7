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


def _hyperplane(p: int, dim: int):
    """Deterministic pseudo-random hyperplane p as an expression."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: ((F.lit(p) * 73856093 + j * 19349663) % F.lit(2000) - 1000).cast(
            "double"
        )
        / 1000.0,
    )


def hyperplane_bucket(vec, dim: int, planes: int = 8):
    """-> bigint LSH bucket: bit p = sign(vec . plane_p)."""
    bucket = None
    for p in range(planes):
        bit = F.when(dot(vec, _hyperplane(p, dim), dim) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


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
