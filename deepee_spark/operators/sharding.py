"""Rendezvous (highest-random-weight) shard assignment.

Serving-side placement for a 10^12-document corpus: retrieval indexes,
dedup state, and crawl frontiers are all sharded, and the placement
function decides how much data moves when the shard count changes.
Hash-mod placement remaps ~(K-1)/K of all keys when K -> K+1;
rendezvous hashing (Thaler & Ravishankar, 1998 — the scheme behind
consistent routing in memcached/Ceph-style systems) remaps exactly the
keys whose new shard wins, ~1/(K+1) — the theoretical minimum for
balanced placement. assign(key) = argmax over shards of h(key, shard).

Hash: a quadratic mixer over the 31-bit ring,

    x  = (key * P1 + shard * P2 + C) mod M
    h  = (x^2 * A + x + B) mod M    (M = 2^31 - 1, all constants < M)

(the x^2 term breaks the affine key<->shard correlation a pure Lehmer
step leaves behind — with linear-only mixing, sequential keys visibly
favored one shard at 1.5x fair share), chosen so every intermediate
product stays under 2^62 — no int64 overflow, hence
bit-identical in Spark (ANSI mode) and DuckDB with plain arithmetic:
no engine-specific hash builtin is involved, which is what makes the
assignment exactly reproducible across engines, partitionings, and
releases (a placement function that changes between releases IS a full
remap).

Plan shape: shards are a tiny literal array; the argmax is a per-row
`aggregate` fold over that array — zero joins, zero shuffles, linear
scan. Ties broken toward the smaller shard id (deterministic; with M
prime and distinct per-shard offsets, ties are ~2^-31 rare anyway).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = (1 << 31) - 1  # Mersenne prime 2^31-1
P1 = 1_103_515_245
P2 = 747_796_405
A = 69_069
B = 362_437
C = 12_345


def _weight(key: Column, shard: Column) -> Column:
    """h(key, shard) on the 31-bit ring; overflow-free in int64."""
    x = (
        F.pmod(key, F.lit(M)) * F.lit(P1) + shard * F.lit(P2) + F.lit(C)
    ) % M
    return ((x * x) % M * F.lit(A) + x + F.lit(B)) % M


def assign_shards(
    df: DataFrame, n_shards: int, key_col: str = "doc_id"
) -> DataFrame:
    """Adds (shard, weight): rendezvous winner over shards 0..n-1."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    key = F.col(key_col).cast("long")
    # materialize each shard's weight ONCE via transform, then fold a
    # pure max over the structs — Catalyst does not common-subexpression
    # -eliminate inside lambda bodies, so putting _weight in both the
    # comparison and the kept struct would run the mixer twice per shard
    # on the per-row hot path. Strict > keeps the FIRST maximum, so ties
    # still resolve toward the smaller shard id (transform preserves
    # sequence order).
    best = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda s: F.struct(
                _weight(key, s.cast("long")).alias("w"), s.alias("s")
            ),
        ),
        F.struct(
            F.lit(-1).cast("long").alias("w"), F.lit(-1).cast("int").alias("s")
        ),
        lambda acc, x: F.when(x["w"] > acc["w"], x).otherwise(acc),
    )
    return df.withColumn("shard", best["s"]).withColumn(
        "weight", best["w"]
    )


def assign_shards_oracle_sql(
    source_sql: str, n_shards: int, key_col: str = "doc_id"
) -> str:
    """DuckDB twin: same mixer; the rank window orders (weight DESC,
    shard ASC) — ties toward the smaller shard id, matching the fold's
    strict >."""
    return f"""
WITH src AS (SELECT * FROM ({source_sql})),
mixed AS (
  SELECT src.*, CAST(s.shard AS INTEGER) AS shard,
         ((({key_col} % {M} + {M}) % {M}) * {P1} + s.shard * {P2} + {C}) % {M} AS x
  FROM src, (SELECT unnest(range(0, {n_shards})) AS shard) s
),
w AS (
  SELECT * EXCLUDE (x), (x * x % {M} * {A} + x + {B}) % {M} AS weight
  FROM mixed
)
SELECT * EXCLUDE (rn) FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY {key_col} ORDER BY weight DESC, shard ASC) AS rn
  FROM w
) WHERE rn = 1
"""
