"""Deterministic negative sampling for KG-embedding training prep.

TransE-family embedding trainers consume each positive (subj, pred,
obj) alongside k corrupted triples whose object is swapped for a random
entity, minus corruptions that are themselves true facts ("filtered"
setting — the standard eval protocol from the public TransE/Bordes et
al. line of work). At 10^12 triples the sampler must be deterministic
(a retried task MUST regenerate the same negatives) and
engine-checkable, so randomness is replaced by a content hash:

    pick_i(triple) = entity[ (md5_48(subj|pred|obj) + i*STEP)
                             % n_entities ]

HASH CHOICE — deliberately NOT the engine-wide rolling fold
(operators/dedup.str_hash): this operator's plan composes FOUR hash
sites (entity bucketing, triple base, an equi-join between them, and
an anti-join behind it), and on pyspark 4.1.2 that composition
reproducibly mis-evaluates when the hash is a higher-order-function
expression — two plans with IDENTICAL optimized logical trees (only
lambda-variable ids differ) returned DIFFERENT results, one of them
wrong, stable across reruns. The brute-force pytest oracle caught it.
md5 with an unrolled hex parse has no lambda variables anywhere, both
engines compute it byte-identically, and its avalanche removes the
need for the diffusion step.

Scale shape: the entity index is built ONCE with the two-level prefix
pattern (per-bucket row_number + broadcast bucket offsets — the
s4_conll_scan pattern, no global window); candidate generation is a
narrow explode of k rows per triple; the entity lookup joins on the
picked index (uniform by construction); the filter against true facts
is one left-anti join on the triple key. No stage sees more than
k x triples rows, and nothing funnels through a single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# index-advance step per negative: any odd constant works; sharing it
# with the SQL twin is what matters.
STEP = 1_000_003
N_INDEX_BUCKETS = 64
_HEX = "0123456789abcdef"


def md5_long48(col: Column) -> Column:
    """First 12 hex chars of md5 as a BIGINT (48 bits), zero
    higher-order functions, byte-identical in any engine with md5.

    conv(hex, 16, 10) IS the unrolled left fold acc*16 + digit (the
    SQL twin below keeps the explicit fold — DuckDB oracle cost is
    irrelevant). The earlier unrolled instr parse here referenced the
    md5 sub-expression 12 times, and projection collapse re-inlined
    it into 12 md5 computations per row — measured as the dominant
    cost of the walk queries' per-step picks."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 12), 16, 10
    ).cast("long")


def md5_long48_sql(expr: str) -> str:
    """DuckDB twin of md5_long48 over an SQL string expression."""
    acc = "CAST(0 AS BIGINT)"
    for i in range(1, 13):
        digit = (
            f"(strpos('{_HEX}', substring(md5({expr}), {i}, 1)) - 1)"
        )
        acc = f"(({acc}) * 16 + {digit})"
    return acc


def entity_index(entities: DataFrame, entity_col: str = "entity") -> DataFrame:
    """-> (entity, idx) with idx a contiguous 0-based index.

    Two-level global ordering WITHOUT a global window: entities are
    bucketed by a hash, row_number'd within each bucket (parallel), and
    offset by broadcast per-bucket prefix counts. The resulting order
    is (bucket, entity) — deterministic and exactly replicable in SQL,
    which is all an index needs (it is NOT alphabetical, by design:
    alphabetical would need a global sort)."""
    ents = entities.select(F.col(entity_col).alias("entity")).distinct()
    bucket = (md5_long48(F.col("entity")) % N_INDEX_BUCKETS).cast("long")
    b = ents.withColumn("_b", bucket)
    inner = F.row_number().over(
        W.partitionBy("_b").orderBy("entity")
    ).cast("long")
    counts = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    prefix = counts.select(
        "_b",
        F.coalesce(
            F.sum("_n").over(
                W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("_off"),
    )
    return (
        b.withColumn("_rn", inner)
        .join(F.broadcast(prefix), "_b")
        .select(
            "entity", (F.col("_off") + F.col("_rn") - 1).alias("idx")
        )
    )


def negative_samples(
    triples: DataFrame,
    entities: DataFrame,
    k: int = 2,
    entity_col: str = "entity",
) -> DataFrame:
    """-> (subj, pred, obj, neg_i, obj_neg): k deterministic filtered
    object-corruptions per positive triple.

    Corruptions equal to the original object or to ANY true fact with
    the same (subj, pred) are removed (filtered setting), so some
    triples yield fewer than k rows — the trainer's standard contract.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    idx = entity_index(entities, entity_col)
    n_ents = idx.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("_n_ents")
    )
    base = md5_long48(
        F.concat_ws("", F.col("subj"), F.col("pred"), F.col("obj"))
    )
    cand = (
        triples.select("subj", "pred", "obj")
        .withColumn("_h", base)
        .crossJoin(F.broadcast(n_ents))
        .select(
            "subj",
            "pred",
            "obj",
            "_h",
            "_n_ents",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"), F.lit(k - 1).cast("long")
                )
            ).alias("neg_i"),
        )
        .select(
            "subj",
            "pred",
            "obj",
            "neg_i",
            (
                (F.col("_h") + F.col("neg_i") * F.lit(STEP))
                % F.col("_n_ents")
            ).alias("pick"),
        )
    )
    picked = cand.join(
        idx.select(F.col("idx").alias("pick"), F.col("entity").alias("obj_neg")),
        "pick",
    ).drop("pick")
    positives = triples.select(
        F.col("subj"), F.col("pred"), F.col("obj").alias("obj_neg")
    ).distinct()
    return picked.filter(F.col("obj_neg") != F.col("obj")).join(
        positives, ["subj", "pred", "obj_neg"], "left_anti"
    ).select("subj", "pred", "obj", "neg_i", "obj_neg")
