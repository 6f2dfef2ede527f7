"""TransE-style KG-embedding scoring with constructed integer embeddings.

Link prediction over the materialized KG has two classic families: the
neighborhood-overlap indices (operators/graph.resource_allocation) and
embedding-energy models — TransE (Bordes et al., NeurIPS 2013, public):
a triple (s, p, o) is plausible when e_s + e_p ≈ e_o, scored by the
energy ||e_s + e_p - e_o||_1; ranking candidate objects by energy
answers "which entity most likely completes (s, p, ?)".

Training is out of scope here (the repo's standing rule: frozen
constructed weights, same as the EE kernels — see kernels/weights.py).
Embeddings are CONSTRUCTED deterministically from the entity/relation
string via the engine-wide md5 fold: dimension i of e_x is
md5_long48(x || '|' || i) % 201 - 100, an integer in [-100, 100]. That
makes every energy an exact BIGINT — shuffle-order-independent and
bit-identical across engines, so the ranking gets a hard cross-engine
oracle — while behaving like a generic fixed embedding table for plan
purposes. Swapping in trained vectors changes only the table, not one
line of the scoring plan.

Scale: scoring candidate sets all-pairs is the oracle shape only; at
10^12 triples the candidate generation must be blocked (the ANN /
LSH-bucket ops in operators/similarity are the scale path for
embedding-space candidates), after which this scorer runs bucket-local
— exactly the pattern embedding_dup_pairs documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .negatives import md5_long48, md5_long48_sql

EMB_DIM = 8


def constructed_embedding(col, dim: int = EMB_DIM):
    """array<long> embedding of a string column: dimension i is
    md5_long48(x || '|' || i) % 201 - 100."""
    return F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: (
            md5_long48(F.concat(col.cast("string"), F.lit("|"), i.cast("string")))
            % 201
            - 100
        ).cast("long"),
    )


def transe_rank_objects(
    sp: DataFrame,
    candidates: DataFrame,
    top_k: int = 3,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Rank candidate objects for each (subj, pred) query by TransE
    L1 energy; keep the top_k lowest-energy (most plausible) per query.

    `sp` is a (subj, pred) DataFrame; `candidates` a one-column (obj)
    DataFrame. The candidate set is expected PRE-BLOCKED at scale (see
    module docstring); the join here is the bucket-local cross product.
    The per-query ranking window is (subj, pred)-partitioned — parallel
    across queries. Ties break on obj ascending (total order, mirrored
    in the oracle).

    -> (subj, pred, obj, energy, rank)."""
    from pyspark.sql import Window as W

    q = sp.select("subj", "pred").distinct().select(
        "subj",
        "pred",
        constructed_embedding(F.col("subj"), dim).alias("_es"),
        constructed_embedding(F.col("pred"), dim).alias("_ep"),
    )
    c = candidates.select(
        F.col(candidates.columns[0]).alias("obj")
    ).distinct().select(
        "obj", constructed_embedding(F.col("obj"), dim).alias("_eo")
    )
    scored = q.crossJoin(c).select(
        "subj",
        "pred",
        "obj",
        F.aggregate(
            F.zip_with(
                F.zip_with("_es", "_ep", lambda a, b: a + b),
                F.col("_eo"),
                lambda sp_, o: F.abs(sp_ - o),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("energy"),
    )
    w = W.partitionBy("subj", "pred").orderBy(
        F.col("energy").asc(), F.col("obj").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
    )


def _emb_sql(expr: str, dim: int) -> str:
    h = md5_long48_sql(f"{expr} || '|' || CAST(i AS VARCHAR)")
    return (
        f"list_transform(range(1, {dim + 1}),"
        f" i -> CAST(({h}) % 201 - 100 AS BIGINT))"
    )


def transe_oracle_sql(
    sp_sql: str, cand_sql: str, top_k: int = 3, dim: int = EMB_DIM
) -> str:
    """DuckDB twin: same constructed embeddings, same L1 energy, same
    (energy, obj) ranking. `sp_sql` yields (subj, pred); `cand_sql`
    yields (obj)."""
    return f"""
WITH q AS (
  SELECT subj, pred,
         {_emb_sql('subj', dim)} AS es,
         {_emb_sql('pred', dim)} AS ep
  FROM (SELECT DISTINCT subj, pred FROM ({sp_sql}))),
c AS (
  SELECT obj, {_emb_sql('obj', dim)} AS eo
  FROM (SELECT DISTINCT obj FROM ({cand_sql}))),
scored AS (
  SELECT q.subj, q.pred, c.obj,
         CAST(list_sum(list_transform(range(1, {dim + 1}),
              i -> abs(q.es[i] + q.ep[i] - c.eo[i]))) AS BIGINT) AS energy
  FROM q CROSS JOIN c),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY subj, pred
                 ORDER BY energy, obj) AS BIGINT) AS rank
  FROM scored)
SELECT subj, pred, obj, energy, rank FROM ranked WHERE rank <= {top_k}
"""
