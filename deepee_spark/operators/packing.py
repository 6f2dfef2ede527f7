"""Sequence packing — assign documents to fixed token-budget bins.

Training jobs consume documents as packed fixed-length sequences; the
packing assignment (which docs share a bin) must be deterministic so a
re-run or a task retry rebuilds identical batches. Greedy streaming
packing is inherently sequential, so the scalable form shards first:

  * docs are hash-sharded by id with the same engine-replicable
    diffused rolling hash the sampling family uses (a training shard
    is an independent unit anyway — shards pack in parallel, and at
    10^12 docs each shard's window is bounded by corpus/n_shards);
  * within a shard, docs are ordered by id and packed by exclusive
    running token total: bin = floor(cum_tokens_before / budget).

The straddle rule: a doc whose tokens cross a bin boundary belongs to
the bin its FIRST token falls in, so every bin's total is at most
budget + max_doc_tokens - 1 and no doc is split. This is the standard
contiguous approximation of first-fit (packers that split documents
make the same single-pass cumulative-sum assignment, then cut).

The per-shard window is the same two-level pattern the entry file uses
for global ranks (s4/f4): no single task ever sorts the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import MOD, str_hash
from .sampling import DIFFUSION


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tok_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 16,
) -> DataFrame:
    """(id, n_tokens, shard, bin): deterministic bin assignment.
    One shuffle (the shard partition); the sort is per-shard."""
    shard = (
        str_hash(F.col(id_col).cast("string"))
        * F.lit(DIFFUSION) % F.lit(MOD) % n_shards
    ).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    return (
        df.withColumn("shard", shard)
        .select(
            id_col,
            F.col(tok_col).cast("long").alias(tok_col),
            "shard",
            F.floor(cum_before / budget).cast("long").alias("bin"),
        )
    )
