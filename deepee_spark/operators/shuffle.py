"""W6: deterministic epoch shuffle for training-data export.

A training run wants each epoch to visit documents in a different,
reproducible pseudo-random order. At corpus scale a GLOBAL shuffle
order is an anti-pattern (a total sort of 10^12 rows per epoch); the
scalable form — what tf.data / torchdata shard loaders consume — is
shuffled SHARDS: assign each row a pseudo-random 64-bit position
keyed by (row key, epoch seed), bucket rows into n_shards by that
position, and sort only WITHIN each shard at write time
(`.repartition("shard").sortWithinPartitions("shard", "epoch_pos")`
— the leading shard column matters: a partitioned parquet write
requires rows ordered by the partition columns per task and inserts
its own shard-only, order-destroying sort unless that requirement is
already satisfied as a prefix of ours). No global ordering ever
materializes, and a different seed reshuffles everything.

The position is the same diffused rolling hash the sampling family
uses (operators/sampling), keyed as ``key ':' seed``, so the
assignment is reproducible across runs, engines, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MOD, str_hash
from .sampling import DIFFUSION


def epoch_shuffle(df: DataFrame, key_col: str, seed: int,
                  n_shards: int) -> DataFrame:
    """Adds ``epoch_pos`` (deterministic pseudo-random position in
    [0, MOD)) and ``shard`` (epoch_pos % n_shards)."""
    key = F.concat(F.col(key_col).cast("string"),
                   F.lit(":"), F.lit(str(seed)))
    pos = (str_hash(key) * F.lit(DIFFUSION)) % F.lit(MOD)
    return df.withColumn("epoch_pos", pos.cast("long")).withColumn(
        "shard", (F.col("epoch_pos") % n_shards).cast("long")
    )
