"""Skew handling: salted join (SURVEY.md §4.2).

Head entities ('washington', 'smith' own ~30% of mentions in the synthetic
corpus; country names at web scale) make shuffle joins on entity keys
lopsided. AQE skew-join splitting is on as the backstop (session.py);
``salted_join`` is the explicit tool for joins we *know* are skewed:

  fact side:  salt = pmod(xxhash64(<unique col>), k)
  dim side:   exploded k ways
  join on (key, salt) -> uniform partitions; k ~ max-key-rows / target.

Only correct for many-to-one joins (dim side unique per key), which is
exactly the linking/canonicalization shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: str,
    k: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on ``key`` with k-way salting.

    ``salt_on``: any fact column with high cardinality (row identity) used
    to derive a uniform salt. Dim rows are replicated k times — keep dim
    small relative to fact (it is: alias dictionaries, entity tables).
    """
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_on)), F.lit(k)))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    out = f.join(d, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def hot_key_report(
    df, key_cols: list[str], top_k: int = 10
):
    """Skew diagnosis: the top_k hottest key values with exact counts
    and corpus share — the report you run BEFORE choosing salting
    factors or AQE skew thresholds (operators/skew.salted_join's
    inputs come from here).

    -> (key..., n_rows, share_e6, rank), rank by (count desc, keys
    asc) — a total order, so the cut at top_k is deterministic.
    One partial-agged shuffle on the key; the global total rides in as
    a broadcast scalar; the rank window sees only the aggregated key
    space. share_e6 is an exact integer fraction.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    counts = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    order = [F.col("n_rows").desc()] + [F.col(c).asc() for c in key_cols]
    # orderBy + limit compiles to TakeOrderedAndProject: per-partition
    # top-k heaps merged at the driver — NOT a global sort, so this
    # survives a billion-key aggregate where a rank window (single
    # partition over the whole key space) would not. The rank column
    # is assigned afterwards on the k-row result.
    top = counts.orderBy(*order).limit(top_k)
    w = W.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_rows",
            F.expr("1000000 * n_rows DIV _total").cast("long").alias(
                "share_e6"
            ),
            "rank",
        )
    )


def plan_salt_k(
    df: DataFrame,
    key_cols: list[str],
    target_rows_per_task: int = 1_000_000,
    max_k: int = 1024,
) -> int:
    """Choose the salting factor from measured skew: k = ceil(max key
    group / target_rows_per_task), clamped to [1, max_k].

    The missing half of salted_join's contract — its docstring says
    "k ~ max-key-rows / target" and this computes exactly that from
    hot_key_report's top-1 row (one partial-agged shuffle + a 1-row
    collect; run once per job, driver-side, like dedup.lsh_plan).
    k == 1 means the join is not skewed enough to salt — callers can
    skip the salt entirely and save the dim-side explode."""
    if target_rows_per_task < 1:
        raise ValueError("target_rows_per_task must be >= 1")
    top = hot_key_report(df, key_cols, top_k=1).collect()
    if not top:
        return 1
    hottest = int(top[0]["n_rows"])
    k = -(-hottest // target_rows_per_task)  # ceil
    return max(1, min(k, max_k))
