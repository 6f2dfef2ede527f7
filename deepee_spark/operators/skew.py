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
