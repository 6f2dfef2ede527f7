"""Exact distributed quantiles by iterative histogram refinement.

approx_percentile is engine-specific (its GK/KLL sketch differs by
implementation), so it can never carry a cross-engine oracle; the
EXACT rank statistic can. The classic distributed exact algorithm
avoids a global sort: histogram the values into B range buckets (one
partial-agged shuffle of B rows), walk the cumulative counts to find
the bucket holding the target rank, recurse INTO that bucket, and only
when the candidate set is tiny (<= n/B^rounds expected) rank it with a
window. Each refinement round is one cheap aggregate over a
geometrically shrinking subset; nothing ever globally sorts, and the
only full-data passes are the filters, which scan in place.

Rank semantics (shared with the SQL twin by construction, NOT via
quantile_disc, whose interpolation convention varies): the q-permille
quantile of n values is the value at 1-based ascending rank
max(ceil(q * n / 1000), 1) — duplicate values land on deterministic
ranks because the final window breaks ties arbitrarily BUT equal
values make any tie choice return the same value.

Degenerate buckets (all remaining values equal) terminate early: the
range collapses and the answer is that value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

N_BUCKETS = 256


def exact_quantile(
    df: DataFrame,
    value_col: str,
    q_permille: int,
    rounds: int = 2,
) -> int | None:
    """The exact q-permille quantile of a BIGINT column (None on an
    empty input). Driver-side loop of `rounds` histogram refinements,
    each ONE aggregate job over a shrinking filter; final exact rank
    via a window over the surviving (tiny) candidate set.
    """
    if not 0 < q_permille <= 1000:
        raise ValueError("q_permille must be in (0, 1000]")
    v = F.col(value_col)
    stats = df.agg(
        F.count(v).alias("n"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
    ).collect()[0]
    n, lo, hi = stats.n, stats.lo, stats.hi
    if n == 0:
        return None
    rank = max(-(-q_permille * n // 1000), 1)  # ceil, 1-based
    cur = df.select(v.alias("_v"))
    for _ in range(rounds):
        if lo == hi:
            return lo
        width = hi - lo + 1
        # EXACT integer bucketing (float division would misbucket near
        # boundaries once values approach 2^53/B): bucket b holds
        # values with b <= (v - lo) * B / width < b + 1, i.e. the value
        # range [lo + ceil(b*width/B), lo + ceil((b+1)*width/B) - 1].
        bucket = F.expr(
            f"((_v - {lo}L) * {N_BUCKETS}) div {width}L"
        )
        hist = (
            cur.groupBy(bucket.cast("long").alias("_b"))
            .agg(F.count(F.lit(1)).alias("_c"))
            .orderBy("_b")
            .collect()
        )
        cum = 0
        for row in hist:
            if cum + row._c >= rank:
                b = row._b
                rank -= cum
                lo2 = lo + -(-(b * width) // N_BUCKETS)
                hi2 = lo + -(-((b + 1) * width) // N_BUCKETS) - 1
                break
            cum += row._c
        cur = cur.filter(
            (F.col("_v") >= F.lit(lo2)) & (F.col("_v") <= F.lit(hi2))
        )
        lo, hi = lo2, hi2
    ranked = cur.withColumn(
        "_r", F.row_number().over(W.orderBy("_v"))
    ).filter(F.col("_r") == rank)
    return ranked.collect()[0]._v


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs_permille: list[int],
    rounds: int = 2,
) -> DataFrame:
    """-> (q_permille, value): exact quantiles at each requested
    permille point, as a DataFrame for oracle comparison. Each point
    runs an independent refinement (they share the cached input scan;
    a production variant would batch the histogram passes)."""
    spark = df.sparkSession
    rows = [
        (q, exact_quantile(df, value_col, q, rounds))
        for q in qs_permille
    ]
    return spark.createDataFrame(
        rows, "q_permille: long, value: long"
    )
