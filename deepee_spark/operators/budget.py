"""Water-filling crawl-budget allocation across hosts.

A crawl (or a re-fetch / refresh cycle) has a global page budget B and
a per-host demand d_h (URLs known for that host). Proportional-fair
("water-filling") allocation caps every host at a common level L:

    a_h = min(d_h, L)   with   sum_h a_h = B   (when total demand > B)

— small hosts are fully served, head hosts are clamped, and no host is
starved by a heavy tail. This is the standard max-min fair allocation;
the reference repo has no crawl side (it consumes collected corpora),
so this is pipeline-native web-scale machinery.

Exact closed-form via sort + prefix sums (no iteration): sort hosts by
demand ascending; with P_i = sum of demands before row i (1-based rank
i over n hosts), the candidate level at row i is

    L_i = (B - P_i) / (n - i + 1)

and the true level is L = L_p for the FIRST row p where L_p < d_p
(rows before the pivot are fully servable). If no row qualifies,
total <= B and everyone gets d_h.

Scale shape: this runs over the HOST table (orders of magnitude
smaller than the URL table), but even there no global single-task
window is used — rank and prefix sum are two-level: per-bucket window
(bucket = a monotonic band of the demand sort key, so buckets are
contiguous runs of the global order) plus a tiny bucket-offset window
over ~64 band rows. The pivot is found with an aggregation, and L is
broadcast back as a 1-row cross join. All integer arithmetic until the
single division, so both engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def water_fill(
    demands: DataFrame,
    budget_num: int = 3,
    budget_den: int = 5,
    host_col: str = "host",
    demand_col: str = "demand",
) -> DataFrame:
    """(host, demand, allocation): max-min fair allocation with global
    budget B = floor(total_demand * budget_num / budget_den)."""
    d = demands.select(
        F.col(host_col).alias("host"), F.col(demand_col).cast("long").alias("demand")
    )
    # monotonic demand band -> contiguous run of the (demand, host) order
    d = d.withColumn(
        "bucket", F.floor(F.log2(F.col("demand").cast("double") + F.lit(1.0)))
    )
    inner = W.partitionBy("bucket").orderBy("demand", "host")
    d = d.withColumn("i_rank", F.row_number().over(inner)).withColumn(
        "i_prefix",
        F.coalesce(
            F.sum("demand").over(inner.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    btot = d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("b_n"), F.sum("demand").alias("b_sum")
    )
    off = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    btot = btot.select(
        "bucket",
        F.coalesce(F.sum("b_n").over(off), F.lit(0)).alias("rank_off"),
        F.coalesce(F.sum("b_sum").over(off), F.lit(0)).alias("prefix_off"),
    )
    ranked = d.join(F.broadcast(btot), "bucket").select(
        "host",
        "demand",
        (F.col("rank_off") + F.col("i_rank")).cast("long").alias("i"),
        (F.col("prefix_off") + F.col("i_prefix")).cast("long").alias("p"),
    )
    glob = demands.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.floor(
            F.sum(F.col(demand_col).cast("long")) * budget_num / budget_den
        )
        .cast("long")
        .alias("b"),
    )
    cand = ranked.crossJoin(F.broadcast(glob)).withColumn(
        "level",
        (F.col("b") - F.col("p")).cast("double")
        / (F.col("n") - F.col("i") + 1).cast("double"),
    )
    # pivot = first row (min i) whose candidate level undercuts its own
    # demand; no pivot -> total <= B -> level = +inf (nobody clamped)
    pivot = cand.filter(F.col("level") < F.col("demand")).agg(
        F.min_by("level", "i").alias("level")
    )
    return (
        ranked.crossJoin(F.broadcast(pivot))
        .select(
            "host",
            "demand",
            F.round(
                F.least(
                    F.col("demand").cast("double"),
                    F.coalesce(F.col("level"), F.lit(float("inf"))),
                ),
                6,
            ).alias("allocation"),
        )
    )


def water_fill_oracle_sql(
    demands_sql: str, budget_num: int = 3, budget_den: int = 5
) -> str:
    """DuckDB twin — plain global windows (the oracle runs at test
    scale), identical integer prefix math and single division."""
    return f"""
WITH d AS (
  SELECT host, CAST(demand AS BIGINT) AS demand FROM ({demands_sql})
),
ranked AS (
  SELECT host, demand,
         CAST(ROW_NUMBER() OVER (ORDER BY demand, host) AS BIGINT) AS i,
         CAST(coalesce(SUM(demand) OVER (
             ORDER BY demand, host ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS p
  FROM d
),
g_tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(floor(SUM(demand) * {budget_num} / {budget_den}) AS BIGINT) AS b
  FROM d
),
cand AS (
  SELECT r.*, CAST(g.b - r.p AS DOUBLE) / CAST(g.n - r.i + 1 AS DOUBLE) AS level
  FROM ranked r, g_tot g
),
piv AS (
  SELECT min_by(level, i) AS level FROM cand WHERE level < demand
)
SELECT r.host, r.demand,
       round(least(CAST(r.demand AS DOUBLE),
                   coalesce(p.level, CAST('inf' AS DOUBLE))), 6) AS allocation
FROM ranked r, piv p
"""
