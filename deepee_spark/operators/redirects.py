"""Redirect-chain resolution via pointer doubling.

A crawl sees HTTP redirects as a functional graph: each source URL has
at most one redirect target; chains (301 -> 301 -> 200) must be
collapsed to their final landing page before fetch dedup, link-graph
construction, or canonical-URL assignment, and redirect LOOPS must be
flagged as dead. The reference repo consumes resolved corpora; this is
the upstream collapse a web-scale crawl needs.

Algorithm: pointer doubling (a.k.a. path shortcutting) — the classic
O(log chain) distributed primitive. State per source: (ptr, dist).
Each round self-joins the state with itself: ptr <- state[ptr].ptr,
dist <- dist + state[ptr].dist, so after k rounds every pointer has
advanced 2^k hops (or landed on a terminal). Rounds are a fixed
`doublings` count, giving a SINGLE declarative plan with no per-round
driver action: 2^doublings bounds the resolvable chain length (HTTP
clients cap redirect chains at ~20, so the default 6 -> 64 hops is
generous). Sources still pointing at a redirecting node after the last
round are loops (or over-bound chains — documented trade) and are
emitted with NULL final/hops and is_cycle = true.

Scale: each round is one equi-join shuffle on the pointer key; the
graph is functional so fan-out is exactly 1 and the state never grows.
Contrast with operators/components.py (star contraction for CC) —
this is the other canonical log-step graph primitive.

DuckDB oracle: a recursive CTE walks one hop at a time with a hop cap;
per source the final row is max_by(node, hops), a loop = hitting the
cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    edges: DataFrame,
    doublings: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(src, final, hops, is_cycle): collapse each redirect chain to
    its landing node. edges must be functional (<=1 out-edge per src);
    chains longer than 2**doublings are reported as cycles."""
    state = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("ptr"),
        F.lit(1).cast("long").alias("dist"),
    )
    for _ in range(doublings):
        hop = state.select(
            F.col("src").alias("j_src"),
            F.col("ptr").alias("j_ptr"),
            F.col("dist").alias("j_dist"),
        )
        state = (
            state.join(hop, state["ptr"] == hop["j_src"], "left")
            .select(
                "src",
                F.coalesce("j_ptr", "ptr").alias("ptr"),
                (F.col("dist") + F.coalesce("j_dist", F.lit(0))).alias("dist"),
            )
        )
    srcs = edges.select(F.col(src_col).alias("ptr")).distinct().withColumn(
        "redirects", F.lit(True)
    )
    return state.join(srcs, "ptr", "left").select(
        "src",
        F.when(F.col("redirects").isNull(), F.col("ptr")).alias("final"),
        F.when(F.col("redirects").isNull(), F.col("dist")).alias("hops"),
        F.col("redirects").isNotNull().alias("is_cycle"),
    )


def resolve_redirects_oracle_sql(edges_sql: str, hop_cap: int = 100) -> str:
    """DuckDB twin: recursive one-hop walk with a cap; loop = a walk
    that reaches the cap."""
    return f"""
WITH RECURSIVE e AS (
  SELECT src, dst FROM ({edges_sql})
),
walk AS (
  SELECT src, dst AS cur, CAST(1 AS BIGINT) AS hops FROM e
  UNION ALL
  SELECT w.src, n.dst, w.hops + 1
  FROM walk w JOIN e n ON w.cur = n.src
  WHERE w.hops < {hop_cap}
),
agg AS (
  SELECT src, max_by(cur, hops) AS last_node, max(hops) AS max_hops
  FROM walk GROUP BY src
)
SELECT src,
       CASE WHEN max_hops < {hop_cap} THEN last_node END AS final,
       CASE WHEN max_hops < {hop_cap} THEN max_hops END AS hops,
       max_hops >= {hop_cap} AS is_cycle
FROM agg
"""
