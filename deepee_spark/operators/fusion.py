"""Truth discovery / fact fusion: source-reliability weighted voting.

The KG-construction step after canonicalization: multiple pages
(sources) assert conflicting values for the same fact slot — (entity,
predicate) pairs where the crawl disagrees — and the pipeline must
pick one value per fact while estimating how trustworthy each source
is. The reference repo stops at per-model extraction quality
(DeepEE-main/*/train.py evaluates each extractor against gold); fusing
the extractors' emissions ACROSS documents into one consistent triple
store is the web-scale step this engine adds on top.

The algorithm is the classic mutual-reinforcement fixed point (Sums /
TruthFinder family, simplified to its voting core):

    trust_0(s)   = SCALE                          (all sources equal)
    vote_i(f,v)  = sum_{s asserts (f,v)} trust_{i-1}(s)
    conf_i(f,v)  = (SCALE * vote_i(f,v)) div sum_{v'} vote_i(f,v')
    trust_i(s)   = (sum_{(f,v) asserted by s} conf_i(f,v)) div n_claims(s)

run for a FIXED number of rounds — no convergence test, so the
pre-/post-convergence state is identical in Spark and the unrolled-CTE
DuckDB twin. Every operation is BIGINT (micro-units, SCALE = 1e6), so
results are independent of shuffle partitioning and bit-identical
across engines. Overflow bound: the largest intermediate is
SCALE * vote with vote <= n_sources * SCALE, so any fan-in below
2^63 / 1e12 ~ 9.2e6 sources per fact stays exact — beyond that, bump
to per-fact pre-aggregation or a narrower SCALE.

Scale shape per round: two key-partitioned shuffles — groupBy
(fact, value) for votes, groupBy source for the trust update — plus
one unordered-frame window on fact for the normalizer (the fact-level
total is one row per fact, never broadcastable at KG scale, so the
window replaces a groupBy + sort-merge join over the same rows).
The claims table is persisted once (it is round-invariant); the trust
table (one row per source, orders of magnitude smaller than claims)
is localCheckpoint-ed per round so the plan stays O(1) deep
regardless of rounds, exactly like operators/graph.pagerank_int.
No driver-side data movement: the loop only composes lazy plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

SCALE = 1_000_000


def _fuse_rounds(
    claims: DataFrame, iters: int
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared core: returns (claims_distinct, conf_final, trust_final,
    n_claims) where conf_final is the round-`iters` per-(fact, value)
    confidence (computed from trust_{iters-1}), trust_final is
    trust_{iters}, and n_claims the per-source claim counts (computed
    once here so callers do not re-aggregate the claims table)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    c = (
        claims.select("source", "fact", "value")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_claims = c.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_claims")
    )
    trust = c.select("source").distinct().select(
        "source", F.lit(SCALE).cast("long").alias("trust")
    )
    conf = None
    for _ in range(iters):
        vote = (
            c.join(trust, "source")
            .groupBy("fact", "value")
            .agg(F.sum("trust").cast("long").alias("vote"))
        )
        # per-fact normalizer as an unordered-frame window over vote:
        # the fact-level total is one row per fact — never broadcastable
        # at KG scale — so a groupBy+join would cost an extra exchange
        # and a sort-merge join on exactly the rows the window reads in
        # place. Value fan-out per fact is ontology-bounded, so the
        # window partition cannot be a skew key.
        conf = vote.withColumn(
            "tot",
            F.sum("vote").over(Window.partitionBy("fact")).cast("long"),
        ).select(
            "fact",
            "value",
            F.expr(f"({SCALE} * vote) DIV tot").cast("long").alias("conf"),
        )
        # trust_i: average confidence of the source's claims. Aggregate
        # first, divide after the n_claims join — one shuffle on source.
        trust = (
            c.join(conf, ["fact", "value"])
            .groupBy("source")
            .agg(F.sum("conf").cast("long").alias("sum_conf"))
            .join(n_claims, "source")
            .select(
                "source",
                F.expr("sum_conf DIV n_claims").cast("long").alias("trust"),
            )
            .localCheckpoint()
        )
    return c, conf, trust, n_claims


def fuse_claims(
    claims: DataFrame, iters: int = 3, pin: bool = True
) -> DataFrame:
    """Fuse conflicting claims into per-(fact, value) confidences.

    `claims` carries (source, fact, value); duplicates are collapsed.
    Returns (fact, value, n_src, conf_e6, winner): `n_src` = how many
    distinct sources assert the pair, `conf_e6` = the round-`iters`
    integer confidence (micro-units, sums to <= 1e6 per fact),
    `winner` = true for the fact's highest-confidence value
    (ties break toward the smallest value string).

    `pin=False` skips the final localCheckpoint (which truncates the
    plan to an RDD scan) so callers — the plan-shape tests — can
    inspect the final round's physical plan; the logical plan is the
    same one the pinned default materializes.
    """
    c, conf, _, _ = _fuse_rounds(claims, iters)
    n_src = c.groupBy("fact", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n_src")
    )
    w = Window.partitionBy("fact").orderBy(
        F.desc("conf"), F.asc("value")
    )
    out = conf.join(n_src, ["fact", "value"]).withColumn(
        "rk", F.row_number().over(w)
    ).select(
        "fact",
        "value",
        "n_src",
        F.col("conf").alias("conf_e6"),
        (F.col("rk") == 1).alias("winner"),
    )
    if not pin:
        return out
    # pin BEFORE dropping the claims cache (graph.py pattern):
    # unpersisting first would make the final action recompute the
    # claims scan + distinct from scratch — twice (vote join and
    # n_src)
    out = out.localCheckpoint()
    c.unpersist()
    return out


def source_trust(claims: DataFrame, iters: int = 3) -> DataFrame:
    """The dual view: per-source reliability after `iters` rounds.
    Returns (source, n_claims, trust_e6)."""
    c, _, trust, n_claims = _fuse_rounds(claims, iters)
    out = (
        trust.join(n_claims, "source")
        .select("source", "n_claims", F.col("trust").alias("trust_e6"))
        .localCheckpoint()  # pin before dropping the claims cache
    )
    c.unpersist()
    return out


def fusion_oracle_sql(claims_sql: str, iters: int = 3) -> str:
    """DuckDB twin of fuse_claims: the same integer recurrence unrolled
    as chained CTEs over `claims_sql` (a SELECT yielding source, fact,
    value)."""
    parts = [
        "WITH c AS (SELECT DISTINCT source, fact, value"
        f" FROM ({claims_sql}))",
        "nc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_claims"
        " FROM c GROUP BY source)",
        f"t0 AS (SELECT source, CAST({SCALE} AS BIGINT) AS trust"
        " FROM (SELECT DISTINCT source FROM c))",
    ]
    prev = "t0"
    for i in range(1, iters + 1):
        parts.append(
            f"v{i} AS (SELECT fact, value,"
            " CAST(SUM(trust) AS BIGINT) AS vote"
            f" FROM c JOIN {prev} USING (source) GROUP BY fact, value)"
        )
        parts.append(
            f"tt{i} AS (SELECT fact, CAST(SUM(vote) AS BIGINT) AS tot"
            f" FROM v{i} GROUP BY fact)"
        )
        parts.append(
            f"cf{i} AS (SELECT fact, value,"
            f" CAST(({SCALE} * vote) // tot AS BIGINT) AS conf"
            f" FROM v{i} JOIN tt{i} USING (fact))"
        )
        parts.append(
            f"s{i} AS (SELECT source, CAST(SUM(conf) AS BIGINT) AS sc"
            f" FROM c JOIN cf{i} USING (fact, value) GROUP BY source)"
        )
        parts.append(
            f"t{i} AS (SELECT source,"
            " CAST(sc // n_claims AS BIGINT) AS trust"
            f" FROM s{i} JOIN nc USING (source))"
        )
        prev = f"t{i}"
    parts.append(
        "ns AS (SELECT fact, value, CAST(COUNT(*) AS BIGINT) AS n_src"
        " FROM c GROUP BY fact, value)"
    )
    parts.append(
        f"fin AS (SELECT cf{iters}.fact, cf{iters}.value, ns.n_src,"
        f" cf{iters}.conf AS conf_e6,"
        " ROW_NUMBER() OVER (PARTITION BY cf"
        f"{iters}.fact ORDER BY conf DESC, cf{iters}.value) AS rk"
        f" FROM cf{iters} JOIN ns USING (fact, value))"
    )
    return (
        ",\n".join(parts)
        + "\nSELECT fact, value, n_src, conf_e6, rk = 1 AS winner FROM fin"
    )


def trust_oracle_sql(claims_sql: str, iters: int = 3) -> str:
    """DuckDB twin of source_trust."""
    body = fusion_oracle_sql(claims_sql, iters)
    # Reuse the CTE chain; swap the final projection for the trust view.
    head = body.rsplit("\nSELECT", 1)[0]
    return (
        head
        + f"\nSELECT source, n_claims, trust AS trust_e6"
        f" FROM t{iters} JOIN nc USING (source)"
    )
