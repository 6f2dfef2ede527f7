"""Deterministic random-walk corpus generation (DeepWalk-style prep).

Skip-gram graph embeddings (the public DeepWalk/node2vec line of work)
train on walk sequences sampled from the graph. At KG scale the walk
generator must be deterministic — a retried partition MUST regenerate
identical walks — and engine-checkable, so the "random" next-hop is a
content hash over (start, walk, step, current):

    next = neighbors(cur)[ md5_48(start|walk|step|cur) % outdeg(cur) ]

Scale shape: the per-node neighbor index is row_number partitioned by
src (parallel, no global window) over the edge list, persisted
pre-partitioned on src — each of the L steps is then ONE shuffle-hash
join of the (node-count x walks)-sized frontier against that cached
index, never a re-shuffle of the edges (the pagerank/bfs lesson).
Dead-end nodes (no out-edges) end their walk early: the join simply
produces no next row. Lineage is cut per step.

Like operators/negatives.py, the hash is the lambda-free md5 parse —
see that module's docstring for the pyspark 4.1.2 higher-order-
function mis-evaluation that rules out the rolling-fold hash in
multi-hash-site plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .negatives import md5_long48


def _positive_int(name: str, value) -> int:
    """Coerce an integral parameter via ``operator.index()`` — accepts
    int and numpy integer scalars, rejects floats (no silent
    truncation) and bool (True is not a walk length)."""
    import operator

    if isinstance(value, bool):
        raise ValueError(f"{name} must be a positive integer, got bool")
    try:
        value = operator.index(value)
    except TypeError:
        raise ValueError(
            f"{name} must be a positive integer, got {type(value).__name__}"
        ) from None
    if value < 1:
        raise ValueError(f"{name} must be a positive integer")
    return value


def neighbor_index(edges: DataFrame) -> DataFrame:
    """-> (src, pick, dst, outdeg): each node's out-neighbors indexed
    0..outdeg-1 in dst order (deterministic), with the out-degree on
    every row so the picker needs no second join."""
    w = W.partitionBy("src").orderBy("dst")
    e = edges.select("src", "dst").distinct()
    return (
        e.withColumn("pick", (F.row_number().over(w) - 1).cast("long"))
        .withColumn(
            "outdeg",
            F.count(F.lit(1)).over(W.partitionBy("src")).cast("long"),
        )
    )


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 1,
    length: int = 3,
) -> DataFrame:
    """-> (start, walk, step, node): `walks_per_node` deterministic
    walks of up to `length` hops from EVERY distinct src node. step 0
    is the start itself; a walk ends early at a node with no
    out-edges. Rows are a flat corpus — the skip-gram trainer's input
    after a per-(start, walk) collect_list.
    """
    if walks_per_node < 1 or length < 1:
        raise ValueError("walks_per_node and length must be >= 1")
    n_parts = edges.sparkSession.sparkContext.defaultParallelism
    idx = neighbor_index(edges).repartition(n_parts, "src").persist()
    starts = idx.select("src").distinct()
    state = starts.select(
        F.col("src").alias("start"),
        F.explode(
            F.sequence(F.lit(0).cast("long"),
                       F.lit(walks_per_node - 1).cast("long"))
        ).alias("walk"),
        F.col("src").alias("node"),
    )
    # each step's frontier is checkpointed individually; the frames are
    # unioned ONCE at the end — re-checkpointing the accumulated corpus
    # every step would materialize O(length^2) rows for nothing (the
    # accumulation is never consumed inside the loop)
    frames = [
        state.select(
            "start", "walk", F.lit(0).cast("long").alias("step"), "node"
        ).localCheckpoint()
    ]
    cur = frames[0]
    for step in range(1, length + 1):
        pick = md5_long48(
            F.concat_ws(
                "|", F.col("start"), F.col("walk"), F.lit(step),
                F.col("node"),
            )
        )
        probe = cur.select(
            "start",
            "walk",
            F.col("node").alias("src"),
            pick.alias("_h"),
        )
        nxt = (
            probe.hint("shuffle_hash")
            .join(idx, "src")
            .filter(F.col("pick") == F.col("_h") % F.col("outdeg"))
            .select(
                "start",
                "walk",
                F.lit(step).cast("long").alias("step"),
                F.col("dst").alias("node"),
            )
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        frames.append(nxt)
        cur = nxt
    idx.unpersist()
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def random_walks_oracle_sql(
    edges_sql: str,
    md5_sql,
    walks_per_node: int = 1,
    length: int = 3,
) -> str:
    """DuckDB twin: neighbor index via ROW_NUMBER, steps unrolled;
    md5_sql is operators/negatives.md5_long48_sql."""
    parts = [
        f"WITH ew AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nidx AS (SELECT src, dst,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1"
        "      AS BIGINT) AS pick,"
        " CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS outdeg"
        " FROM ew)",
        "w0 AS (SELECT s.src AS start, CAST(g.i AS BIGINT) AS walk,"
        " CAST(0 AS BIGINT) AS step, s.src AS node"
        " FROM (SELECT DISTINCT src FROM ew) s,"
        f" UNNEST(generate_series(0, {walks_per_node - 1})) AS g(i))",
    ]
    prev = "w0"
    union = ["SELECT start, walk, step, node FROM w0"]
    for step in range(1, length + 1):
        h = md5_sql(
            f"{prev}.start || '|' || CAST({prev}.walk AS VARCHAR)"
            f" || '|' || '{step}' || '|' || {prev}.node"
        )
        parts.append(
            f"w{step} AS (SELECT {prev}.start, {prev}.walk,"
            f" CAST({step} AS BIGINT) AS step, n.dst AS node"
            f" FROM {prev} JOIN nidx n ON n.src = {prev}.node"
            f" AND n.pick = ({h}) % n.outdeg)"
        )
        union.append(f"SELECT start, walk, step, node FROM w{step}")
        prev = f"w{step}"
    return ",\n".join(parts) + "\n" + " UNION ALL ".join(union)


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Walk corpus (start, walk, step, node) -> (center, context, n):
    skip-gram training pairs with co-occurrence counts, the input a
    distributed embedding trainer consumes alongside
    operators/negatives. A pair is (node at step i, node at step j)
    within the same (start, walk), 0 < |i - j| <= window; counts
    aggregate the whole corpus so the trainer weights by frequency
    instead of re-reading duplicate rows.

    Shape: the naive formulation is a |step diff| range self-join; here
    each row instead EXPLODES its <= 2*window context positions and
    equi-joins back on (start, walk, step) — a hash join on narrow
    keys, never a range join. One shuffle for the join, one for the
    final (center, context) agg. Revisit pairs (center = context, a
    walk that returns) are kept: both engines count identically and
    the trainer's dot(u, u) handling is its own concern.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    offs = [o for o in range(-window, window + 1) if o != 0]
    probe = walks.select(
        "start",
        "walk",
        F.col("node").alias("center"),
        F.explode(
            F.array(*[F.col("step") + F.lit(o) for o in offs])
        ).alias("step"),
    )
    return (
        probe.join(
            walks.select(
                "start", "walk", "step", F.col("node").alias("context")
            ),
            ["start", "walk", "step"],
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def skipgram_pairs_oracle_sql(walks_sql: str, window: int = 2) -> str:
    """DuckDB twin of skipgram_pairs: plain |step diff| self-join (the
    formulation the Spark side deliberately avoids) — a genuinely
    different plan that must produce identical counts."""
    return f"""
WITH wk AS (SELECT start, walk, step, node FROM ({walks_sql}))
SELECT a.node AS center, b.node AS context,
       CAST(COUNT(*) AS BIGINT) AS n
FROM wk a JOIN wk b
  ON a.start = b.start AND a.walk = b.walk
 AND abs(a.step - b.step) BETWEEN 1 AND {window}
GROUP BY a.node, b.node
"""


def node2vec_walks(
    edges: DataFrame,
    p: int = 1,
    q: int = 1,
    walks_per_node: int = 1,
    length: int = 3,
) -> DataFrame:
    """Second-order (node2vec-style, Grover & Leskovec 2016 — public)
    biased walks: the next hop's weight depends on the PREVIOUS node —
    return (dst == prev), triangle (dst adjacent to prev), or outward.
    The bias parameters are INTEGERS and the 1/p : 1 : 1/q weights are
    scaled by p*q to q : p*q : p, so cumulative-interval selection is
    integer-exact and engine-reproducible:

        r = md5_48(start|walk|step|cur) % sum(weights)
        chosen = the candidate (in pick order) whose cumulative
                 interval [cum - w, cum) contains r

    With p = q = 1 every weight is p*q = 1 and the selection reduces
    BIT-EXACTLY to random_walks' ``pick = h % outdeg`` (pinned by
    test); step 1 has no prev and is always first-order.

    Scale shape: candidates = ONE shuffle-hash join of the frontier
    against the persisted pre-partitioned neighbor index per step
    (random_walks' shape), plus ONE hash join against the distinct
    edge set on (prev, dst) for the triangle flag; the cum-weight
    window partitions by (start, walk) — per-frontier-row groups of
    outdeg rows, never a global window."""
    # integral checks, not just bounds: the q : p*q : p scheme is
    # integer-exact by contract — a float p=1.5 would silently truncate
    # through cast('long') and skew the bias without any error.
    # operator.index() accepts any __index__-able integral (numpy
    # int64 from config arithmetic included) while rejecting floats;
    # bool is excluded explicitly (True would silently pass as 1).
    p = _positive_int("p", p)
    q = _positive_int("q", q)
    walks_per_node = _positive_int("walks_per_node", walks_per_node)
    length = _positive_int("length", length)
    from pyspark.sql import Window as W

    n_parts = edges.sparkSession.sparkContext.defaultParallelism
    idx = neighbor_index(edges).repartition(n_parts, "src").persist()
    adj = (
        edges.select(
            F.col("src").alias("_a_src"), F.col("dst").alias("_a_dst")
        )
        .distinct()
        .repartition(n_parts, "_a_src")
        .persist()
    )
    starts = idx.select("src").distinct()
    frames = [
        starts.select(
            F.col("src").alias("start"),
            F.explode(
                F.sequence(F.lit(0).cast("long"),
                           F.lit(walks_per_node - 1).cast("long"))
            ).alias("walk"),
            F.lit(0).cast("long").alias("step"),
            F.col("src").alias("node"),
        ).localCheckpoint()
    ]
    # step 1: first-order (no prev) — identical to random_walks
    h1 = md5_long48(
        F.concat_ws("|", F.col("start"), F.col("walk"), F.lit(1),
                    F.col("node"))
    )
    cur = (
        frames[0]
        .select("start", "walk", F.col("node").alias("src"), h1.alias("_h"))
        .hint("shuffle_hash")
        .join(idx, "src")
        .filter(F.col("pick") == F.col("_h") % F.col("outdeg"))
        .select(
            "start", "walk", F.lit(1).cast("long").alias("step"),
            F.col("dst").alias("node"), F.col("src").alias("prev"),
        )
        .localCheckpoint()
    )
    if not cur.isEmpty():
        frames.append(cur.select("start", "walk", "step", "node"))
        for step in range(2, length + 1):
            cand = (
                cur.select(
                    "start", "walk", F.col("node").alias("src"), "prev"
                )
                .hint("shuffle_hash")
                .join(idx, "src")
                .join(
                    adj,
                    (F.col("_a_src") == F.col("prev"))
                    & (F.col("_a_dst") == F.col("dst")),
                    "left",
                )
                .select(
                    "start", "walk", F.col("src").alias("cur"), "prev",
                    "dst", "pick",
                    F.when(F.col("dst") == F.col("prev"), F.lit(q))
                    .when(F.col("_a_src").isNotNull(), F.lit(p * q))
                    .otherwise(F.lit(p))
                    .cast("long")
                    .alias("wgt"),
                )
            )
            wk = W.partitionBy("start", "walk")
            cum = F.sum("wgt").over(wk.orderBy("pick"))
            tot = F.sum("wgt").over(wk)
            r = md5_long48(
                F.concat_ws("|", F.col("start"), F.col("walk"),
                            F.lit(step), F.col("cur"))
            ) % tot
            nxt = (
                cand.withColumn("_cum", cum)
                .withColumn("_r", r)
                .filter(
                    (F.col("_r") >= F.col("_cum") - F.col("wgt"))
                    & (F.col("_r") < F.col("_cum"))
                )
                .select(
                    "start", "walk",
                    F.lit(step).cast("long").alias("step"),
                    F.col("dst").alias("node"),
                    F.col("cur").alias("prev"),
                )
                .localCheckpoint()
            )
            if nxt.isEmpty():
                break
            frames.append(nxt.select("start", "walk", "step", "node"))
            cur = nxt
    idx.unpersist()
    adj.unpersist()
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def node2vec_walks_oracle_sql(
    edges_sql: str,
    md5_sql,
    p: int = 1,
    q: int = 1,
    walks_per_node: int = 1,
    length: int = 3,
) -> str:
    """DuckDB twin of node2vec_walks: neighbor index + adjacency via
    window/joins, steps unrolled, integer interval selection."""
    parts = [
        f"WITH ew AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nidx AS (SELECT src, dst,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1"
        "      AS BIGINT) AS pick,"
        " CAST(COUNT(*) OVER (PARTITION BY src) AS BIGINT) AS outdeg"
        " FROM ew)",
        "w0 AS (SELECT s.src AS start, CAST(g.i AS BIGINT) AS walk,"
        " CAST(0 AS BIGINT) AS step, s.src AS node,"
        " CAST(NULL AS VARCHAR) AS prev"
        " FROM (SELECT DISTINCT src FROM ew) s,"
        f" UNNEST(generate_series(0, {walks_per_node - 1})) AS g(i))",
    ]
    h1 = md5_sql(
        "w0.start || '|' || CAST(w0.walk AS VARCHAR) || '|' || '1' "
        "|| '|' || w0.node"
    )
    parts.append(
        "w1 AS (SELECT w0.start, w0.walk, CAST(1 AS BIGINT) AS step,"
        " n.dst AS node, w0.node AS prev"
        f" FROM w0 JOIN nidx n ON n.src = w0.node"
        f" AND n.pick = ({h1}) % n.outdeg)"
    )
    union = [
        "SELECT start, walk, step, node FROM w0",
        "SELECT start, walk, step, node FROM w1",
    ]
    prev = "w1"
    for step in range(2, length + 1):
        h = md5_sql(
            f"c.start || '|' || CAST(c.walk AS VARCHAR) || '|' || "
            f"'{step}' || '|' || c.cur"
        )
        parts.append(
            f"cand{step} AS (SELECT w.start, w.walk, w.node AS cur,"
            " w.prev, n.dst, n.pick,"
            f" CAST(CASE WHEN n.dst = w.prev THEN {q}"
            f"      WHEN a.src IS NOT NULL THEN {p * q}"
            f"      ELSE {p} END AS BIGINT) AS wgt"
            f" FROM {prev} w JOIN nidx n ON n.src = w.node"
            " LEFT JOIN ew a ON a.src = w.prev AND a.dst = n.dst)"
        )
        parts.append(
            f"sel{step} AS (SELECT *,"
            " SUM(wgt) OVER (PARTITION BY start, walk ORDER BY pick"
            "   ROWS UNBOUNDED PRECEDING) AS cum,"
            " SUM(wgt) OVER (PARTITION BY start, walk) AS tot"
            f" FROM cand{step})"
        )
        parts.append(
            f"w{step} AS (SELECT c.start, c.walk,"
            f" CAST({step} AS BIGINT) AS step, c.dst AS node,"
            " c.cur AS prev"
            f" FROM sel{step} c"
            f" WHERE (({h}) % c.tot) >= c.cum - c.wgt"
            f" AND (({h}) % c.tot) < c.cum)"
        )
        union.append(f"SELECT start, walk, step, node FROM w{step}")
        prev = f"w{step}"
    return ",\n".join(parts) + "\n" + " UNION ALL ".join(union)
