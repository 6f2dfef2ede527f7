"""Iterative connected components: alternating large-star / small-star.

The canonicalization stage (SURVEY.md §7.9) needs connected components
over mention-coreference edges. We implement the two-phase star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14
— public), which converges in O(log d) rounds vs O(d) for naive label
propagation; at 10^12-doc scale alias graphs are shallow but celebrity
hubs create huge stars, which this algorithm handles by always rewiring
to the component minimum.

Edges are canonical (hi > lo) bigint pairs. Each round:
  large-star: for every node u, connect all strictly-larger neighbors to
              m = min(N(u) ∪ {u})
  small-star: for every hub hi, connect all its lo-neighbors (and itself)
              to m = min of them
Fixpoint when the edge multiset stops changing (count + xor-hash compare).
localCheckpoint each round cuts lineage (SURVEY.md §4.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ITER = 20
# below this edge count the graph fits trivially in the driver and the
# star-loop's ~6 shuffles/iteration are pure overhead: collect + union-find
SMALL_EDGES = 500_000


def _canon(edges: DataFrame) -> DataFrame:
    """-> distinct (hi, lo) with hi > lo; self-loops dropped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    sym = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    big = sym.filter(F.col("v") > F.col("u"))
    return (
        big.join(mins, "u")
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    mins = e.groupBy("hi").agg(F.min("lo").alias("m"))
    nbrs = e.join(mins, "hi").select(
        F.col("lo").alias("v"), F.col("m")
    ).unionByName(mins.select(F.col("hi").alias("v"), F.col("m")))
    return (
        nbrs.filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
        .distinct()
    )


def _signature(e: DataFrame) -> tuple[int, int]:
    """(row count, full-width xor of per-edge xxhash64) — the fixpoint
    signature of the star loop. bit_xor keeps all 64 hash bits (edge
    sets here are distinct, so xor is order/multiplicity-safe and a
    false fixpoint needs a ~2^-64 collision), where a truncated
    sum-of-moduli signature made a premature break plausible on large
    swaps; same scheme as graph._scc_minlabel."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.expr("bit_xor(xxhash64(hi, lo))"), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, max_iter: int = MAX_ITER, small_threshold: int = SMALL_EDGES
) -> DataFrame:
    """edges(src bigint, dst bigint) -> (node bigint, component bigint).

    component = min node id of the connected component. Singleton nodes
    (no edges) are the caller's concern — union them with component=node.
    """
    spark = edges.sparkSession
    e = _canon(edges).localCheckpoint()
    sig = _signature(e)

    if sig[0] <= small_threshold:
        # Adaptive plan choice: the alias/coref graph of one run is usually
        # orders smaller than the corpus (distinct normalized surfaces x
        # entities). Union-find on the driver is exact, deterministic, and
        # replaces ~6 shuffles x O(log n) rounds with one collect. The
        # distributed star loop below remains the plan for web-scale graphs.
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        rows = e.collect()
        for row in rows:
            a, b = find(int(row["hi"])), find(int(row["lo"]))
            if a != b:
                if a < b:
                    a, b = b, a
                parent[a] = b  # root at the smaller id
        nodes = sorted({n for row in rows for n in (row["hi"], row["lo"])})
        out = [(n, find(n)) for n in nodes]
        if not out:
            return spark.createDataFrame([], "node bigint, component bigint")
        return spark.createDataFrame(out, ["node", "component"])
    # Partition the loop for the EDGE data size, not the session default:
    # alias graphs are usually far smaller than the corpus that produced
    # them, and a 6-shuffle-per-iteration loop over near-empty partitions
    # is pure task-launch overhead (measured anti-scaling at local[N]).
    # The sizing is done with explicit repartition() calls only — NOT by
    # mutating spark.sql.shuffle.partitions, which would leak the reduced
    # count into any concurrent query on the shared session (AQE coalesces
    # the intermediate groupBy exchanges down to the data size anyway).
    target = max(
        1,
        min(spark.sparkContext.defaultParallelism, sig[0] // 50_000 + 1),
    )
    e = e.repartition(target).localCheckpoint()
    converged = False
    for _ in range(max_iter):
        e = _small_star(_large_star(e)).repartition(target).localCheckpoint()
        new_sig = _signature(e)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # reading a mid-contraction edge set as final stars would
        # silently split components (downstream: wrong canonical ids),
        # so non-convergence is an error, matching graph.scc's contract
        raise RuntimeError(
            "connected_components star loop did not converge within "
            f"{max_iter} rounds; raise max_iter"
        )
    members = e.select(F.col("hi").alias("node"), F.col("lo").alias("component"))
    roots = e.select(F.col("lo").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots).groupBy("node").agg(
        F.min("component").alias("component")
    )


def _mark_touched(prev_labels: DataFrame, d: DataFrame) -> DataFrame:
    """prev_labels(node, component) + canonical delta edges d(hi, lo) ->
    prev_labels with a `_touched` marker on every row whose component
    the delta reaches.

    Plan shape (the property that survives 10^12 labels): both joins
    probe the LARGE prev_labels side against DROP-SIZED builds (delta
    nodes, then touched components). When the drop is small AQE turns
    both into broadcast builds after the drop-side aggregates
    materialize (runtime-gated in tests/test_plans.py), leaving
    prev_labels scan-only; the worst case — a drop too large to
    broadcast — is one hash shuffle of prev_labels per join, still
    O(accumulated NODES), never O(accumulated edges). The marker column
    splits carried-over from re-labeled halves in one pass."""
    dn = (
        d.select(F.col("hi").alias("node"))
        .unionByName(d.select(F.col("lo").alias("node")))
        .distinct()
    )
    touched = prev_labels.join(dn, "node").select("component").distinct()
    return prev_labels.join(
        touched.withColumn("_touched", F.lit(True)), "component", "left"
    )


def connected_components_incremental(
    prev_labels: DataFrame | None,
    delta_edges: DataFrame,
    max_iter: int = MAX_ITER,
    small_threshold: int = SMALL_EDGES,
) -> DataFrame:
    """Maintain a components labeling under an edge DELTA without ever
    rescanning the accumulated edge set.

    prev_labels(node bigint, component bigint) is a prior
    connected_components output (component = min node id — the invariant
    this function preserves); delta_edges(src, dst) is the new drop's
    edges. Returns the labeling a full recompute over (all prior edges
    UNION delta) would produce, for every node in prev_labels or delta.

    Why it's correct: a labeling is a lossless contraction of
    connectivity — the star edges {member — component_root} reconstruct
    each prior component exactly, and the root IS the component minimum,
    so CC over (delta ∪ star edges of TOUCHED components) re-derives the
    min-id labels of everything the delta can reach. Components the
    delta never touches cannot change and carry over verbatim.

    Why it scales: per-drop cost is O(|delta| + Σ|touched components| +
    one linear pass over prev_labels), never O(accumulated edges). At
    10^12-doc scale the alias graph's edge set dwarfs its node set and a
    daily drop is ~1e-3 of it; the one wide operation here is a single
    hash shuffle of prev_labels on `component` (AQE turns the probe-side
    joins into broadcasts when the drop is small). The relabel CC runs
    over a drop-sized graph, so it takes the driver union-find fast path
    below `small_threshold` and the distributed star loop above it.
    """
    if prev_labels is None:
        return connected_components(delta_edges, max_iter, small_threshold)
    d = _canon(delta_edges).localCheckpoint()
    marked = _mark_touched(prev_labels, d).localCheckpoint()
    untouched = marked.filter(F.col("_touched").isNull()).select(
        "node", "component"
    )
    star = (
        marked.filter(F.col("_touched").isNotNull())
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("src"), F.col("component").alias("dst"))
    )
    relabeled = connected_components(
        star.unionByName(
            d.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
        ),
        max_iter,
        small_threshold,
    )
    # touched singletons (node == component, no star edge) re-enter via
    # their delta edge in `d`; brand-new nodes likewise
    return untouched.unionByName(relabeled)
