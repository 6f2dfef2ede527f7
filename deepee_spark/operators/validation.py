"""KG schema validation: domain/range constraint checking.

An event-centric KG has an ontology (deepee_spark/ontology.py mirrors
the public ACE event/role inventory): every predicate implies what KIND
of entity may appear as its subject (domain) and object (range) — a
`pred:Attack:Attacker` edge should not point at a timestamp node. The
reference enforces this implicitly through per-model label spaces; at
KG scale it becomes an explicit data-quality pass run after every
ingest drop, next to the functional-conflict check
(__spark_entry__.kg_functional_conflicts).

Scale shape: the constraint table is ontology-sized (hundreds of rows)
— broadcast. Node kinds are a node-count-sized dimension joined twice
(subj, obj); both joins key on the node id, so with the triples table
bucketed by subj the first join is co-located and only the obj-side
lookup shuffles. No window, no quadratic stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def domain_range_violations(
    triples: DataFrame,
    node_kinds: DataFrame,
    constraints: DataFrame,
) -> DataFrame:
    """-> triples violating their predicate's domain/range constraint.

    triples(subj, pred, obj); node_kinds(node, kind);
    constraints(pred, subj_kind, obj_kind). Returns (subj, pred, obj,
    subj_kind, obj_kind, violation) with violation in
    {'domain', 'range', 'both'}; a node MISSING from node_kinds has
    NULL kind and counts as a mismatch (an unregistered entity is a
    violation, not a pass — eqNullSafe comparison). Predicates without
    a registered constraint are not checked (inner join).
    """
    sk = node_kinds.select(
        F.col("node").alias("subj"), F.col("kind").alias("subj_kind")
    )
    ok = node_kinds.select(
        F.col("node").alias("obj"), F.col("kind").alias("obj_kind")
    )
    con = constraints.select(
        "pred",
        F.col("subj_kind").alias("_want_sk"),
        F.col("obj_kind").alias("_want_ok"),
    )
    joined = (
        triples.join(F.broadcast(con), "pred")
        .join(sk, "subj", "left")
        .join(ok, "obj", "left")
    )
    bad_s = ~F.col("subj_kind").eqNullSafe(F.col("_want_sk"))
    bad_o = ~F.col("obj_kind").eqNullSafe(F.col("_want_ok"))
    return (
        joined.filter(bad_s | bad_o)
        .withColumn(
            "violation",
            F.when(bad_s & bad_o, F.lit("both"))
            .when(bad_s, F.lit("domain"))
            .otherwise(F.lit("range")),
        )
        .select("subj", "pred", "obj", "subj_kind", "obj_kind", "violation")
    )


def dangling_references(
    triples: DataFrame, nodes: DataFrame
) -> DataFrame:
    """Referential-integrity sweep: triples whose subj or obj has no
    row in the node table — the KG analogue of a foreign-key check,
    run after every ingest drop next to domain/range validation.

    -> (subj, pred, obj, missing) with missing in {'subj', 'obj',
    'both'}. Two left joins against the node-id dimension (each a
    semi-join-shaped lookup the planner can broadcast when the node
    table is small, or shuffle on the id otherwise); no windows.
    """
    ids = nodes.select(F.col("node")).distinct()
    s = ids.select(F.col("node").alias("subj"), F.lit(1).alias("_s"))
    o = ids.select(F.col("node").alias("obj"), F.lit(1).alias("_o"))
    return (
        triples.join(s, "subj", "left")
        .join(o, "obj", "left")
        .filter(F.col("_s").isNull() | F.col("_o").isNull())
        .withColumn(
            "missing",
            F.when(
                F.col("_s").isNull() & F.col("_o").isNull(), F.lit("both")
            )
            .when(F.col("_s").isNull(), F.lit("subj"))
            .otherwise(F.lit("obj")),
        )
        .select("subj", "pred", "obj", "missing")
    )
