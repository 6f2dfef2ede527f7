"""Basic-graph-pattern matching: a SPARQL-lite conjunctive query
evaluator over the triple table.

Once the pipeline materializes (subj, pred, obj), the first consumer
question is conjunctive: "users who purchased AND clicked the same
item" is the BGP {(?u, purchase, ?i), (?u, click, ?i)}. This evaluator
compiles such a pattern list into the standard join plan: one scan of
the triple table per pattern (literals pushed down as filters — they
reach the parquet scan), then equi-joins on the shared variables in
pattern order. That is exactly how SPARQL engines evaluate BGPs
(public semantics; SELECT-star conjunctive queries), expressed as a
Catalyst plan so the optimizer reorders/broadcasts as statistics
allow.

Variables are '?name' strings; anything else is a literal. Result
columns are the variable names (without '?'), one row per binding —
bag semantics with a final distinct (set semantics), matching the
SQL-twin formulation. Cartesian patterns (no shared variable with the
accumulated prefix) are rejected: at KG scale an accidental cross
join is a plan bug, not a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _is_var(term: str) -> bool:
    return term.startswith("?")


def bgp_match(
    triples: DataFrame, patterns: list[tuple[str, str, str]]
) -> DataFrame:
    """-> one column per distinct variable, one row per distinct
    variable binding satisfying EVERY pattern."""
    if not patterns:
        raise ValueError("patterns must be non-empty")
    acc = None
    bound: set[str] = set()
    for i, (s, p, o) in enumerate(patterns):
        t = triples.select("subj", "pred", "obj")
        sel = []
        seen_here: dict[str, str] = {}
        for term, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if _is_var(term):
                name = term[1:]
                if name in seen_here:
                    # same var twice IN one pattern: equality filter
                    t = t.filter(F.col(col) == F.col(seen_here[name]))
                else:
                    seen_here[name] = col
                    sel.append(F.col(col).alias(name))
            else:
                t = t.filter(F.col(col) == F.lit(term))
        t = t.select(*sel)
        if acc is None:
            acc = t
            bound = set(seen_here)
            continue
        shared = sorted(bound & set(seen_here))
        if not shared:
            raise ValueError(
                f"pattern {i} shares no variable with the prefix —"
                " a cartesian product; reorder or constrain the query"
            )
        acc = acc.join(t, shared)
        bound |= set(seen_here)
    return acc.distinct()
