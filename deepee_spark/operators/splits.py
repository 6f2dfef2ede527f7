"""Leakage-aware dataset splitting — group-level train/val/test.

Random row-level splits leak: near-duplicate pages from one site land
on both sides of a train/test boundary and inflate eval (the classic
web-ML failure the dedup family only partially prevents). The standard
hygiene is GROUP-level assignment — every row of a group (host,
canonical entity, dedup cluster) lands in exactly one split, decided
by a content hash so the assignment is reproducible, order-free, and
engine-checkable:

    bucket(group) = portable_fold_hash(group) % 1000
    split = first s with bucket < 1000 * cumulative_fraction(s)

(The bucket hash is the engine-wide deterministic rolling fold —
operators/dedup.str_hash, with a DuckDB twin — not xxhash64, so the
assignment reproduces bit-exactly OUTSIDE Spark too: the property that
makes a split auditable years later from any engine.)

One narrow withColumn — no shuffle, no state; the split survives any
re-partitioning, incremental drop, or engine re-run by construction.
``verify_no_leakage`` is the audit: groups observed in more than one
split (must be zero rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import str_hash

_BUCKETS = 1000


def split_expr(group: Column, fractions: dict[str, float]) -> Column:
    """The assignment expression for a group column: deterministic,
    narrow. ``fractions`` values must sum to 1 (±1e-9); cut points are
    exact integer bucket thresholds so both engines agree."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = str_hash(group) % F.lit(_BUCKETS)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        cut = round(acc * _BUCKETS)
        cond = bucket < F.lit(cut)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return expr


def group_split(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` with the group-deterministic split label."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    return df.withColumn(out_col, split_expr(F.col(group_col), fractions))


def verify_no_leakage(
    df: DataFrame, group_col: str, split_col: str = "split"
) -> DataFrame:
    """-> groups appearing in >1 split (MUST be empty): the audit a
    publication step runs over the final labeled dataset. One groupBy."""
    return (
        df.groupBy(group_col)
        .agg(F.count_distinct(split_col).alias("n_splits"))
        .filter(F.col("n_splits") > 1)
    )
