"""Declarative data-quality expectations — the table contract runner.

Production pipelines gate every stage commit on table-level invariants
(the public Deequ / Great Expectations / dbt-tests pattern): nulls,
key uniqueness, accepted value domains, referential integrity, volume
bounds. This runner evaluates a rule list against a DataFrame with the
minimum possible plan:

  - all row-local rules (not_null, accepted_values, matches_regex,
    in_range, min_rows) fold into ONE single-pass aggregation —
    conditional-count columns over one scan, no shuffle beyond the
    global agg's single-row reduce;
  - `unique` adds one groupBy on the checked column (violations =
    n_rows - n_distinct needs exactness, not an estimate);
  - `fk` adds one left-anti join per reference (dimension broadcast).

Output: (rule, column, n_violations, passed) — one row per rule, so
the stage-gate decision is `violations.filter(~passed).isEmpty()`.
The pipeline's own validation family (ontology domain/range, dangling
references — operators/validation.py) are the KG-specific instances;
this is the generic engine underneath them for arbitrary stage tables.

Rules (tuples, first element the rule name):
    ("not_null", col)
    ("unique", col)
    ("accepted_values", col, [v1, v2, ...])
    ("matches_regex", col, pattern)
    ("in_range", col, lo, hi)           # inclusive, numeric
    ("min_rows", n)
    ("fk", col, dim_df, dim_col)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cnt(cond) -> "F.Column":
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def check_expectations(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` -> (rule, column,
    n_violations, passed)."""
    spark = df.sparkSession
    agg_cols = []
    agg_meta: list[tuple[str, str]] = []
    n_rows_needed = False
    extra_frames: list[DataFrame] = []

    for i, rule in enumerate(rules):
        kind = rule[0]
        if kind == "not_null":
            agg_cols.append(_cnt(F.col(rule[1]).isNull()).alias(f"_r{i}"))
            agg_meta.append((f"_r{i}", "direct"))
        elif kind == "accepted_values":
            agg_cols.append(
                _cnt(
                    F.col(rule[1]).isNull()
                    | ~F.col(rule[1]).isin(*rule[2])
                ).alias(f"_r{i}")
            )
            agg_meta.append((f"_r{i}", "direct"))
        elif kind == "matches_regex":
            agg_cols.append(
                _cnt(
                    F.col(rule[1]).isNull()
                    | ~F.col(rule[1]).rlike(rule[2])
                ).alias(f"_r{i}")
            )
            agg_meta.append((f"_r{i}", "direct"))
        elif kind == "in_range":
            lo, hi = rule[2], rule[3]
            agg_cols.append(
                _cnt(
                    F.col(rule[1]).isNull()
                    | (F.col(rule[1]) < lo)
                    | (F.col(rule[1]) > hi)
                ).alias(f"_r{i}")
            )
            agg_meta.append((f"_r{i}", "direct"))
        elif kind == "min_rows":
            n_rows_needed = True
            agg_meta.append((f"_r{i}", "min_rows"))
        elif kind == "unique":
            n_rows_needed = True
            agg_cols.append(
                F.count_distinct(F.col(rule[1])).cast("long").alias(f"_r{i}")
            )
            agg_meta.append((f"_r{i}", "unique"))
        elif kind == "fk":
            agg_meta.append((f"_r{i}", "fk"))
        else:
            raise ValueError(f"unknown rule kind: {kind}")

    if n_rows_needed or agg_cols:
        base = df.agg(
            F.count(F.lit(1)).cast("long").alias("_n_rows"), *agg_cols
        ).collect()[0]
    else:
        base = None

    rows = []
    for i, rule in enumerate(rules):
        kind = rule[0]
        col = rule[1] if kind != "min_rows" else None
        if kind == "min_rows":
            v = max(0, rule[1] - base["_n_rows"])
        elif kind == "unique":
            v = base["_n_rows"] - base[f"_r{i}"]
        elif kind == "fk":
            _, fcol, dim_df, dim_col = rule
            col = fcol
            v = (
                df.select(F.col(fcol))
                .filter(F.col(fcol).isNotNull())
                .join(
                    F.broadcast(
                        dim_df.select(F.col(dim_col).alias(fcol)).distinct()
                    ),
                    fcol,
                    "left_anti",
                )
                .count()
            )
        else:
            v = base[f"_r{i}"]
        rows.append(
            (
                kind,
                str(col) if col is not None else "",
                int(v),
                bool(v == 0),
            )
        )
    return spark.createDataFrame(
        rows, "rule string, column string, n_violations long, passed boolean"
    )
