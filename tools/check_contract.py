"""Local replica of the driver's correctness gate: run every
__spark_entry__ query on Spark and its oracle on DuckDB at sf0.01,
compare row count, column-name sets, and order-insensitive values.

Canonicalization deliberately mimics the driver (round 1 lesson):
results go through pandas (`toPandas()` / duckdb `.df()`), are sorted
with `sort_values` over all columns, and cells are normalized
dtype-sensitively — an int64 column and a float64 column holding the
same numbers do NOT match (DuckDB HUGEINT -> pandas float64 burned
`s4_conll_scan` in round 1), and list-typed cells crash `sort_values`
exactly like the driver's canonicalizer (burned `mm_image_features`).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canonical(pdf):
    """Driver-style canonical form: sort columns by name, sort rows by
    values (raises on unhashable/list cells, like the driver), then
    normalize cells with the column DTYPE kept visible so int64 vs
    float64 mismatches are caught."""
    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )

    def norm(col):
        s = pdf[col]
        if pd.api.types.is_float_dtype(s):
            return [
                "fNaN" if pd.isna(v) else f"f{float(v):.9g}" for v in s
            ]
        if pd.api.types.is_integer_dtype(s):
            return [f"i{int(v)}" for v in s]
        if pd.api.types.is_bool_dtype(s):
            return [f"b{bool(v)}" for v in s]
        out = []
        for v in s:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                out.append("None")
            elif isinstance(v, float):
                out.append(f"f{v:.9g}")
            elif isinstance(v, int):
                out.append(f"i{v}")
            else:
                out.append(str(v))
        return out

    cols = [norm(c) for c in pdf.columns]
    return list(zip(*cols)) if cols else []


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    from deepee_spark.session import get_spark

    spark = get_spark("contract-check")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        try:
            sdf = fn(spark, sf_dir)
            s_pdf = sdf.toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:400]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            try:
                canonical(s_pdf)  # still must be driver-canonicalizable
                print(f"SKIP {name}: no oracle (rows={len(s_pdf)})")
            except Exception as e:
                failures.append((name, f"CANON ERROR: {e}"))
                print(f"FAIL {name}: rows-only canonicalize error {str(e)[:300]}")
            continue
        try:
            d_pdf = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {name}: duckdb error {str(e)[:400]}")
            continue
        problems = []
        if len(s_pdf) != len(d_pdf):
            problems.append(f"rowcount spark={len(s_pdf)} duckdb={len(d_pdf)}")
        if sorted(s_pdf.columns) != sorted(d_pdf.columns):
            problems.append(
                f"schema spark={sorted(s_pdf.columns)} duckdb={sorted(d_pdf.columns)}"
            )
        if not problems:
            try:
                cs, cd = canonical(s_pdf), canonical(d_pdf)
            except Exception as e:
                cs, cd = None, None
                problems.append(f"canonicalize error: {e}")
            if cs is not None and cs != cd:
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL {name}: {'; '.join(problems)[:500]}")
        else:
            print(f"OK   {name} ({len(s_pdf)} rows)")

    print(
        f"\n{len(failures)} failures / {n_checked} checked "
        f"({len(qs)} total queries)"
    )
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
