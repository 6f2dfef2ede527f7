"""Water-filling budget allocation (operators/budget) vs an independent
bisection reference and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deepee_spark.operators.budget import water_fill, water_fill_oracle_sql


def _ref_level(demands, B):
    """Bisection on f(L) = sum(min(d, L)) — independent of the
    closed-form prefix construction under test."""
    if sum(demands) <= B:
        return float("inf")
    lo, hi = 0.0, float(max(demands))
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(d, mid) for d in demands) > B:
            hi = mid
        else:
            lo = mid
    return (lo + hi) / 2


def _ref_alloc(pairs, num=3, den=5):
    demands = [d for _, d in pairs]
    B = int(sum(demands) * num / den)
    L = _ref_level(demands, B)
    return {h: min(float(d), L) for h, d in pairs}


_CASES = [
    [("a", 100), ("b", 10), ("c", 10), ("d", 1)],
    [("a", 5), ("b", 5), ("c", 5)],  # all equal
    [("a", 1)],  # single host
    [("x", 0), ("y", 7), ("z", 7)],  # zero demand host
    [(f"h{i}", (i * 37) % 101 + 1) for i in range(200)],  # many buckets
]


@pytest.mark.parametrize("pairs", _CASES)
def test_vs_bisection_reference(spark, pairs):
    df = spark.createDataFrame(pairs, "host string, demand long")
    got = {r.host: r.allocation for r in water_fill(df).collect()}
    ref = _ref_alloc(pairs)
    for h in ref:
        assert got[h] == pytest.approx(ref[h], abs=1e-5), (h, got[h], ref[h])
    # clamped case: allocations sum to ~B
    B = int(sum(d for _, d in pairs) * 3 / 5)
    if sum(d for _, d in pairs) > B:
        assert sum(got.values()) == pytest.approx(B, abs=1e-3)


def test_under_budget_everyone_served(spark):
    df = spark.createDataFrame([("a", 3), ("b", 4)], "host string, demand long")
    got = {r.host: r.allocation for r in water_fill(df, 2, 1).collect()}
    assert got == {"a": 3.0, "b": 4.0}


def test_duckdb_twin(spark):
    for pairs in _CASES:
        sql = "SELECT * FROM (VALUES " + ",".join(
            f"($${h}$$, {d})" for h, d in pairs
        ) + ") t(host, demand)"
        oracle = {
            h: a for h, _, a in duckdb.sql(water_fill_oracle_sql(sql)).fetchall()
        }
        df = spark.createDataFrame(pairs, "host string, demand long")
        got = {r.host: r.allocation for r in water_fill(df).collect()}
        assert got == oracle, pairs


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40
    )
)
def test_property_max_min_fairness(spark, demands):
    pairs = [(f"h{i}", d) for i, d in enumerate(demands)]
    df = spark.createDataFrame(pairs, "host string, demand long")
    got = {r.host: r.allocation for r in water_fill(df).collect()}
    ref = _ref_alloc(pairs)
    for h in ref:
        assert got[h] == pytest.approx(ref[h], abs=1e-4)


def test_per_row_windows_are_bucket_partitioned(spark):
    """The rank/prefix windows over the host stream must be partitioned
    (by the demand band); only the tiny bucket-totals window may be
    unpartitioned."""
    pairs = [(f"h{i}", (i * 37) % 101 + 1) for i in range(200)]
    df = spark.createDataFrame(pairs, "host string, demand long")
    plan = water_fill(df)._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.split("\n"):
        if "row_number()" in line:
            assert "windowspecdefinition(bucket" in line, line
