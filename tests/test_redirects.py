"""Redirect resolution via pointer doubling (operators/redirects) vs a
single-process walker and the DuckDB recursive-CTE twin."""

from __future__ import annotations

import duckdb

from deepee_spark.operators.redirects import (
    resolve_redirects,
    resolve_redirects_oracle_sql,
)

# chains of several lengths, a shared sink, a 3-cycle, a self-loop,
# and a tail that feeds INTO a cycle (also dead)
_EDGES = [
    ("a1", "a2"), ("a2", "a3"), ("a3", "a4"), ("a4", "final_a"),
    ("b1", "final_b"),
    ("c1", "c2"), ("c2", "final_a"),  # shared sink with the a-chain
    ("x1", "x2"), ("x2", "x3"), ("x3", "x1"),  # 3-cycle
    ("s1", "s1"),  # self-loop
    ("t1", "x2"),  # tail into the cycle
] + [(f"L{i}", f"L{i+1}") for i in range(40)]  # 40-hop chain


def _ref():
    nxt = dict(_EDGES)
    out = {}
    for src in nxt:
        cur, hops, seen = nxt[src], 1, {src}
        while cur in nxt and cur not in seen and hops < 1000:
            seen.add(cur)
            cur, hops = nxt[cur], hops + 1
        if cur in nxt:  # stopped on a revisit -> cycle
            out[src] = (None, None, True)
        else:
            out[src] = (cur, hops, False)
    return out


def test_vs_reference(spark):
    df = spark.createDataFrame(_EDGES, "src string, dst string")
    got = {
        r.src: (r.final, r.hops, r.is_cycle)
        for r in resolve_redirects(df).collect()
    }
    assert got == _ref()
    assert got["a1"] == ("final_a", 4, False)
    assert got["c1"] == ("final_a", 2, False)
    assert got["x1"] == (None, None, True)
    assert got["s1"] == (None, None, True)
    assert got["t1"] == (None, None, True)
    assert got["L0"] == ("L40", 40, False)  # needs 6 doublings (2^6=64)


def test_doubling_bound_documented(spark):
    """With too few doublings a long chain degrades to is_cycle — the
    documented trade, not silent wrong data."""
    df = spark.createDataFrame(_EDGES, "src string, dst string")
    got = {
        r.src: (r.final, r.hops, r.is_cycle)
        for r in resolve_redirects(df, doublings=3).collect()
    }
    assert got["L0"] == (None, None, True)  # 40 > 2^3
    assert got["a1"] == ("final_a", 4, False)  # short chains unaffected


def test_duckdb_twin(spark):
    con = duckdb.connect()
    edges_sql = "SELECT * FROM (VALUES " + ",".join(
        f"($${s}$$, $${d}$$)" for s, d in _EDGES
    ) + ") t(src, dst)"
    oracle = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(resolve_redirects_oracle_sql(edges_sql)).fetchall()
    }
    df = spark.createDataFrame(_EDGES, "src string, dst string")
    got = {
        r.src: (r.final, r.hops, r.is_cycle)
        for r in resolve_redirects(df).collect()
    }
    assert got == oracle == _ref()
