"""Rendezvous shard assignment (operators/sharding): determinism,
balance, the minimal-remap property, and the DuckDB twin."""

from __future__ import annotations

import duckdb

from deepee_spark.operators.sharding import (
    A,
    B,
    C,
    M,
    P1,
    P2,
    assign_shards,
    assign_shards_oracle_sql,
)

N = 3000


def _ref_weight(key: int, shard: int) -> int:
    x = ((key % M) * P1 + shard * P2 + C) % M
    return (x * x % M * A + x + B) % M


def _ref_assign(key: int, k: int) -> int:
    return max(range(k), key=lambda s: (_ref_weight(key, s), -s))


def _docs(spark):
    return spark.range(0, N).withColumnRenamed("id", "doc_id")


def test_vs_reference(spark):
    got = {
        r.doc_id: (r.shard, r.weight)
        for r in assign_shards(_docs(spark), 8).collect()
    }
    for d in range(N):
        assert got[d] == (_ref_assign(d, 8), _ref_weight(d, _ref_assign(d, 8)))


def test_balance(spark):
    """No shard holds more than 1.5x its fair share at N=3000, K=8."""
    counts = (
        assign_shards(_docs(spark), 8).groupBy("shard").count().collect()
    )
    assert len(counts) == 8
    for r in counts:
        assert r["count"] < 1.5 * N / 8, (r["shard"], r["count"])


def test_minimal_remap_on_shard_add(spark):
    """K=8 -> K=9 must move only the keys shard 9 wins: measured remap
    fraction ~1/9, and every moved key moved TO the new shard."""
    a8 = {r.doc_id: r.shard for r in assign_shards(_docs(spark), 8).collect()}
    a9 = {r.doc_id: r.shard for r in assign_shards(_docs(spark), 9).collect()}
    moved = {d for d in a8 if a8[d] != a9[d]}
    assert all(a9[d] == 8 for d in moved)  # only moves into the new shard
    frac = len(moved) / N
    assert 0.05 < frac < 0.18, frac  # ~1/9 = 0.111


def test_duckdb_twin(spark):
    con = duckdb.connect()
    oracle = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            assign_shards_oracle_sql(
                f"SELECT unnest(range(0, {N})) AS doc_id", 8
            )
        ).fetchall()
    }
    got = {
        r.doc_id: (r.shard, r.weight)
        for r in assign_shards(_docs(spark), 8).collect()
    }
    assert got == oracle


def test_no_shuffle(spark):
    plan = (
        assign_shards(_docs(spark), 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
