"""TransE constructed-embedding scoring: pure-python reference parity
and the DuckDB twin."""

from __future__ import annotations

import hashlib

import duckdb

from deepee_spark.operators.kgembed import (
    EMB_DIM,
    transe_oracle_sql,
    transe_rank_objects,
)


def _emb(x, dim=EMB_DIM):
    return [
        int(hashlib.md5(f"{x}|{i}".encode()).hexdigest()[:12], 16) % 201 - 100
        for i in range(1, dim + 1)
    ]


def _ref(sps, objs, top_k=3):
    out = {}
    for s, p in sps:
        es, ep = _emb(s), _emb(p)
        scored = sorted(
            (
                (sum(abs(a + b - c) for a, b, c in zip(es, ep, _emb(o))), o)
                for o in objs
            ),
        )
        out[(s, p)] = [
            (o, e, r + 1) for r, (e, o) in enumerate(scored[:top_k])
        ]
    return out


def test_transe_matches_reference(spark):
    sps = [("u1", "likes"), ("u2", "likes"), ("u1", "bought")]
    objs = [f"item{i}" for i in range(12)]
    sp = spark.createDataFrame(sps, "subj: string, pred: string")
    cand = spark.createDataFrame([(o,) for o in objs], "obj: string")
    got = {}
    for r in transe_rank_objects(sp, cand, top_k=3).collect():
        got.setdefault((r.subj, r.pred), []).append(
            (r.obj, r.energy, r.rank)
        )
    for k in got:
        got[k].sort(key=lambda t: t[2])
    assert got == _ref(sps, objs)


def test_transe_duckdb_oracle_matches(spark):
    sps = [("u1", "likes"), ("u3", "saw")]
    objs = [f"item{i}" for i in range(9)]
    sp = spark.createDataFrame(sps, "subj: string, pred: string")
    cand = spark.createDataFrame([(o,) for o in objs], "obj: string")
    got = {
        (r.subj, r.pred, r.obj, r.energy, r.rank)
        for r in transe_rank_objects(sp, cand, top_k=2).collect()
    }
    con = duckdb.connect()
    con.register("sp_tbl", sp.toPandas())
    con.register("c_tbl", cand.toPandas())
    want = set(
        map(
            tuple,
            con.execute(
                transe_oracle_sql(
                    "SELECT subj, pred FROM sp_tbl",
                    "SELECT obj FROM c_tbl",
                    top_k=2,
                )
            ).fetchall(),
        )
    )
    assert got == want
