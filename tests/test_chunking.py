"""Passage windowing (operators/chunking) vs an independent
single-process chunker and the DuckDB twin."""

from __future__ import annotations

import duckdb
import pytest

from deepee_spark.operators.chunking import (
    passage_windows,
    passage_windows_oracle_sql,
)

_DOCS = [
    (1, "a b c d e f g h i j"),  # 10 tokens
    (2, "one two three"),  # shorter than any window
    (3, " ".join(f"t{i}" for i in range(100))),  # long
    (4, "x"),  # single token
    (5, "exact four tok doc"),  # n == window for W=4
]


def _ref_windows(docs, W, S):
    out = []
    for doc_id, text in docs:
        toks = text.strip().split()
        n = len(toks)
        last = max(n - W, 0)
        starts = [s for s in range(0, last, S)] + [last]
        for i, s in enumerate(starts):
            out.append(
                (doc_id, i, s, min(W, n - s), " ".join(toks[s : s + W]))
            )
    return sorted(out)


@pytest.mark.parametrize("W,S", [(4, 2), (4, 4), (64, 48), (8, 3)])
def test_vs_reference(spark, W, S):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in passage_windows(df, W, S).collect())
    assert got == _ref_windows(_DOCS, W, S)


def test_full_coverage_no_overcount(spark):
    """Every token index is inside >=1 window; the tail is covered
    exactly once by the clamped last window."""
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    rows = passage_windows(df, 4, 2).collect()
    for doc_id, text in _DOCS:
        n = len(text.split())
        covered = set()
        for r in rows:
            if r.doc_id == doc_id:
                covered |= set(range(r.start_tok, r.start_tok + r.n_tok))
        assert covered == set(range(n))


def test_duckdb_twin(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, $${t}$$)" for i, t in _DOCS)
        + ") t(doc_id, text)"
    )
    for W, S in [(4, 2), (8, 3)]:
        oracle = sorted(
            tuple(r)
            for r in con.execute(
                passage_windows_oracle_sql("SELECT * FROM d", W, S)
            ).fetchall()
        )
        df = spark.createDataFrame(_DOCS, "doc_id long, text string")
        got = sorted(tuple(r) for r in passage_windows(df, W, S).collect())
        assert got == oracle


def test_bad_stride_rejected(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        passage_windows(df, 4, 5)
    with pytest.raises(ValueError):
        passage_windows(df, 4, 0)


def test_no_shuffle(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    plan = (
        passage_windows(df, 64, 48)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
