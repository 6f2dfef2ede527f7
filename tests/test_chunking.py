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


# ---------------------------------------------------------------------------
# RCEE QuestionGeneration data prep (anchor windows + question stems)
# ---------------------------------------------------------------------------

_ANCHORED = [
    # (doc_id, anchor_start, anchor_end, text)
    (1, 0, 1, "a b c d e f g h i j"),     # anchor at start: lo clamps to 0
    (2, 5, 6, "a b c d e f g h i j"),     # interior
    (3, 9, 10, "a b c d e f g h i j"),    # anchor at end: hi clamps to n
    (4, 1, 3, "w x y z"),                 # multi-token span, short doc
    (5, 0, 1, "solo"),                    # single-token doc
]


def _ref_anchor(rows, before, after):
    out = set()
    for doc_id, s, e, text in rows:
        toks = text.strip().split()
        lo = max(0, s - before)
        hi = min(len(toks), e + after)
        out.add((doc_id, s, e, lo, max(hi - lo, 0),
                 " ".join(toks[lo:hi])))
    return out


def test_anchor_windows_matches_reference_slice(spark):
    from deepee_spark.operators.chunking import (
        anchor_windows,
        anchor_windows_oracle_sql,
    )

    df = spark.createDataFrame(
        _ANCHORED,
        "doc_id long, anchor_start long, anchor_end long, text string",
    )
    for before, after in [(5, 5), (2, 3), (0, 0)]:
        got = {
            (r.doc_id, r.anchor_start, r.anchor_end, r.ctx_start,
             r.n_tok, r.passage)
            for r in anchor_windows(df, before, after).collect()
        }
        assert got == _ref_anchor(_ANCHORED, before, after), (before, after)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE a(doc_id BIGINT, anchor_start BIGINT, "
            "anchor_end BIGINT, text VARCHAR)"
        )
        con.executemany("INSERT INTO a VALUES (?,?,?,?)", _ANCHORED)
        oracle = {
            tuple(r)
            for r in con.execute(
                anchor_windows_oracle_sql("SELECT * FROM a", before, after)
            ).fetchall()
        }
        assert got == oracle, (before, after)
        con.close()
    with pytest.raises(ValueError):
        anchor_windows(df, -1, 5)


_QUESTIONS = [
    (1, "What is the capital of France ?"),      # A -> 'of France ?'
    (2, "Who are the members of the board"),     # A -> 'of the board'
    (3, "Where is the treaty signed"),           # B -> 'is the treaty signed'
    (4, "When did it happen"),                   # B -> 'did it happen'
    (5, "Why is the sky blue"),                  # neither
    (6, "What was the point"),                   # A pattern but tokens[1]=was: no
    (7, "What is the answer"),                   # A but tokens[4:] empty: drop
    (8, "Where"),                                # B but rest empty: drop
    (9, "what is the lowercase start"),          # case-sensitive: no
]


def _ref_stems(rows):
    out = set()
    for q_id, q in rows:
        t = q.strip().split()
        if (len(t) >= 3 and t[0] in ("What", "Who")
                and t[1] in ("is", "are") and t[2] == "the"):
            stem = " ".join(t[4:])
            if stem:
                out.add((q_id, "head_of", stem))
        elif t and t[0] in ("Where", "When"):
            stem = " ".join(t[1:])
            if stem:
                out.add((q_id, "wh_rest", stem))
    return out


def test_question_stems_rules(spark):
    from deepee_spark.operators.chunking import (
        question_stems,
        question_stems_oracle_sql,
    )

    df = spark.createDataFrame(_QUESTIONS, "q_id long, question string")
    got = {
        (r.q_id, r.rule, r.stem) for r in question_stems(df).collect()
    }
    assert got == _ref_stems(_QUESTIONS)
    assert (1, "head_of", "of France ?") in got
    assert (3, "wh_rest", "is the treaty signed") in got
    assert not any(q in (5, 6, 7, 8, 9) for (q, _, _) in got)
    con = duckdb.connect()
    con.execute("CREATE TABLE q(q_id BIGINT, question VARCHAR)")
    con.executemany("INSERT INTO q VALUES (?,?)", _QUESTIONS)
    oracle = {
        tuple(r)
        for r in con.execute(
            question_stems_oracle_sql("SELECT * FROM q")
        ).fetchall()
    }
    assert got == oracle
    con.close()
