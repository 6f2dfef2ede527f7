"""BPE merge learning (operators/bpe) vs an independent single-process
reference implementation of Sennrich-style BPE, plus the DuckDB oracle
twin on the same fixture."""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pytest

from deepee_spark.operators.bpe import (
    learn_merges,
    learn_merges_oracle_sql,
    segment_words,
    word_counts,
)

_TEXTS = [
    "the banana band banned bandanas",
    "a banana and a bandana in the band",
    "aaaaa aaa aa banana",  # overlap chains for the l==r case
    "The Band BANNED bananas!",  # case folding + punctuation stripped
    "low lower lowest newer newest wider wide",  # the classic BPE example
]


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(re.findall("[a-z]+", t.lower()))
    return c


def _ref_apply(syms, l, r):
    """Greedy leftmost non-overlapping single-rule merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_learn(texts, steps):
    vocab = {w: list(w) for w in _ref_word_counts(texts)}
    cnts = _ref_word_counts(texts)
    merges = []
    for step in range(1, steps + 1):
        pairs = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnts[w]
        if not pairs:
            break
        # n DESC, left ASC, right ASC
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, n))
        vocab = {w: _ref_apply(s, l, r) for w, s in vocab.items()}
    return merges, vocab


def _docs(spark):
    return spark.createDataFrame([(t,) for t in _TEXTS], "text string")


def test_word_counts(spark):
    got = {r.word: r.cnt for r in word_counts(_docs(spark)).collect()}
    assert got == dict(_ref_word_counts(_TEXTS))


@pytest.mark.parametrize("steps", [1, 3, 6])
def test_learn_merges_vs_reference(spark, steps):
    got = [
        (r.step, r.left, r.right, r.n)
        for r in learn_merges(_docs(spark), steps=steps).orderBy("step").collect()
    ]
    ref, _ = _ref_learn(_TEXTS, steps)
    assert got == ref


def test_learn_merges_duckdb_twin(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ",".join(f"($${t}$$)" for t in _TEXTS) + ") t(text)")
    oracle = con.execute(learn_merges_oracle_sql(steps=5)).fetchall()
    got = [
        tuple(r)
        for r in learn_merges(_docs(spark), steps=5).orderBy("step").collect()
    ]
    assert got == sorted(oracle)


def test_segment_words_applies_learned_table(spark):
    merges, ref_vocab = _ref_learn(_TEXTS, 4)
    got = {
        r.word: list(r.pieces)
        for r in segment_words(
            _docs(spark), [(l, r) for _, l, r, _ in merges]
        ).collect()
    }
    assert got == ref_vocab
    # every word reassembles exactly
    for w, pieces in got.items():
        assert "".join(pieces) == w


def test_overlap_chain_is_greedy(spark):
    """aaaaa with rule (a,a) must become [aa, aa, a], not [aa, a, aa]."""
    docs = spark.createDataFrame([("aaaaa",)], "text string")
    seg = {r.word: list(r.pieces) for r in segment_words(docs, [("a", "a")]).collect()}
    assert seg == {"aaaaa": ["aa", "aa", "a"]}


def test_segment_oracle_sql_matches(spark):
    """The fixed-merge DuckDB application twin (segment_oracle_sql)
    must reproduce segment_words bit-for-bit, overlap chains included."""
    import duckdb

    from deepee_spark.operators.bpe import segment_oracle_sql

    texts = ["aaaaa table value tab", "tab table aaaa lab"]
    merges = [("t", "a"), ("ta", "b"), ("a", "a"), ("a", "l")]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r.word: (r.cnt, " ".join(r.pieces))
        for r in segment_words(docs, merges).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"('{t}')" for t in texts)
        + ") t(text)"
    )
    want = {
        w: (c, p)
        for w, c, p in con.execute(segment_oracle_sql(merges)).fetchall()
    }
    assert got == want
