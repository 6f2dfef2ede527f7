"""SC7/SC8: BasicTokenizer + WordPiece + alignment maps
(functions/wordpiece.py) — hand-computed fixtures for the reference's
edge semantics (QAEE tokenization.py:201-376) plus Spark-UDF parity with
the single-process path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deepee_spark.functions.wordpiece import (
    UNK_TOKEN,
    basic_tokenize,
    full_tokenize,
    tokenize_column,
    wordpiece_tokenize,
)


def test_basic_tokenize_edges():
    # whitespace cleanup + lowercase + punctuation split
    assert basic_tokenize("Hello, World!") == ["hello", ",", "world", "!"]
    # CJK chars isolate one-per-token
    assert basic_tokenize("ab北京cd") == ["ab", "北", "京", "cd"]
    # accents stripped after NFD
    assert basic_tokenize("Café") == ["cafe"]
    # control chars dropped, NBSP is whitespace
    assert basic_tokenize("a\x00b c") == ["ab", "c"]
    # consecutive punctuation splits into single chars
    assert basic_tokenize("a--b") == ["a", "-", "-", "b"]


def test_wordpiece_greedy_longest_match():
    vocab = {"un", "##aff", "##able", "##ff", "##a", "able", "unaffable"}
    # full-word match wins outright
    assert wordpiece_tokenize("unaffable", vocab) == ["unaffable"]
    # greedy longest-first decomposition
    assert wordpiece_tokenize("unaffably", vocab | {"##ly", "##b"}) == [
        "un", "##aff", "##a", "##b", "##ly",
    ]
    # unmatchable -> [UNK] for the WHOLE word (reference semantics)
    assert wordpiece_tokenize("xyz", vocab) == [UNK_TOKEN]
    assert wordpiece_tokenize("a" * 101, vocab) == [UNK_TOKEN]


def test_alignment_maps():
    vocab = {"mark", "##ed", "fall", "##s", UNK_TOKEN}
    out = full_tokenize("Marked falls!", vocab)
    assert out["orig_tokens"] == ["marked", "falls", "!"]
    assert out["sub_tokens"] == ["mark", "##ed", "fall", "##s", UNK_TOKEN]
    # SC8: sub -> orig
    assert out["tok_to_orig"] == [0, 0, 1, 1, 2]
    # orig -> FIRST sub (QAEE trigger path keeps only the first subtoken)
    assert out["orig_to_tok"] == [0, 2, 4]


def test_spark_udf_matches_single_process(spark):
    from deepee_spark.functions.wordpiece import default_vocab

    texts = [
        "officials said troops attacked the convoy near Baghdad.",
        "Café-goers in 北京 watched.",
        "",
        "zzzzqqq unknownword",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    got = {
        r["i"]: r["tk"].asDict()
        for r in df.select("i", tokenize_column(F.col("text")).alias("tk")).collect()
    }
    v = default_vocab()
    for i, t in enumerate(texts):
        want = full_tokenize(t, v)
        assert got[i]["orig_tokens"] == want["orig_tokens"]
        assert got[i]["sub_tokens"] == want["sub_tokens"]
        assert got[i]["tok_to_orig"] == want["tok_to_orig"]
        assert got[i]["orig_to_tok"] == want["orig_to_tok"]


def test_load_vocab_file(tmp_path):
    # reference vocab.txt format: one piece per line, order = id
    from deepee_spark.functions.wordpiece import (
        load_vocab_file,
        load_vocab_ids,
        wordpiece_tokenize,
    )

    p = tmp_path / "vocab.txt"
    p.write_text(
        "[UNK]\nun\n##err\n##ing\nerr\n\n  spaced  \nun\n",
        encoding="utf-8",
    )
    vocab = load_vocab_file(str(p))
    assert vocab == frozenset(
        {"[UNK]", "un", "##err", "##ing", "err", "spaced"}
    )
    # ids: 0-based line numbers, first occurrence wins, blanks keep
    # their line slot (they are skipped, not renumbered)
    ids = load_vocab_ids(str(p))
    assert ids == {
        "[UNK]": 0, "un": 1, "##err": 2, "##ing": 3, "err": 4,
        "spaced": 6,
    }
    assert wordpiece_tokenize("unerring", vocab) == ["un", "##err", "##ing"]
    assert wordpiece_tokenize("missing", vocab) == ["[UNK]"]
