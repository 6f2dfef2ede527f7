"""SC7/SC8: BERT-style tokenization + subtoken alignment maps.

Reimplements (from the published algorithm, no model weights needed):
  * BasicTokenizer: whitespace cleanup, control-char strip, CJK-char
    isolation, lowercase + accent strip, punctuation split
    (QAEE pytorch_pretrained_bert/tokenization.py:201-310 semantics)
  * WordPiece: greedy longest-match-first subword split with '##'
    continuation prefix and [UNK] fallback, max 100 chars/word
    (tokenization.py:312-376)
  * alignment maps: tok_to_orig_index / orig_to_tok_index
    (RCEE util.py:77-118; QAEE run_args_qa.py:120-140) — and the
    "first subtoken only" selection the QAEE trigger path uses
    (run_trigger_qa.py:136,150)

The vocab is a plain ordered list (broadcast once per executor); the
Spark surface is a scalar pandas UDF over a string column returning a
struct of aligned arrays. Pure functions — the pytest oracle is the
single-process call of the same code on the same strings, plus
hand-written fixtures for the edge semantics (CJK, accents, punctuation,
UNK, continuation).
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

UNK_TOKEN = "[UNK]"
MAX_WORD_CHARS = 100


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0xF900 <= cp <= 0xFAFF
    )


def basic_tokenize(text: str, lower: bool = True) -> list[str]:
    """Clean -> CJK isolate -> whitespace split -> (lower+strip accents)
    -> punctuation split. Mirrors BasicTokenizer.tokenize."""
    cleaned = []
    for ch in text:
        if ch == "\x00" or ord(ch) == 0xFFFD or _is_control(ch):
            continue
        cleaned.append(" " if _is_whitespace(ch) else ch)
    spaced = []
    for ch in cleaned:
        if _is_cjk(ch):
            spaced += [" ", ch, " "]
        else:
            spaced.append(ch)
    out: list[str] = []
    for tok in "".join(spaced).split():
        if lower:
            tok = tok.lower()
            tok = "".join(
                c for c in unicodedata.normalize("NFD", tok)
                if unicodedata.category(c) != "Mn"
            )
        # punctuation split
        cur: list[str] = []
        for ch in tok:
            if _is_punct(ch):
                if cur:
                    out.append("".join(cur))
                    cur = []
                out.append(ch)
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
    return out


def wordpiece_tokenize(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first; '##' continuation; [UNK] on failure."""
    if len(word) > MAX_WORD_CHARS:
        return [UNK_TOKEN]
    subs: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK_TOKEN]
        subs.append(cur)
        start = end
    return subs


def full_tokenize(text: str, vocab: set[str]) -> dict:
    """BasicTokenizer + WordPiece + SC8 alignment maps.

    Returns dict with:
      orig_tokens     — BasicTokenizer output
      sub_tokens      — WordPiece pieces, flattened
      tok_to_orig     — sub position -> orig token index
      orig_to_tok     — orig token index -> FIRST sub position
                        (the QAEE trigger path keeps only this one)
    """
    orig = basic_tokenize(text)
    subs: list[str] = []
    tok_to_orig: list[int] = []
    orig_to_tok: list[int] = []
    for i, w in enumerate(orig):
        orig_to_tok.append(len(subs))
        for p in wordpiece_tokenize(w, vocab):
            subs.append(p)
            tok_to_orig.append(i)
    return {
        "orig_tokens": orig,
        "sub_tokens": subs,
        "tok_to_orig": tok_to_orig,
        "orig_to_tok": orig_to_tok,
    }


def load_vocab_file(path: str) -> frozenset:
    """Load a released WordPiece vocab.txt into the broadcast set.

    File format per the published BERT release (one piece per line,
    line order = piece id; the reference ships the loader as
    QAEE pytorch_pretrained_bert/tokenization.py load_vocab): UTF-8
    lines, each stripped of surrounding whitespace; blank lines are
    skipped (a piece is never empty). Our set-based greedy matcher
    needs only membership, so the ids drop — callers that need ids use
    load_vocab_ids."""
    pieces = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            tok = line.strip()
            if tok:
                pieces.append(tok)
    return frozenset(pieces)


def load_vocab_ids(path: str) -> dict[str, int]:
    """vocab.txt -> {piece: line_index} (the reference's OrderedDict
    contract — first occurrence wins on duplicates, ids are the
    0-based line numbers including any duplicate/blank lines skipped
    per load_vocab_file's rule)."""
    ids: dict[str, int] = {}
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            tok = line.strip()
            if tok and tok not in ids:
                ids[tok] = i
    return ids


@lru_cache(maxsize=1)
def default_vocab() -> frozenset:
    """Constructed deterministic vocab: ontology words + common suffix
    pieces. Stands in for a released WordPiece vocab file (load with
    load_vocab_file — identical downstream wiring: a broadcast set)."""
    from ..ontology import ENTITY_GAZETTEER, TRIGGER_LEXICON

    base = set(TRIGGER_LEXICON) | set(ENTITY_GAZETTEER)
    pieces = set()
    for w in base:
        pieces.add(w[:4])
        if len(w) > 4:
            pieces.add("##" + w[4:])
    common = {"the", "a", "of", "and", "in", "to", "was", "is", ".", ",", "'", "s"}
    cont = {"##ing", "##ed", "##s", "##er", "##ly", "##ion"}
    return frozenset(base | pieces | common | cont | {UNK_TOKEN})


TOKENIZE_SCHEMA = T.StructType(
    [
        T.StructField("orig_tokens", T.ArrayType(T.StringType())),
        T.StructField("sub_tokens", T.ArrayType(T.StringType())),
        T.StructField("tok_to_orig", T.ArrayType(T.IntegerType())),
        T.StructField("orig_to_tok", T.ArrayType(T.IntegerType())),
    ]
)


def wordpiece_udf(vocab: frozenset | None = None):
    """Scalar pandas UDF: text -> struct of aligned token arrays. The
    vocab set is closed over (becomes one broadcast per executor)."""
    v = vocab or default_vocab()

    @pandas_udf(TOKENIZE_SCHEMA)
    def _tok(texts: pd.Series) -> pd.DataFrame:
        rows = [full_tokenize(t or "", v) for t in texts]
        return pd.DataFrame(rows)

    return _tok


def tokenize_column(col: Column, vocab: frozenset | None = None) -> Column:
    return wordpiece_udf(vocab)(col)
