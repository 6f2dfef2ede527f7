"""Exact-substring dedup vs a brute-force single-process oracle."""

from __future__ import annotations

from deepee_spark.operators.dedup import MOD
from deepee_spark.operators.substrings import (
    substring_dup_spans,
    substring_dup_stats,
    window_occurrences,
)


def _tok_hash(tok: str) -> int:
    acc = 0
    for c in tok:
        acc = (acc * 31 + ord(c)) % MOD
    return acc


def _brute(docs: list[tuple[str, str]], w: int):
    """keep-first duplicated-window occurrences, pure python."""
    occ = []  # (id, pos, whash)
    n_windows = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        th = [_tok_hash(t) for t in toks]
        n = max(len(toks) - w + 1, 0)
        n_windows[doc_id] = n
        for i in range(n):
            acc = 0
            for h in th[i : i + w]:
                acc = (acc * 131 + h) % MOD
            occ.append((doc_id, i + 1, acc))
    by_hash: dict[int, list] = {}
    for o in occ:
        by_hash.setdefault(o[2], []).append(o)
    removable = []
    for group in by_hash.values():
        if len(group) >= 2:
            first = min((g[0], g[1]) for g in group)
            removable += [g for g in group if (g[0], g[1]) != first]
    return n_windows, removable


DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog today ok"),
    # d2 repeats d1's opening 10 tokens -> removable windows
    ("d2", "the quick brown fox jumps over the lazy dog today extra words"),
    ("d3", "completely different content with no shared runs at all here"),
    # d4 repeats its OWN 8-token run twice (within-doc duplication)
    ("d4", "a b c d e f g h x a b c d e f g h"),
    ("d5", "short doc"),  # fewer than w tokens -> zero windows
    ("d6", ""),  # empty
]
W = 8


def test_window_occurrences_match_brute(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r.id, r.pos, r.whash)
        for r in window_occurrences(df, "doc_id", "text", W).collect()
        if r.whash is not None
    }
    n_windows, _ = _brute(DOCS, W)
    exp = set()
    for doc_id, text in DOCS:
        toks = [t for t in text.split(" ") if t]
        th = [_tok_hash(t) for t in toks]
        for i in range(n_windows[doc_id]):
            acc = 0
            for h in th[i : i + W]:
                acc = (acc * 131 + h) % MOD
            exp.add((doc_id, i + 1, acc))
    assert got == exp
    # zero-window docs still emit one null-hash row (outer explode)
    ids = {r.id for r in window_occurrences(df, "doc_id", "text", W).collect()}
    assert ids == {d for d, _ in DOCS}


def test_dup_stats_match_brute(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    n_windows, removable = _brute(DOCS, W)
    per_doc = {}
    for doc_id, _, _ in removable:
        per_doc[doc_id] = per_doc.get(doc_id, 0) + 1
    rows = substring_dup_stats(df, "doc_id", "text", W).collect()
    assert {r.id for r in rows} == {d for d, _ in DOCS}
    for r in rows:
        assert r.n_windows == n_windows[r.id]
        assert r.n_dup_windows == per_doc.get(r.id, 0)
        exp_frac = (
            per_doc.get(r.id, 0) * 1_000_000 // n_windows[r.id]
            if n_windows[r.id]
            else 0
        )
        assert r.dup_frac_e6 == exp_frac
    # d2's copy of d1's run and d4's self-repeat are flagged; d1 keeps
    assert per_doc.get("d1", 0) == 0 and per_doc["d2"] >= 1 and per_doc["d4"] >= 1


def test_dup_spans_merge_islands(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    _, removable = _brute(DOCS, W)
    # brute-force island merge
    per_doc: dict[str, list[int]] = {}
    for doc_id, pos, _ in removable:
        per_doc.setdefault(doc_id, []).append(pos)
    exp = set()
    for doc_id, poss in per_doc.items():
        poss.sort()
        start, end = poss[0], poss[0] + W - 1
        for p in poss[1:]:
            if p <= end + 1:
                end = p + W - 1
            else:
                exp.add((doc_id, start, end))
                start, end = p, p + W - 1
        exp.add((doc_id, start, end))
    got = {
        (r.id, r.start_pos, r.end_pos)
        for r in substring_dup_spans(df, "doc_id", "text", W).collect()
    }
    assert got == exp
    # d2: the shared 10-token prefix gives windows 1..3 -> one span [1, 10]
    assert ("d2", 1, 10) in got
    # d4: its second 8-token run [10, 17] is removable, the first kept
    assert ("d4", 10, 17) in got


def test_spans_cover_exactly_the_dup_tokens(spark):
    """Rewriting by cutting the spans removes every removable window's
    tokens and nothing in a dup-free doc."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    spans = substring_dup_spans(df, "doc_id", "text", W).collect()
    assert all(s.id != "d3" for s in spans)
    assert all(s.id != "d5" for s in spans)
    for s in spans:
        assert 1 <= s.start_pos <= s.end_pos


def _winnow_py(texts, w=8, g=4):
    MOD = 1000000007

    def sh(tok):
        a = 0
        for ch in tok:
            a = (a * 31 + ord(ch)) % MOD
        return a

    out = set()
    for doc_id, text in texts:
        th = [sh(t) for t in text.split(" ") if t]
        wh = []
        for i in range(len(th) - w + 1):
            a = 0
            for h in th[i : i + w]:
                a = (a * 131 + h) % MOD
            wh.append(a)
        for j in range(len(wh) - g + 1):
            window = [(wh[j + d], j + d + 1) for d in range(g)]
            mf, mp = min(window)
            out.add((doc_id, mp, mf))
    return out


def test_winnow_matches_reference(spark):
    from deepee_spark.operators.substrings import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [
        (1, base),
        (2, base + " with a different tail of extra tokens here"),
        (3, "completely unrelated content made of other words entirely "
            "for this third document body"),
        (4, "short doc"),  # fewer than w tokens -> no windows
    ]
    df = spark.createDataFrame(texts, "doc_id: long, text: string")
    got = {
        (r.id, r.pos, r.fp)
        for r in winnow_fingerprints(df, "doc_id", "text").collect()
    }
    assert got == _winnow_py(texts)
    # guarantee: docs 1 and 2 share a long verbatim prefix -> share fps
    fp1 = {f for d, p, f in got if d == 1}
    fp2 = {f for d, p, f in got if d == 2}
    fp3 = {f for d, p, f in got if d == 3}
    assert fp1 & fp2
    assert not (fp1 & fp3)
    assert not any(d == 4 for d, p, f in got)
