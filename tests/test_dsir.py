"""DSIR importance weights: pure-python reference (hash + smoothing +
log-ratio sum) and the broadcast-dimension plan shape."""

from __future__ import annotations

import hashlib
import math

from deepee_spark.operators.dsir import (
    N_BUCKETS,
    bucket_logratio,
    hashed_feature_counts,
    importance_weights,
)

TEXTS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "completely different words entirely here"),
    (3, "the cat and the dog"),
    (4, "cat cat cat"),
    (5, "one"),
]
TARGET_IDS = {0, 3, 4}  # cat-heavy target slice


def _md5_48(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


def _feats(text: str) -> list[str]:
    t = [w for w in text.split(" ") if w]
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _ref_weights(texts, target_ids, B=N_BUCKETS):
    from collections import Counter

    doc_b = {
        d: Counter(_md5_48(f) % B for f in _feats(t)) for d, t in texts
    }
    raw = Counter()
    tgt = Counter()
    for d, c in doc_b.items():
        raw.update(c)
        if d in target_ids:
            tgt.update(c)
    tott, totr = sum(tgt.values()), sum(raw.values())
    logr = {
        b: math.log(
            ((tgt.get(b, 0) + 1) * (totr + B))
            / ((raw.get(b, 0) + 1) * (tott + B))
        )
        for b in range(B)
    }
    return {
        d: (
            sum(c.values()),
            round(sum(n * logr[b] for b, n in c.items()), 6),
        )
        for d, c in doc_b.items()
    }


def test_dsir_matches_reference(spark):
    docs = spark.createDataFrame(TEXTS, "doc_id: long, text: string")
    dc = hashed_feature_counts(docs).localCheckpoint()
    target = dc.filter(dc.doc_id.isin(list(TARGET_IDS)))
    lr = bucket_logratio(target, dc)
    got = {
        r.doc_id: (r.n_feats, r.logw)
        for r in importance_weights(dc, lr).collect()
    }
    want = _ref_weights(TEXTS, TARGET_IDS)
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0]
        assert abs(got[d][1] - want[d][1]) < 1e-6
    # target-slice docs must outscore the unrelated doc
    assert got[4][1] > got[2][1]


def test_dsir_logratio_is_broadcast(spark):
    import io
    from contextlib import redirect_stdout

    docs = spark.createDataFrame(TEXTS, "doc_id: long, text: string")
    dc = hashed_feature_counts(docs)
    lr = bucket_logratio(dc.filter("doc_id = 0"), dc)
    buf = io.StringIO()
    with redirect_stdout(buf):
        importance_weights(dc, lr).explain("formatted")
    plan = buf.getvalue()
    # the B-row model joins the corpus side as a broadcast, never a
    # corpus-wide sort-merge
    assert "BroadcastHashJoin" in plan


def test_gumbel_topk_is_weight_biased_and_deterministic(spark):
    """High-logw docs must be selected far more often than low-logw
    ones, and two invocations must pick the identical set."""
    from deepee_spark.operators.dsir import gumbel_topk

    rows = [(i, 5.0 if i < 50 else -5.0) for i in range(1000)]
    w = spark.createDataFrame(rows, "doc_id: long, logw: double")
    sel = gumbel_topk(w, k=60).collect()
    ids = {r.doc_id for r in sel}
    assert len(ids) == 60
    # logw gap of 10 nats dwarfs Gumbel noise: all 50 heavy docs chosen
    assert sum(1 for i in ids if i < 50) == 50
    again = {r.doc_id for r in gumbel_topk(w, k=60).collect()}
    assert ids == again
