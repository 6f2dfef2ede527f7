"""Kernel parity: Spark mapInPandas path == single-process NumPy oracle,
plus semantic checks against the constructed ontology weights."""

from __future__ import annotations

import numpy as np

from deepee_spark.kernels.bilstm import decode_roles
from deepee_spark.kernels.dmcnn import decode_triggers, score_all_candidates
from deepee_spark.kernels.weights import kernel_vocab
from deepee_spark.ontology import (
    ENTITY_GAZETTEER,
    EVENT_TYPE_TO_ID,
    ID_TO_EVENT_TYPE,
    ID_TO_ROLE,
    TRIGGER_LEXICON,
    role_for,
)


def _ids(words, length=20):
    v = kernel_vocab()
    arr = np.zeros((1, length), dtype=np.int64)
    for i, w in enumerate(words):
        arr[0, i] = v.get(w, 1)
    return arr, np.array([len(words)], dtype=np.int64)


def test_trigger_kernel_classifies_lexicon_words():
    words = ["market", "report", "arrested", "smith", "today"]
    ids, lengths = _ids(words)
    b, t, cls, score = decode_triggers(ids, lengths)
    assert list(t) == [2]
    assert ID_TO_EVENT_TYPE[int(cls[0])] == "Justice:Arrest-Jail"
    assert 0.3 < float(score[0]) <= 1.0


def test_trigger_kernel_no_false_positives_on_filler():
    words = ["market", "report", "shows", "steady", "growth", "smith"]
    ids, lengths = _ids(words)
    b, t, cls, _ = decode_triggers(ids, lengths)
    assert len(b) == 0


def test_trigger_probs_ignore_padding():
    words = ["analysts", "expect", "attacked", "officials", "review"]
    p_short = score_all_candidates(*_ids(words, length=10))
    p_long = score_all_candidates(*_ids(words, length=50))
    np.testing.assert_allclose(p_short[0, :5], p_long[0, :5], atol=1e-6)
    assert p_long[0, 10:].sum() == 0.0  # masked past length


def test_role_kernel_matches_role_rule():
    v = kernel_vocab()
    cases = [
        ("attacked", "washington"),  # Conflict x GPE -> Place
        ("attacked", "smith"),  # Conflict x PER -> Target
        ("died", "smith"),  # Life x PER -> Victim
        ("sold", "toyota"),  # Transaction x ORG -> Seller
        ("elected", "smith"),  # Personnel x PER -> Person
    ]
    for trig, ent in cases:
        ev = TRIGGER_LEXICON[trig]
        words = ["officials", ent, trig, "yesterday", "report"]
        ids, lengths = _ids(words)
        roles, scores = decode_roles(
            ids, lengths, np.array([EVENT_TYPE_TO_ID[ev]]), np.array([1])
        )
        expected = role_for(ev, ENTITY_GAZETTEER[ent][0])
        assert ID_TO_ROLE[int(roles[0])] == expected, (trig, ent)


def test_spark_kernel_path_equals_oracle(spark):
    """mapInPandas trigger path row-for-row equals the direct NumPy call."""
    import datetime as dt

    from deepee_spark.functions.featurize import featurize_sentences
    from deepee_spark.plans.pipeline import triggers_from_sentences

    rows = [
        ("u1", dt.datetime(2026, 7, 1), "en", 0, "x", ["smith", "attacked", "beijing", "on", "tuesday"], 5),
        ("u2", dt.datetime(2026, 7, 2), "en", 0, "x", ["officials", "met", "in", "paris", "yesterday"], 5),
        ("u3", dt.datetime(2026, 7, 3), "en", 0, "x", ["no", "events", "here", "at", "all"], 5),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, lang string, sent_id int, sentence string, tokens array<string>, n_tokens int"
    )
    out = triggers_from_sentences(featurize_sentences(df))
    got = {(r["url"], r["trigger_pos"], r["event_type"]) for r in out.collect()}

    v = kernel_vocab()
    expected = set()
    for url, _ts, _lang, _sid, _s, toks, _n in rows:
        ids, lengths = _ids(toks, length=50)
        _b, t, cls, _ = decode_triggers(ids, lengths)
        for pos, c in zip(t, cls):
            expected.add((url, int(pos), ID_TO_EVENT_TYPE[int(c)]))
    assert got == expected
    assert ("u1", 1, "Conflict:Attack") in got
    assert ("u2", 1, "Contact:Meet") in got


def test_viterbi_uniform_equals_argmax():
    import numpy as np
    from deepee_spark.kernels.bilstm import viterbi_decode

    rng = np.random.default_rng(3)
    em = rng.normal(size=(7, 1, 5)).astype(np.float32)
    uniform = np.zeros((5, 5), dtype=np.float32)
    path = viterbi_decode(em, uniform)
    assert (path[:, 0] == em[:, 0].argmax(axis=1)).all()


def test_viterbi_matches_bruteforce():
    import itertools
    import numpy as np
    from deepee_spark.kernels.bilstm import viterbi_decode

    rng = np.random.default_rng(4)
    B, L, C = 3, 4, 3
    em = rng.normal(size=(B, L, C)).astype(np.float64)
    tr = rng.normal(size=(C, C)).astype(np.float64)
    got = viterbi_decode(em, tr)
    for b in range(B):
        best, best_s = None, -1e18
        for path in itertools.product(range(C), repeat=L):
            s = em[b, 0, path[0]]
            for t in range(1, L):
                s += tr[path[t - 1], path[t]] + em[b, t, path[t]]
            if s > best_s:
                best, best_s = path, s
        assert tuple(got[b]) == best
