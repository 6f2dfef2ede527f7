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


def test_gcn_kernel_shapes_and_masking():
    import numpy as np
    from deepee_spark.kernels.gcn import densify_adjacency, score_tokens
    from deepee_spark.ontology import NUM_EVENT_CLASSES

    rng = np.random.default_rng(5)
    ids = rng.integers(0, 60, size=(4, 8))
    lengths = np.array([8, 5, 3, 1])
    edges = [
        [{"etype": "fwd", "src": 0, "dst": 1}, {"etype": "rev", "src": 1, "dst": 0}],
        [{"etype": "fwd", "src": 4, "dst": 7}],  # dst out of range for len 5: ignored
        None,
        [],
    ]
    a = densify_adjacency(edges, lengths, 8)
    # row-normalized: every valid row sums to 1
    for i, li in enumerate(lengths):
        assert np.allclose(a[i, :li].sum(axis=1), 1.0)
    probs = score_tokens(ids, lengths, a)
    assert probs.shape == (4, 8, NUM_EVENT_CLASSES)
    # padded positions masked to zero
    assert probs[1, 5:].sum() == 0.0
    # valid rows are distributions
    assert np.allclose(probs[0].sum(axis=1), 1.0, atol=1e-5)


def test_gcn_trigger_recovery_and_graph_sensitivity():
    """Identity wiring recovers lexicon triggers through the graph stack;
    adjacency actually matters (a hub edge changes neighbor scores)."""
    import numpy as np
    from deepee_spark.kernels.gcn import decode_triggers_gcn, densify_adjacency, score_tokens
    from deepee_spark.kernels.weights import kernel_vocab
    from deepee_spark.ontology import EVENT_TYPE_TO_ID, TRIGGER_LEXICON

    vocab = kernel_vocab()
    w = sorted(TRIGGER_LEXICON)[0]  # a trigger word
    ev = EVENT_TYPE_TO_ID[TRIGGER_LEXICON[w]]
    ids = np.array([[vocab[w], 1, 1, 1]])  # trigger + UNK filler
    lengths = np.array([4])
    a = densify_adjacency([[]], lengths, 4)
    b, t, cls, score = decode_triggers_gcn(ids, lengths, a)
    assert (0, 0) in set(zip(b.tolist(), t.tolist()))
    hit = {(int(tt)): int(c) for bb, tt, c in zip(b, t, cls) if bb == 0}
    assert hit[0] == ev
    # graph sensitivity: connecting token 3 to the trigger changes its probs
    a2 = densify_adjacency([[{"etype": "fwd", "src": 3, "dst": 0}]], lengths, 4)
    p1 = score_tokens(ids, lengths, a)
    p2 = score_tokens(ids, lengths, a2)
    assert not np.allclose(p1[0, 3], p2[0, 3])


def test_gcn_spark_mapinpandas_parity(spark):
    """The Spark mapInPandas path must equal the single-process oracle on
    the same batch (same weights, same adjacency)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from deepee_spark.kernels.gcn import decode_triggers_gcn, densify_adjacency

    rng = np.random.default_rng(9)
    rows = []
    for i in range(64):
        li = int(rng.integers(3, 10))
        toks = rng.integers(0, 60, size=li).tolist()
        edges = [
            {"etype": "fwd", "src": int(rng.integers(0, li)), "dst": int(rng.integers(0, li))}
            for _ in range(li // 2)
        ]
        rows.append((i, toks, edges))
    schema = (
        "sid int, token_ids array<int>, "
        "edges array<struct<etype:string,src:int,dst:int>>"
    )
    df = spark.createDataFrame(rows, schema).repartition(4)

    out_schema = T.StructType(
        [
            T.StructField("sid", T.IntegerType()),
            T.StructField("pos", T.IntegerType()),
            T.StructField("cls", T.IntegerType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            n = len(pdf)
            lengths = np.array([len(s) for s in pdf["token_ids"]])
            lmax = max(int(lengths.max()), 1)
            ids = np.zeros((n, lmax), dtype=np.int64)
            for j, s in enumerate(pdf["token_ids"]):
                ids[j, : len(s)] = np.asarray(s)
            a = densify_adjacency(list(pdf["edges"]), lengths, lmax)
            b, t, cls, _ = decode_triggers_gcn(ids, lengths, a)
            sid = pdf["sid"].to_numpy()
            yield pd.DataFrame(
                {"sid": sid[b], "pos": t.astype("int32"), "cls": cls.astype("int32")}
            )

    got = {
        (r["sid"], r["pos"]): r["cls"]
        for r in df.mapInPandas(run, schema=out_schema).collect()
    }
    # single-process oracle, one sentence at a time (partitioning must not matter)
    want = {}
    for sid, toks, edges in rows:
        ids = np.array([toks])
        lengths = np.array([len(toks)])
        a = densify_adjacency([edges], lengths, len(toks))
        b, t, cls, _ = decode_triggers_gcn(ids, lengths, a)
        for tt, c in zip(t, cls):
            want[(sid, int(tt))] = int(c)
    assert got == want


def test_masked_pooling_kernel_bitwise_equals_cummax_path():
    """M3 parity: the AD-DMBERT columnar-mask pooling kernel
    (score_masked_candidates) and the prefix/suffix-cummax kernel
    (score_all_candidates) are two realizations of the same two-part
    dynamic pooling — on the per-candidate expansion of a batch they
    must agree BITWISE (same gemm blocks in the same order)."""
    from deepee_spark.kernels.dmcnn import score_masked_candidates

    rng = np.random.default_rng(42)
    vocab_n = len(kernel_vocab())
    B, L = 7, 23
    lengths = rng.integers(5, L + 1, size=B).astype(np.int64)
    ids = np.zeros((B, L), dtype=np.int32)
    for i in range(B):
        ids[i, : lengths[i]] = rng.integers(1, vocab_n, size=lengths[i])
    ref = score_all_candidates(ids, lengths)

    rows_ids, rows_len, mls, mrs, expect = [], [], [], [], []
    for b in range(B):
        for t in range(int(lengths[b])):
            rows_ids.append(ids[b])
            rows_len.append(lengths[b])
            mls.append((np.arange(L) <= t).astype(np.float32))
            mrs.append((np.arange(L) > t).astype(np.float32))
            expect.append(ref[b, t])
    probs = score_masked_candidates(
        np.array(rows_ids), np.array(rows_len), np.array(mls), np.array(mrs)
    )
    assert np.array_equal(probs, np.array(expect))


def test_multilabel_type_multihot_single_label_parity():
    """M10: a filler token with a single-type multihot decodes the same
    role as the gazetteer word whose embedding carries that type."""
    from deepee_spark.kernels.bilstm import decode_roles
    from deepee_spark.kernels.weights import N_ENT, kernel_vocab
    from deepee_spark.ontology import (
        ENTITY_GAZETTEER,
        ENTITY_TYPE_TO_ID,
        EVENT_TYPE_TO_ID,
        TRIGGER_LEXICON,
        role_for,
    )

    vocab = kernel_vocab()
    trig = "merged"
    ev_id = EVENT_TYPE_TO_ID[TRIGGER_LEXICON[trig]]
    gaz = "washington"
    et_id = ENTITY_TYPE_TO_ID[ENTITY_GAZETTEER[gaz][0]]
    L = 5
    ids_gaz = np.array([[vocab[trig], vocab[gaz], 1, 1, 1]])
    ids_fill = np.array([[vocab[trig], 1, 1, 1, 1]])  # UNK at arg pos
    lengths = np.array([L])
    mh = np.zeros((1, L, N_ENT), dtype=np.float32)
    mh[0, 1, et_id] = 1.0
    role_gaz, _ = decode_roles(ids_gaz, lengths, np.array([ev_id]), np.array([1]))
    role_mh, _ = decode_roles(
        ids_fill, lengths, np.array([ev_id]), np.array([1]), type_multihot=mh
    )
    expected = role_for(TRIGGER_LEXICON[trig], ENTITY_GAZETTEER[gaz][0])
    from deepee_spark.ontology import ROLE_TO_ID

    assert role_gaz[0] == role_mh[0] == ROLE_TO_ID[expected]


def test_multilabel_overlapping_mentions_sum():
    """M10: a token covered by TWO mention types scores both types'
    roles above every other role (summed type embeddings)."""
    from deepee_spark.kernels.bilstm import score_roles
    from deepee_spark.kernels.weights import N_ENT, kernel_vocab
    from deepee_spark.ontology import (
        EVENT_TYPE_TO_ID,
        ENTITY_TYPE_TO_ID,
        ROLE_TO_ID,
        TRIGGER_LEXICON,
        role_for,
    )

    vocab = kernel_vocab()
    trig = "merged"
    ev = TRIGGER_LEXICON[trig]
    ev_id = EVENT_TYPE_TO_ID[ev]
    et_a, et_b = "GPE", "PER"
    ra, rb = ROLE_TO_ID[role_for(ev, et_a)], ROLE_TO_ID[role_for(ev, et_b)]
    assert ra != rb
    L = 4
    ids = np.array([[vocab[trig], 1, 1, 1]])
    mh = np.zeros((1, L, N_ENT), dtype=np.float32)
    mh[0, 1, ENTITY_TYPE_TO_ID[et_a]] = 1.0
    mh[0, 1, ENTITY_TYPE_TO_ID[et_b]] = 1.0
    logits = score_roles(
        ids, np.array([L]), np.array([ev_id]), np.array([1]), type_multihot=mh
    )[0]
    top2 = set(np.argsort(-logits)[:2])
    assert top2 == {ra, rb}


def test_gated_gcn_trigger_recovery_and_type_sensitivity():
    """M5: the gated multi-edge-type kernel recovers lexicon triggers,
    and zeroing the SELF edge type (the carrying path) changes the
    output — the per-type decomposition is real."""
    from deepee_spark.kernels.gcn import (
        decode_triggers_gated,
        densify_adjacency_by_type,
        score_tokens_gated,
    )
    from deepee_spark.ontology import ID_TO_EVENT_TYPE, TRIGGER_LEXICON

    v = kernel_vocab()
    sent = ["the", "table", "merged", "fast", "washington"]
    ids = np.array([[v.get(w, 1) for w in sent]])
    lengths = np.array([5])
    edges = [[{"src": 1, "dst": 2}, {"src": 3, "dst": 2},
              {"src": 4, "dst": 2}, {"src": 0, "dst": 1}]]
    adj = densify_adjacency_by_type(edges, lengths, 5)
    _b, t, c, s = decode_triggers_gated(ids, lengths, adj)
    assert [(int(x), ID_TO_EVENT_TYPE[int(y)]) for x, y in zip(t, c)] == [
        (2, TRIGGER_LEXICON["merged"])
    ]
    assert s[0] > 0.4
    adj_noself = adj.copy()
    adj_noself[2] = 0.0
    p_full = score_tokens_gated(ids, lengths, adj)
    p_noself = score_tokens_gated(ids, lengths, adj_noself)
    assert not np.allclose(p_full, p_noself)


def test_edge_aware_gcn_recovery_and_edge_update_sensitivity():
    """M4: edge-aware kernel recovers triggers; relabeling the self
    edges (the attention anchor the EDGE UPDATE produces) changes the
    scores — edge representations demonstrably drive aggregation."""
    from deepee_spark.kernels.gcn import (
        decode_triggers_edge_aware,
        densify_edge_labels,
        score_tokens_edge_aware,
    )
    from deepee_spark.ontology import ID_TO_EVENT_TYPE, TRIGGER_LEXICON

    v = kernel_vocab()
    sent = ["the", "table", "merged", "fast", "washington"]
    ids = np.array([[v.get(w, 1) for w in sent]])
    lengths = np.array([5])
    edges = [[{"src": 1, "dst": 2}, {"src": 3, "dst": 2},
              {"src": 4, "dst": 2}, {"src": 0, "dst": 1}]]
    lab = densify_edge_labels(edges, lengths, 5)
    _b, t, c, _s = decode_triggers_edge_aware(ids, lengths, lab)
    assert [(int(x), ID_TO_EVENT_TYPE[int(y)]) for x, y in zip(t, c)] == [
        (2, TRIGGER_LEXICON["merged"])
    ]
    lab_swapped = lab.copy()
    diag = np.arange(5)
    lab_swapped[0, diag, diag] = 1  # self edges relabeled as plain dep
    p_full = score_tokens_edge_aware(ids, lengths, lab)
    p_swapped = score_tokens_edge_aware(ids, lengths, lab_swapped)
    assert not np.allclose(p_full, p_swapped)


def test_k3_checkpoint_roundtrip_bitwise(spark, catalog):
    """K3: the frozen checkpoint published through StageCatalog restores
    BITWISE — every tensor and the vocabulary — and versions like any
    snapshot (a second publish bumps snapshot, latest wins)."""
    import numpy as np

    from deepee_spark.kernels.checkpoint import (checkpoint_weights,
                                                 load_checkpoint)
    from deepee_spark.kernels.weights import (argument_weights,
                                              embedding_table,
                                              kernel_vocab,
                                              trigger_weights)

    meta = checkpoint_weights(catalog, spark)
    assert meta["snapshot"] == 0 and meta["rows"] > 0
    tensors, vocab = load_checkpoint(catalog, spark)
    assert vocab == kernel_vocab()
    want = {
        "embedding": {"table": embedding_table()},
        "trigger": trigger_weights(),
        "argument": argument_weights(),
    }
    for comp, ts in want.items():
        for name, arr in ts.items():
            got = tensors[comp][name]
            ref = np.asarray(arr, dtype=np.float32)
            assert got.shape == ref.shape, (comp, name)
            assert got.dtype == np.float32
            assert np.array_equal(got, ref), (comp, name)  # bitwise
    # versioning: re-publish -> snapshot 1, still restores identically
    meta2 = checkpoint_weights(catalog, spark)
    assert meta2["snapshot"] == 1
    tensors2, vocab2 = load_checkpoint(catalog, spark)
    assert vocab2 == vocab
    assert np.array_equal(tensors2["trigger"]["w_out"],
                          tensors["trigger"]["w_out"])


def test_viterbi_tiebreak_is_backward_lexicographic_minimum():
    """Pins the property the m2_viterbi_roles oracle relies on: among
    all maximal-score paths, numpy argmax-first backpointers select the
    lexicographic MINIMUM reading labels from the LAST step backwards.
    Randomized small-integer emissions force frequent ties."""
    import itertools

    import numpy as np

    from deepee_spark.kernels.bilstm import viterbi_decode

    rng = np.random.default_rng(20260821)
    L, C = 4, 3
    trans = rng.integers(-2, 3, size=(C, C)).astype(np.float64)
    for _case in range(200):
        em = rng.integers(0, 4, size=(1, L, C)).astype(np.float64)
        got = tuple(viterbi_decode(em, trans)[0])
        best = None
        for path in itertools.product(range(C), repeat=L):
            tot = sum(em[0, t, path[t]] for t in range(L)) + sum(
                trans[path[t], path[t + 1]] for t in range(L - 1)
            )
            key = (-tot,) + tuple(reversed(path))
            if best is None or key < best[0]:
                best = (key, path)
        assert got == best[1], (got, best[1], em.tolist())
