"""Deterministic kernel weights + the shared word vocabulary.

The reference evaluates frozen trained checkpoints (DMCNN
train_trigger.py:165-169; EEGCN main.py:146-148). We have no GPUs or
training loop in scope (SURVEY.md non-goals), so our frozen checkpoint is
*constructed*: embeddings encode the ontology (trigger words -> event-class
one-hot block, gazetteer words -> entity-type one-hot block) and the output
layers are wired so the genuine forward pass (conv, pooling, BiLSTM,
bilinear scoring — all real NumPy math) recovers the labels. A small
seeded perturbation keeps the computation non-degenerate without flipping
any argmax. Both the Spark kernels and the single-process oracle load the
same arrays, so triple agreement is measured against identical weights
(BASELINE.md §2).

Vocabulary: ids follow the A1 count-free deterministic variant — specials
first, then sorted(word) — stable across partitions (the corpus-derived A1
build with the exact (-count, token) tie-break lives in operators/vocab.py
and is tested separately; the kernel vocab is ontology-scoped and fixed).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ontology import (
    ENTITY_GAZETTEER,
    ENTITY_TYPE_TO_ID,
    ENTITY_TYPES,
    EVENT_TYPE_TO_ID,
    NUM_EVENT_CLASSES,
    NUM_ROLE_CLASSES,
    ROLE_TO_ID,
    TRIGGER_LEXICON,
    role_for,
)

PAD, UNK = "<PAD>", "<UNK>"
EMB_SCALE = 4.0
NOISE = 1e-3
N_ENT = len(ENTITY_TYPES)
# embedding layout: [ event-class block (34) | entity-type block (9) ]
EMB_DIM = NUM_EVENT_CLASSES + N_ENT
CONV_FILTERS = 16
HIDDEN = 16  # BiLSTM hidden per direction


@lru_cache(maxsize=1)
def kernel_vocab() -> dict[str, int]:
    words = sorted(set(TRIGGER_LEXICON) | set(ENTITY_GAZETTEER))
    vocab = {PAD: 0, UNK: 1}
    for w in words:
        vocab[w] = len(vocab)
    return vocab


@lru_cache(maxsize=1)
def embedding_table() -> np.ndarray:
    """(V, EMB_DIM) float32. Row = class/type one-hot blocks, scaled."""
    vocab = kernel_vocab()
    rng = np.random.default_rng(7)
    emb = rng.normal(0.0, NOISE, size=(len(vocab), EMB_DIM)).astype(np.float32)
    for w, idx in vocab.items():
        ev = TRIGGER_LEXICON.get(w)
        emb[idx, EVENT_TYPE_TO_ID[ev] if ev else 0] += EMB_SCALE
        if w in ENTITY_GAZETTEER:
            et, _ = ENTITY_GAZETTEER[w]
            emb[idx, NUM_EVENT_CLASSES + ENTITY_TYPE_TO_ID[et]] += EMB_SCALE
    emb[0] = 0.0  # PAD
    return emb


@lru_cache(maxsize=1)
def trigger_weights() -> dict[str, np.ndarray]:
    """DMCNN-style trigger scorer parameters.

    conv:   (3, EMB_DIM, CONV_FILTERS)  small seeded values (non-degenerate
            compute path; pooled features contribute ~NOISE-scale logits)
    w_out:  (2*CONV_FILTERS + 3*EMB_DIM, NUM_EVENT_CLASSES)
            identity wiring from the *center* lexical block's event-class
            sub-block -> logits; everything else ~0.
    """
    rng = np.random.default_rng(11)
    conv = rng.normal(0.0, NOISE, size=(3, EMB_DIM, CONV_FILTERS)).astype(np.float32)
    in_dim = 2 * CONV_FILTERS + 3 * EMB_DIM
    w_out = rng.normal(0.0, NOISE, size=(in_dim, NUM_EVENT_CLASSES)).astype(np.float32)
    center_off = 2 * CONV_FILTERS + EMB_DIM  # lexical block order: t-1, t, t+1
    for c in range(NUM_EVENT_CLASSES):
        w_out[center_off + c, c] += 1.0
    b_out = np.zeros(NUM_EVENT_CLASSES, dtype=np.float32)
    return {"conv": conv, "w_out": w_out, "b_out": b_out}


@lru_cache(maxsize=1)
def argument_weights() -> dict[str, np.ndarray]:
    """BiLSTM + bilinear role scorer parameters.

    BiLSTM: h_t = tanh(W x_t + U h_{t-1} + b); W = 0.5*I-ish on the
    entity-type block into the first N_ENT hidden dims, U small seeded.
    Bilinear: logits[r] = ev_onehot^T A[r] feat(h) with
    A[r][ev, et] = 1 iff role_for(ev, et) == r.
    """
    rng = np.random.default_rng(13)
    w_ih = rng.normal(0.0, NOISE, size=(EMB_DIM, HIDDEN)).astype(np.float32)
    for j in range(min(N_ENT, HIDDEN)):
        w_ih[NUM_EVENT_CLASSES + j, j] += 0.5
    u_hh = rng.normal(0.0, NOISE, size=(HIDDEN, HIDDEN)).astype(np.float32)
    b_h = np.zeros(HIDDEN, dtype=np.float32)
    # map hidden -> entity-type feature (identity on first N_ENT dims)
    w_feat = rng.normal(0.0, NOISE, size=(2 * HIDDEN, N_ENT)).astype(np.float32)
    for j in range(N_ENT):
        w_feat[j, j] += 0.5
        w_feat[HIDDEN + j, j] += 0.5
    a = np.full(
        (NUM_ROLE_CLASSES, NUM_EVENT_CLASSES, N_ENT), -1.0, dtype=np.float32
    )
    for ev, ev_id in EVENT_TYPE_TO_ID.items():
        if ev == "O":
            continue
        for et, et_id in ENTITY_TYPE_TO_ID.items():
            r = ROLE_TO_ID[role_for(ev, et)]
            a[r, ev_id, et_id] = 1.0
    return {"w_ih": w_ih, "u_hh": u_hh, "b_h": b_h, "w_feat": w_feat, "a": a}
