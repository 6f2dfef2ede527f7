"""M1-style DMCNN trigger scorer, vectorized over all candidate positions.

Reference semantics (DMCNN/DMCNN.py:40-237): for candidate position t,
embed tokens, convolve (k=3), ReLU, max-pool *two parts* split at t
(part1 i<=t, part2 i>t — tensor_trigger.py:240-269), concat with the
lexical window emb(w_{t-1}),emb(w_t),emb(w_{t+1}) (DMCNN.py:56-59), then
linear -> softmax over event classes.

Spark-first twist: instead of materializing one row per (sentence,
candidate) as the reference does, we score ALL candidates of a sentence in
one pass — part1/part2 max-pools for every split point t are prefix/suffix
running maxima (O(L*F) total instead of O(L^2*F)). One Arrow batch in, one
trigger-row batch out; no shuffle.
"""

from __future__ import annotations

import numpy as np

from .weights import embedding_table, trigger_weights


def score_all_candidates(ids: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """ids (B, L) int32 padded with 0, lengths (B,) -> probs (B, L, C)."""
    emb = embedding_table()
    w = trigger_weights()
    B, L = ids.shape
    x = emb[ids]  # (B, L, D)

    # conv k=3, same padding, ReLU
    xp = np.pad(x, ((0, 0), (1, 1), (0, 0)))
    conv = (
        np.einsum("blD,Df->blf", xp[:, :-2], w["conv"][0])
        + np.einsum("blD,Df->blf", xp[:, 1:-1], w["conv"][1])
        + np.einsum("blD,Df->blf", xp[:, 2:], w["conv"][2])
    )
    np.maximum(conv, 0.0, out=conv)

    # mask past-length positions to -inf so they never win a max-pool
    pos = np.arange(L)
    valid = pos[None, :] < lengths[:, None]  # (B, L)
    neg = np.float32(-1e9)
    conv_m = np.where(valid[:, :, None], conv, neg)

    # part1[t] = max_{i<=t} conv[i]  (prefix cummax)
    part1 = np.maximum.accumulate(conv_m, axis=1)
    # part2[t] = max_{i>t} conv[i]   (suffix cummax shifted by one)
    suffix = np.maximum.accumulate(conv_m[:, ::-1], axis=1)[:, ::-1]
    part2 = np.concatenate([suffix[:, 1:], np.full_like(suffix[:, :1], neg)], axis=1)
    # empty part -> 0 (the reference's +1-trick-then-subtract achieves the
    # same "ignore empty part" effect, AD-DMBERT DMCNN/models.py:8-48)
    part1 = np.where(part1 <= neg / 2, 0.0, part1)
    part2 = np.where(part2 <= neg / 2, 0.0, part2)

    # lexical window: emb at t-1, t, t+1 (zero-padded boundaries)
    zeros = np.zeros_like(x[:, :1])
    lex_prev = np.concatenate([zeros, x[:, :-1]], axis=1)
    lex_next = np.concatenate([x[:, 1:], zeros], axis=1)
    feats = np.concatenate([part1, part2, lex_prev, x, lex_next], axis=2)

    logits = feats @ w["w_out"] + w["b_out"]
    logits -= logits.max(axis=2, keepdims=True)
    np.exp(logits, out=logits)
    probs = logits / logits.sum(axis=2, keepdims=True)
    return np.where(valid[:, :, None], probs, 0.0)


def decode_triggers(ids: np.ndarray, lengths: np.ndarray):
    """-> (rows, cols, class_ids, scores) for positions with argmax != O."""
    probs = score_all_candidates(ids, lengths)
    cls = probs.argmax(axis=2)  # (B, L)
    pos = np.arange(ids.shape[1])
    hit = (cls != 0) & (pos[None, :] < lengths[:, None])
    b, t = np.nonzero(hit)
    return b, t, cls[b, t], probs[b, t, cls[b, t]]
