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
    """ids (B, L) int32 padded with 0, lengths (B,) -> probs (B, L, C).

    Implementation note (scale): every contraction is a single BLAS gemm on
    a (B*L, ·) view — np.einsum's non-BLAS loops were ~10x slower — and the
    output projection is applied blockwise (part1/part2/3 lexical shifts of
    one shared x@W product) instead of materializing the reference's
    concatenated feature tensor, cutting per-batch allocation ~5x. That
    matters because executors run many kernel workers concurrently: the
    memory-bandwidth footprint, not FLOPs, set the aggregate throughput.
    """
    emb = embedding_table()
    w = trigger_weights()
    B, L = ids.shape
    D = emb.shape[1]
    x = emb[ids]  # (B, L, D)
    x2 = x.reshape(B * L, D)

    # conv k=3, same padding: conv[t] = x[t-1]@c0 + x[t]@c1 + x[t+1]@c2
    c0, c1, c2 = w["conv"]
    nf = c0.shape[1]
    conv = (x2 @ c1).reshape(B, L, nf)
    conv[:, 1:] += (x2 @ c0).reshape(B, L, nf)[:, :-1]
    conv[:, :-1] += (x2 @ c2).reshape(B, L, nf)[:, 1:]
    np.maximum(conv, 0.0, out=conv)

    # mask past-length positions to -inf so they never win a max-pool
    pos = np.arange(L)
    valid = pos[None, :] < lengths[:, None]  # (B, L)
    neg = np.float32(-1e9)
    conv[~valid] = neg

    # part1[t] = max_{i<=t} conv[i]  (prefix cummax)
    part1 = np.maximum.accumulate(conv, axis=1)
    # part2[t] = max_{i>t} conv[i]   (suffix cummax shifted by one)
    suffix = np.maximum.accumulate(conv[:, ::-1], axis=1)[:, ::-1]
    part2 = np.empty_like(conv)
    part2[:, :-1] = suffix[:, 1:]
    part2[:, -1] = neg
    # empty part -> 0 (the reference's +1-trick-then-subtract achieves the
    # same "ignore empty part" effect, AD-DMBERT DMCNN/models.py:8-48)
    part1[part1 <= neg / 2] = 0.0
    part2[part2 <= neg / 2] = 0.0

    # output projection, blockwise over [part1 | part2 | lex t-1 | t | t+1]
    c = w["b_out"].shape[0]
    w_p1 = w["w_out"][:nf]
    w_p2 = w["w_out"][nf : 2 * nf]
    w_lp = w["w_out"][2 * nf : 2 * nf + D]
    w_xc = w["w_out"][2 * nf + D : 2 * nf + 2 * D]
    w_ln = w["w_out"][2 * nf + 2 * D :]
    logits = (part1.reshape(B * L, nf) @ w_p1).reshape(B, L, c)
    logits += (part2.reshape(B * L, nf) @ w_p2).reshape(B, L, c)
    logits += (x2 @ w_xc).reshape(B, L, c)
    logits[:, 1:] += (x2 @ w_lp).reshape(B, L, c)[:, :-1]  # lex window t-1
    logits[:, :-1] += (x2 @ w_ln).reshape(B, L, c)[:, 1:]  # lex window t+1
    logits += w["b_out"]

    logits -= logits.max(axis=2, keepdims=True)
    np.exp(logits, out=logits)
    probs = logits / logits.sum(axis=2, keepdims=True)
    probs[~valid] = 0.0
    return probs


def score_masked_candidates(
    ids: np.ndarray,
    lengths: np.ndarray,
    mask_l: np.ndarray,
    mask_r: np.ndarray,
) -> np.ndarray:
    """M3: the AD-DMBERT columnar-mask pooling contract (AD-DMBERT
    DMCNN/models.py:8-48; DataFormat.md:54-76): one row per (sentence,
    candidate position), the two pooling parts given EXPLICITLY as
    maskL/maskR float columns rather than derived from a split index.

    ids (B, L) int32, lengths (B,), mask_l/mask_r (B, L) float
    -> probs (B, C). The candidate anchor is recovered as
    t = sum(maskL) - 1 (maskL covers positions <= t by construction,
    featurize.part_masks). Must agree with score_all_candidates at
    (row, t) — the masked pooling and the prefix/suffix cummax are two
    realizations of the same two-part dynamic pooling; the parity test
    (tests/test_kernels.py) holds them together."""
    emb = embedding_table()
    w = trigger_weights()
    B, L = ids.shape
    D = emb.shape[1]
    x = emb[ids]
    x2 = x.reshape(B * L, D)

    c0, c1, c2 = w["conv"]
    nf = c0.shape[1]
    conv = (x2 @ c1).reshape(B, L, nf)
    conv[:, 1:] += (x2 @ c0).reshape(B, L, nf)[:, :-1]
    conv[:, :-1] += (x2 @ c2).reshape(B, L, nf)[:, 1:]
    np.maximum(conv, 0.0, out=conv)

    pos = np.arange(L)
    valid = pos[None, :] < lengths[:, None]
    neg = np.float32(-1e9)
    conv[~valid] = neg

    ml = (mask_l > 0) & valid
    mr = (mask_r > 0) & valid
    part1 = np.where(ml[:, :, None], conv, neg).max(axis=1)
    part2 = np.where(mr[:, :, None], conv, neg).max(axis=1)
    part1[part1 <= neg / 2] = 0.0
    part2[part2 <= neg / 2] = 0.0

    t = ml.sum(axis=1) - 1  # anchor position (maskL = positions <= t)
    b = np.arange(B)
    x_c = x[b, t]
    # lexical neighbours mirror the cummax path's shifted adds: the PAD
    # row of the embedding table is exactly zero, so out-of-array
    # neighbours contribute exact zeros either way
    x_p = np.where((t > 0)[:, None], x[b, np.maximum(t - 1, 0)], 0.0).astype(
        np.float32
    )
    x_n = np.where(
        (t + 1 < L)[:, None], x[b, np.minimum(t + 1, L - 1)], 0.0
    ).astype(np.float32)

    c = w["b_out"].shape[0]
    w_p1 = w["w_out"][:nf]
    w_p2 = w["w_out"][nf : 2 * nf]
    w_lp = w["w_out"][2 * nf : 2 * nf + D]
    w_xc = w["w_out"][2 * nf + D : 2 * nf + 2 * D]
    w_ln = w["w_out"][2 * nf + 2 * D :]
    logits = part1 @ w_p1
    logits += part2 @ w_p2
    logits += x_c @ w_xc
    logits += x_p @ w_lp
    logits += x_n @ w_ln
    logits += w["b_out"]

    logits -= logits.max(axis=1, keepdims=True)
    np.exp(logits, out=logits)
    return logits / logits.sum(axis=1, keepdims=True)


def decode_triggers(ids: np.ndarray, lengths: np.ndarray):
    """-> (rows, cols, class_ids, scores) for positions with argmax != O."""
    probs = score_all_candidates(ids, lengths)
    cls = probs.argmax(axis=2)  # (B, L)
    pos = np.arange(ids.shape[1])
    hit = (cls != 0) & (pos[None, :] < lengths[:, None])
    b, t = np.nonzero(hit)
    return b, t, cls[b, t], probs[b, t, cls[b, t]]
