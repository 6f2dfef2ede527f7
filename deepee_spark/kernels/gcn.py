"""M6-style multi-order graph kernel (MOGANED lineage: model.py:28-63,
GCN.py:10-102 — BiLSTM omitted; the graph machinery is the point here).

Computation per sentence batch:
  x = emb[ids]                                   (B, L, D)
  A = dense symmetric-normalized adjacency built from the COO edge list
      (3 edge types: fwd / rev / self-loop — SC13's output shape;
      densified ONLY inside the kernel, SURVEY.md §2.8 SC14 rule)
  h_k = relu(A^k x W_k)  for orders k = 1..K    (K matmuls, A^k powers)
  alpha = softmax over orders of  (h_k . v)      (attention-weighted sum,
                                                  GCN.py attention)
  h = sum_k alpha_k h_k
  logits = h W_out + b                           (per-token classes)

All arrays float32; contractions are reshaped BLAS gemms (same discipline
as kernels/dmcnn.py). Weights constructed + seeded (kernels/weights.py
pattern): identity wiring from the event-class embedding block through
W_k and W_out keeps argmax semantics testable while every op stays real.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ontology import NUM_EVENT_CLASSES
from .weights import EMB_DIM, NOISE, embedding_table

K_ORDERS = 3
HIDDEN = EMB_DIM  # identity-wired hidden keeps the class block addressable


@lru_cache(maxsize=1)
def gcn_weights() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(17)
    w_k = rng.normal(0.0, NOISE, size=(K_ORDERS, EMB_DIM, HIDDEN)).astype(np.float32)
    for k in range(K_ORDERS):
        w_k[k] += np.eye(EMB_DIM, HIDDEN, dtype=np.float32)
    v = rng.normal(0.0, NOISE, size=(HIDDEN,)).astype(np.float32)
    v[:NUM_EVENT_CLASSES] += 1.0 / NUM_EVENT_CLASSES
    w_out = rng.normal(0.0, NOISE, size=(HIDDEN, NUM_EVENT_CLASSES)).astype(np.float32)
    for c in range(NUM_EVENT_CLASSES):
        w_out[c, c] += 1.0
    b = np.zeros(NUM_EVENT_CLASSES, dtype=np.float32)
    return {"w_k": w_k, "v": v, "w_out": w_out, "b": b}


SELF_WEIGHT = 4.0  # Ã = A + λI renormalization: keeps each node's own
# signal the row majority through propagation (a trained GCN's learned
# self-retention, expressed structurally for the constructed weights)


def densify_adjacency(
    edges_batch: list,
    lengths: np.ndarray,
    max_len: int,
    self_weight: float = SELF_WEIGHT,
) -> np.ndarray:
    """COO edge lists -> (B, L, L) row-normalized dense adjacency with
    λ-weighted self-loops. edges_batch[i] is an iterable of (etype, src,
    dst) with 0-based in-range endpoints (SC13 parse output)."""
    B = len(edges_batch)
    a = np.zeros((B, max_len, max_len), dtype=np.float32)
    for i, edges in enumerate(edges_batch):
        li = int(lengths[i])
        a[i, np.arange(li), np.arange(li)] = self_weight
        if edges is not None:
            for e in edges:
                s, d = int(e["src"]), int(e["dst"])
                if 0 <= s < li and 0 <= d < li and s != d:
                    a[i, s, d] = 1.0
        deg = a[i].sum(axis=1, keepdims=True)
        deg[deg == 0.0] = 1.0
        a[i] /= deg
    return a


def score_tokens(
    ids: np.ndarray, lengths: np.ndarray, adjacency: np.ndarray
) -> np.ndarray:
    """-> per-token class probabilities (B, L, C)."""
    emb = embedding_table()
    w = gcn_weights()
    B, L = ids.shape
    x = emb[ids]  # (B, L, D)

    h_orders = np.empty((K_ORDERS, B, L, HIDDEN), dtype=np.float32)
    ax = x
    for k in range(K_ORDERS):
        ax = adjacency @ ax  # (B, L, D) — A^(k+1) x, batched gemm
        hk = ax.reshape(B * L, EMB_DIM) @ w["w_k"][k]
        np.maximum(hk, 0.0, out=hk)
        h_orders[k] = hk.reshape(B, L, HIDDEN)

    # attention over orders: alpha (K, B, L)
    scores = np.einsum("kblh,h->kbl", h_orders, w["v"])
    scores -= scores.max(axis=0, keepdims=True)
    np.exp(scores, out=scores)
    scores /= scores.sum(axis=0, keepdims=True)
    h = (scores[..., None] * h_orders).sum(axis=0)  # (B, L, H)

    logits = (h.reshape(B * L, HIDDEN) @ w["w_out"] + w["b"]).reshape(
        B, L, NUM_EVENT_CLASSES
    )
    logits -= logits.max(axis=2, keepdims=True)
    np.exp(logits, out=logits)
    probs = logits / logits.sum(axis=2, keepdims=True)
    valid = np.arange(L)[None, :] < lengths[:, None]
    probs[~valid] = 0.0
    return probs


def decode_triggers_gcn(ids, lengths, adjacency):
    """argmax != O decode, same contract as dmcnn.decode_triggers."""
    probs = score_tokens(ids, lengths, adjacency)
    cls = probs.argmax(axis=2)
    pos = np.arange(ids.shape[1])
    hit = (cls != 0) & (pos[None, :] < lengths[:, None])
    b, t = np.nonzero(hit)
    return b, t, cls[b, t], probs[b, t, cls[b, t]]
