"""M7/M8: BERT-style trigger tagger and span-QA kernels over wordpiece
subtokens, as batched NumPy inference with constructed frozen weights.

Reference semantics re-realized (not ported):
  * M7 trigger tagger — QAEE/code/modeling.py:1163-1233
    (BertForTokenClassification shape: encoder states -> per-subtoken
    event-class logits; predictions read at FIRST subtokens only,
    run_trigger_qa.py:136,150).
  * M8 span QA — QAEE/code/modeling.py BertForQuestionAnswering +
    run_args_qa.py:216-426 make_predictions; RCEE/QuestionAnswering/
    util.py:207-223 n-best start/end decode with null (no-answer)
    comparison against the [CLS] score.
  * SC16 assembly — [CLS] question [SEP] sentence [SEP] with segment
    ids and a FIXED padded query length (QAEE max_query_length), fed
    as one id matrix.

As with kernels/weights.py, the frozen checkpoint is CONSTRUCTED: the
forward pass is genuine transformer math — token/position embeddings,
scaled-dot-product softmax attention (three heads), a ReLU feed-forward
block, residual connections, linear output heads — and the weights are
wired so that information demonstrably flows through the mechanisms:

  head A ("successor"): position-one-hot Q/K attends each piece to its
    right neighbour and copies the neighbour's wordpiece-continuation
    flag — the tagger uses it to reject a trigger-word piece that is
    merely the first piece of a longer word ("attack" in "attacked…"
    when "attacked" is out-of-vocab and splits).
  head B ("question broadcast"): every token attends (uniformly, via a
    segment-0 key) to the padded question and receives its event-class
    vector — the bracketed trigger word in the question is the only
    event-class source.
  FFN: 306 ReLU units, one per (event, entity-type) pair, each firing
    iff the token carries that entity type AND the broadcast question
    event is that event; the second layer writes one-hot
    role_for(event, entity_type) into the role block. This is the
    bilinear role rule of kernels/weights.py argument_weights realized
    as a feed-forward lookup.
  head C ("role match"): Q = scaled role block, K = role block, V sums
    role mass into a match flag — a token's match flag goes to ~1 iff
    its FFN-derived role equals the role word asked in the question.

Output heads are linear reads: tagger logits from the token's own event
block gated by the continuation flags; start/end logits from the match
flag with the [CLS] null dim as the no-answer threshold.

Small seeded noise on every weight matrix keeps the computation
non-degenerate; all decision margins are >= 0.4 against noise-scale
perturbations (asserted by tests/test_bert_kernels.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..ontology import (
    ENTITY_GAZETTEER,
    ENTITY_TYPE_TO_ID,
    EVENT_TYPE_TO_ID,
    NUM_EVENT_CLASSES,
    ROLE_TO_ID,
    TRIGGER_LEXICON,
    role_for,
)

N_ENT = len(ENTITY_TYPE_TO_ID)
N_ROLE = len(ROLE_TO_ID)

# ---- dimension layout -------------------------------------------------------
EV0 = 0                                # event-class block, token-OWN (34, 0=O)
EVC0 = EV0 + NUM_EVENT_CLASSES         # event-class CONTEXT block (head B out)
ENT0 = EVC0 + NUM_EVENT_CLASSES        # entity-type block (9)
ROLE0 = ENT0 + N_ENT                   # role block: QUESTION role word (23)
ROLEP0 = ROLE0 + N_ROLE                # role block: FFN-PREDICTED role (23)
CONT = ROLEP0 + N_ROLE                 # '##' continuation flag
SEG0 = CONT + 1                        # segment-0 marker (CLS+question+SEP)
MATCH = SEG0 + 1                       # role-match flag (written by head C)
NULLD = MATCH + 1                      # [CLS] null dim
ONES = NULLD + 1                       # constant 1 on every token
NEXTC = ONES + 1                       # successor's continuation (head A out)
POS0 = NEXTC + 1                       # position one-hot block
MAX_SEQ = 96
D = POS0 + MAX_SEQ

QUERY_LEN = 16                         # fixed padded question length
MAX_ANSWER_LEN = 4
N_BEST = 20
NOISE = 1e-3

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"

TEMPLATE_WORDS = ["what", "is", "the", "of", "event", "triggered", "by", "in"]


def question_tokens(role: str, trigger_word: str) -> list[str]:
    """SC15 question construction: the template's basic-token sequence.
    Event identity rides on the bracketed trigger word; the role word is
    the single role-block carrier."""
    return (
        ["what", "is", "the", role.lower(), "of", "the", "event",
         "triggered", "by", "[", trigger_word, "]", "?"]
    )


def question_tokens_variant(
    role: str, trigger_word: str, variant: int
) -> list[str]:
    """QAEE's 6-per-role question-template variants, mapped to this
    engine's closed question vocabulary (QAEE run_args_qa.py:181-214
    builds 6 forms per role from arg_queries.csv: the role name, the
    normal query, the description query, each with and without
    '... in [trigger]'; [trigger] is substituted at instance-forming
    time, run_args_qa.py:111-112). Trigger-ful forms follow the
    reference's derivation rule exactly: strip the trailing '?', append
    'in [ trigger ] ?'. The default flow form (question_tokens) keeps
    the richest 'triggered by' phrasing."""
    r = role.lower()
    trig_tail = ["in", "[", trigger_word, "]"]
    if variant == 0:                       # 0: role name
        return [r]
    if variant == 1:                       # 1: role name + trigger
        return [r] + trig_tail
    if variant == 2:                       # 2: normal query
        return ["what", "is", "the", r, "?"]
    if variant == 3:                       # 3: normal query + trigger
        return ["what", "is", "the", r] + trig_tail + ["?"]
    if variant == 4:                       # 4: description query
        return ["what", "is", "the", r, "of", "the", "event", "?"]
    if variant == 5:                       # 5: description query + trigger
        return (
            ["what", "is", "the", r, "of", "the", "event"]
            + trig_tail
            + ["?"]
        )
    raise ValueError(f"template variant must be 0..5, got {variant}")


def refine_span(
    orig_start: int, orig_end: int, entity_spans: list[tuple[int, int]]
) -> tuple[int, int] | None:
    """RCEE entity refinement (RCEE/QuestionAnswering/util.py:230-248):
    snap a predicted answer span (ORIG-token space) to the first entity
    span it touches — same-start, same-end, or either endpoint strictly
    inside — returning the FULL entity span; None when no entity
    overlaps (the reference emits no prediction in that case)."""
    for s, t in entity_spans:
        if (
            orig_start == s
            or orig_end == t
            or s < orig_start < t
            or s < orig_end < t
        ):
            return (s, t)
    return None


@lru_cache(maxsize=1)
def bert_wordpiece_vocab() -> frozenset:
    """Wordpiece vocab for the BERT kernels: the shared constructed vocab
    plus role words and question-template words (so questions tokenize
    into whole pieces)."""
    from ..functions.wordpiece import default_vocab

    roles = {r.lower() for r in ROLE_TO_ID}
    punct = {"[", "]", "?"}
    return frozenset(set(default_vocab()) | roles | set(TEMPLATE_WORDS) | punct)


@lru_cache(maxsize=1)
def bert_vocab() -> dict[str, int]:
    vocab = {PAD: 0, UNK: 1, CLS: 2, SEP: 3}
    for p in sorted(bert_wordpiece_vocab()):
        if p not in vocab:
            vocab[p] = len(vocab)
    return vocab


@lru_cache(maxsize=1)
def piece_embeddings() -> np.ndarray:
    """(V, D) float32 static piece embeddings: one-hot knowledge blocks
    + flags. Position / segment dims are added at assembly time."""
    vocab = bert_vocab()
    rng = np.random.default_rng(20260817)
    emb = rng.normal(0.0, NOISE, size=(len(vocab), D)).astype(np.float32)
    emb[:, POS0:] = 0.0  # position dims are assembly-owned
    role_low = {r.lower(): r for r in ROLE_TO_ID}
    for piece, idx in vocab.items():
        if piece == PAD:
            emb[idx] = 0.0
            continue
        ev = TRIGGER_LEXICON.get(piece)
        # non-trigger pieces carry the O dim so the tagger argmax has a
        # winner over weight noise (same device as weights.embedding_table)
        emb[idx, EV0 + (EVENT_TYPE_TO_ID[ev] if ev else 0)] += 1.0
        if piece in ENTITY_GAZETTEER:
            et, _ = ENTITY_GAZETTEER[piece]
            emb[idx, ENT0 + ENTITY_TYPE_TO_ID[et]] += 1.0
        if piece in role_low:
            emb[idx, ROLE0 + ROLE_TO_ID[role_low[piece]]] += 1.0
        if piece.startswith("##"):
            emb[idx, CONT] += 1.0
        if piece == CLS:
            emb[idx, NULLD] += 1.0
        emb[idx, ONES] += 1.0
    return emb


def _rngw(rng, shape):
    return rng.normal(0.0, NOISE, size=shape).astype(np.float32)


@lru_cache(maxsize=1)
def encoder_weights() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(20260818)
    w = {}
    # head A: successor. Q maps pos p -> key pos p+1, scale 30.
    wq = _rngw(rng, (D, D))
    for p in range(MAX_SEQ - 1):
        wq[POS0 + p, POS0 + p + 1] += 30.0
    wk = _rngw(rng, (D, D))
    for p in range(MAX_SEQ):
        wk[POS0 + p, POS0 + p] += 1.0
    wv = _rngw(rng, (D, D))
    wv[CONT, NEXTC] += 1.0
    w["a_q"], w["a_k"], w["a_v"] = wq, wk, wv
    # head B: question broadcast. Q = 8 * ones -> segment-0 keys.
    wq = _rngw(rng, (D, D))
    wq[ONES, SEG0] += 8.0
    wk = _rngw(rng, (D, D))
    wk[SEG0, SEG0] += 1.0
    wv = _rngw(rng, (D, D))
    for c in range(NUM_EVENT_CLASSES):
        # broadcast into the separate CONTEXT block: the FFN AND-gate must
        # see only the question's event, never the token's own ev one-hot
        wv[EV0 + c, EVC0 + c] += 1.0
    w["b_q"], w["b_k"], w["b_v"] = wq, wk, wv
    # FFN: one unit per (event != O, entity-type) pair.
    pairs = [
        (ev_id, et_id)
        for ev, ev_id in sorted(EVENT_TYPE_TO_ID.items())
        if ev != "O"
        for et, et_id in sorted(ENTITY_TYPE_TO_ID.items())
    ]
    w1 = _rngw(rng, (D, len(pairs)))
    b1 = np.full(len(pairs), -1.5, dtype=np.float32)
    w2 = _rngw(rng, (len(pairs), D))
    id_to_ev = {i: e for e, i in EVENT_TYPE_TO_ID.items()}
    id_to_et = {i: e for e, i in ENTITY_TYPE_TO_ID.items()}
    for u, (ev_id, et_id) in enumerate(pairs):
        # fires iff broadcast event ctx (~1/QTOT scaled by 2+QUERY_LEN)
        # AND own entity type AND next piece is not a continuation
        w1[EVC0 + ev_id, u] += float(2 + QUERY_LEN)
        w1[ENT0 + et_id, u] += 1.0
        w1[NEXTC, u] += -3.0
        r = ROLE_TO_ID[role_for(id_to_ev[ev_id], id_to_et[et_id])]
        # write into the PREDICTED-role block — distinct from the question
        # role word's block, so entities cannot key-match each other
        w2[u, ROLEP0 + r] += 2.0
    w["f_w1"], w["f_b1"], w["f_w2"] = w1, b1, w2
    # head C: role match. Q = 30 * PREDICTED-role block, K = the question
    # role word's own-role block, V routes question-role mass -> MATCH.
    wq = _rngw(rng, (D, D))
    wk = _rngw(rng, (D, D))
    wv = _rngw(rng, (D, D))
    for r in range(N_ROLE):
        wq[ROLEP0 + r, ROLE0 + r] += 30.0
        wk[ROLE0 + r, ROLE0 + r] += 1.0
        wv[ROLE0 + r, MATCH] += 1.0
    w["c_q"], w["c_k"], w["c_v"] = wq, wk, wv
    # output heads
    tag = _rngw(rng, (D, NUM_EVENT_CLASSES))
    tag[EV0 + 0, 0] += 4.0  # O reads the filler O dim
    for c in range(1, NUM_EVENT_CLASSES):
        tag[EV0 + c, c] += 4.0
        tag[NEXTC, c] += -8.0
        tag[CONT, c] += -8.0
    w["tag"] = tag
    for name in ("start", "end"):
        h = _rngw(rng, (D,))
        h[MATCH] += 20.0
        h[ONES] += -10.0
        h[NULLD] += 10.0
        w[name] = h
    return w


# ---- assembly (SC16) --------------------------------------------------------

def assemble(
    questions: list[list[str]] | None, sentences: list[list[str]]
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (ids (B, L), lengths (B,), segment1_start (B,), seg1_len (B,)).

    QA mode: [CLS] q[:QUERY_LEN] pad.. [SEP] s [SEP]  (fixed query slot)
    Tagger mode (questions None): [CLS] s [SEP]
    """
    vocab = bert_vocab()
    unk, pad = vocab[UNK], vocab[PAD]
    rows = []
    meta = []
    for i, sent in enumerate(sentences):
        seq = [vocab[CLS]]
        if questions is not None:
            q = [vocab.get(p, unk) for p in questions[i][:QUERY_LEN]]
            q += [pad] * (QUERY_LEN - len(q))
            seq += q
        seq.append(vocab[SEP])
        s1 = len(seq)
        body = [vocab.get(p, unk) for p in sent][: MAX_SEQ - s1 - 1]
        seq += body
        seq.append(vocab[SEP])
        rows.append(seq)
        meta.append((s1, len(body)))
    L = max(len(r) for r in rows) if rows else 1
    ids = np.full((len(rows), L), pad, dtype=np.int64)
    lengths = np.zeros(len(rows), dtype=np.int64)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        lengths[i] = len(r)
    s1s = np.array([m[0] for m in meta], dtype=np.int64)
    s1l = np.array([m[1] for m in meta], dtype=np.int64)
    return ids, lengths, s1s, s1l


def _attn(x, wq, wk, wv, key_mask):
    q = x @ wq
    k = x @ wk
    v = x @ wv
    scores = q @ k.transpose(0, 2, 1)  # (B, L, L) — BLAS batched gemm
    scores = scores + np.where(key_mask[:, None, :], 0.0, -1e9).astype(np.float32)
    scores -= scores.max(axis=2, keepdims=True)
    np.exp(scores, out=scores)
    scores /= scores.sum(axis=2, keepdims=True)
    return scores @ v


# Rows per encoder block. encode() is row-independent, so chunking is
# free semantically; what it buys is BOUNDED allocations. The FFN
# intermediate is (B*L, ~1.8k) floats — monolithic batches allocate
# hundreds of MB of FRESH pages per call, and on memory-pressured hosts
# first-touch page faults dominate the gemm itself (measured: the same
# (76k,225)@(225,1782) gemm at 0.8 GFLOPS on cold pages vs 51 GFLOPS on
# warm — a 143s vs 1.3s swing at B=2000). Chunking keeps the working
# set at ~70 MB that the allocator recycles across chunks, so only the
# first chunk per worker pays the fault cost. Same reason bounded
# batches are right at cluster scale: peak task memory is O(chunk), not
# O(arrow batch).
ENC_CHUNK = 256


def encode(
    ids: np.ndarray, lengths: np.ndarray, segment0_len: np.ndarray
) -> np.ndarray:
    """ids (B, L) -> hidden states (B, L, D). segment0_len = index of the
    first segment-1 token (CLS + padded query + SEP in QA mode; 1 in
    tagger mode — CLS and the final SEP count as segment 0 markers).

    Rows are processed in ENC_CHUNK blocks (see note above); every op
    inside _encode_block is per-row, so the output is identical to the
    monolithic call row for row."""
    B = ids.shape[0]
    if B <= ENC_CHUNK:
        return _encode_block(ids, lengths, segment0_len)
    out = None
    for i in range(0, B, ENC_CHUNK):
        blk = _encode_block(
            ids[i : i + ENC_CHUNK],
            lengths[i : i + ENC_CHUNK],
            segment0_len[i : i + ENC_CHUNK],
        )
        if out is None:
            out = np.empty((B,) + blk.shape[1:], dtype=blk.dtype)
        out[i : i + ENC_CHUNK] = blk
    return out


def _encode_block(
    ids: np.ndarray, lengths: np.ndarray, segment0_len: np.ndarray
) -> np.ndarray:
    emb = piece_embeddings()
    w = encoder_weights()
    B, L = ids.shape
    assert L <= MAX_SEQ  # assemble() truncates the body to fit
    x = emb[ids].copy()
    pos = np.arange(L)
    valid = pos[None, :] < lengths[:, None]
    # position one-hots + segment-0 marker
    x[:, :, POS0 : POS0 + L] += np.eye(L, dtype=np.float32)[None, :, :]
    seg0 = pos[None, :] < segment0_len[:, None]
    x[:, :, SEG0] += (seg0 & valid).astype(np.float32)
    x[~valid] = 0.0

    h = x
    h = h + _attn(h, w["a_q"], w["a_k"], w["a_v"], valid)
    h = h + _attn(h, w["b_q"], w["b_k"], w["b_v"], valid & seg0)
    u = np.maximum(h @ w["f_w1"] + w["f_b1"], 0.0)
    h = h + u @ w["f_w2"]
    h = h + _attn(h, w["c_q"], w["c_k"], w["c_v"], valid)
    h[~valid] = 0.0
    return h


# ---- M7: trigger tagger -----------------------------------------------------

def tag_triggers(sub_tokens: list[list[str]]):
    """-> list of per-row [(sub_pos, class_id, prob)] with class != O.
    Predictions are per SUB-token; callers apply the first-subtoken
    selection via tok_to_orig maps (run_trigger_qa.py:136,150)."""
    ids, lengths, s1s, _ = assemble(None, sub_tokens)
    h = encode(ids, lengths, s1s)
    w = encoder_weights()
    logits = h @ w["tag"]
    logits -= logits.max(axis=2, keepdims=True)
    np.exp(logits, out=logits)
    probs = logits / logits.sum(axis=2, keepdims=True)
    cls = probs.argmax(axis=2)
    out = []
    for b in range(ids.shape[0]):
        hits = []
        lo = int(s1s[b])  # body starts after [CLS][SEP]
        for t in range(lo, int(lengths[b]) - 1):
            c = int(cls[b, t])
            if c != 0:
                hits.append((t - lo, c, float(probs[b, t, c])))
        out.append(hits)
    return out


# ---- M8: span QA ------------------------------------------------------------

def qa_spans(questions: list[list[str]], sentences: list[list[str]]):
    """-> list of (answer_start_sub, answer_end_sub, span_score,
    null_score) per row; (-1, -1, ...) = no-answer. Sub indices are into
    the caller's sentence piece list. n-best decode per
    RCEE/QuestionAnswering/util.py:207-223: top starts x top ends,
    start<=end, length cap, segment-1 only, best span score compared
    against the [CLS] null score."""
    ids, lengths, s1s, s1l = assemble(questions, sentences)
    h = encode(ids, lengths, s1s)
    w = encoder_weights()
    start = h @ w["start"]
    end = h @ w["end"]
    out = []
    for b in range(ids.shape[0]):
        lo, n = int(s1s[b]), int(s1l[b])
        null_score = float(start[b, 0] + end[b, 0])
        if n == 0:
            out.append((-1, -1, -1e9, null_score))
            continue
        s_seg = start[b, lo : lo + n]
        e_seg = end[b, lo : lo + n]
        k = min(N_BEST, n)
        s_top = np.argsort(-s_seg, kind="stable")[:k]
        e_top = np.argsort(-e_seg, kind="stable")[:k]
        best = None
        for si in s_top:
            for ei in e_top:
                if ei < si or ei - si + 1 > MAX_ANSWER_LEN:
                    continue
                sc = float(s_seg[si] + e_seg[ei])
                key = (-sc, int(si), int(ei))
                if best is None or key < best[0]:
                    best = (key, int(si), int(ei), sc)
        if best is None or best[3] <= null_score:
            out.append((-1, -1, best[3] if best else -1e9, null_score))
        else:
            out.append((best[1], best[2], best[3], null_score))
    return out


def answer_text(sentence_pieces: list[str], lo: int, hi: int) -> str:
    """Reconstruct the answer surface from wordpiece span [lo, hi]."""
    if lo < 0:
        return ""
    outs = []
    for p in sentence_pieces[lo : hi + 1]:
        if p.startswith("##"):
            outs.append(p[2:])
        else:
            if outs:
                outs.append(" ")
            outs.append(p)
    return "".join(outs)
