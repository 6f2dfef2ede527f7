"""M7/M8 BERT-style kernel tests (kernels/bert.py): constructed-weight
transformer forward pass, wordpiece-aware tagging, span QA + n-best
decode, and the no-answer null comparison."""

from __future__ import annotations

import numpy as np

from deepee_spark.kernels.bert import (
    MAX_ANSWER_LEN,
    answer_text,
    assemble,
    bert_wordpiece_vocab,
    qa_spans,
    question_tokens,
    tag_triggers,
)
from deepee_spark.functions.wordpiece import full_tokenize
from deepee_spark.ontology import (
    ENTITY_GAZETTEER,
    ID_TO_EVENT_TYPE,
    TRIGGER_LEXICON,
    role_for,
)


def _pieces(text):
    return full_tokenize(text, bert_wordpiece_vocab())["sub_tokens"]


def test_tagger_recovers_lexicon_triggers():
    subs = _pieces("the table merged fast and washington arrested him")
    hits = tag_triggers([subs])[0]
    tagged = {subs[p]: ID_TO_EVENT_TYPE[c] for p, c, _ in hits}
    assert tagged == {
        "merged": TRIGGER_LEXICON["merged"],
        "arrested": TRIGGER_LEXICON["arrested"],
    }
    for _p, _c, score in hits:
        assert score > 0.5  # decision margin over weight noise


def test_tagger_rejects_first_piece_of_split_word():
    """A trigger word appearing as the first wordpiece of a LONGER
    split word must NOT be tagged — the successor attention head sees
    the '##' continuation piece ('merges' -> merge ##s)."""
    whole = _pieces("they merge now")
    split = ["they", "merge", "##s", "now"]
    hits_whole = tag_triggers([whole])[0]
    hits_split = tag_triggers([split])[0]
    assert any(whole[p] == "merge" for p, _c, _s in hits_whole)
    assert hits_split == []


def test_tagger_no_false_positives_on_filler():
    subs = [["the", "[UNK]", "data", "chen", "washington", "##s", "of"]]
    assert tag_triggers(subs) == [[]]


def test_qa_span_hit_and_no_answer():
    trig = "merged"
    ev = TRIGGER_LEXICON[trig]
    sent = ["the", "table", "merged", "fast", "washington", "row", "chen"]
    et_w = ENTITY_GAZETTEER["washington"][0]  # GPE
    et_c = ENTITY_GAZETTEER["chen"][0]
    r_w, r_c = role_for(ev, et_w), role_for(ev, et_c)
    assert r_w != r_c  # construction premise: unambiguous answers
    miss = next(
        r for r in ["Victim", "Instrument", "Adjudicator"]
        if r not in (r_w, r_c)
    )
    res = qa_spans(
        [question_tokens(r_w, trig), question_tokens(r_c, trig),
         question_tokens(miss, trig)],
        [sent, sent, sent],
    )
    assert answer_text(sent, res[0][0], res[0][1]) == "washington"
    assert answer_text(sent, res[1][0], res[1][1]) == "chen"
    assert res[2][0] == -1  # no-answer: best span loses to the null score
    assert res[2][2] < res[2][3]


def test_qa_answer_restricted_to_sentence_segment():
    """The role word inside the QUESTION matches itself via head C but
    must never be decoded as the answer (segment-1 constraint)."""
    trig = "merged"
    ev = TRIGGER_LEXICON[trig]
    r = role_for(ev, ENTITY_GAZETTEER["washington"][0])
    sent = ["no", "entities", "here", "at", "all"]
    res = qa_spans([question_tokens(r, trig)], [sent])
    assert res[0][0] == -1


def test_assemble_shapes_and_segments():
    q = question_tokens("Place", "merged")
    s = ["a", "b", "c"]
    ids, lengths, s1s, s1l = assemble([q], [s])
    # [CLS] + 16-slot padded query + [SEP] + body + [SEP]
    assert s1s[0] == 18 and s1l[0] == 3
    assert lengths[0] == 18 + 3 + 1
    ids_t, lengths_t, s1s_t, s1l_t = assemble(None, [s])
    assert s1s_t[0] == 2 and lengths_t[0] == 6  # [CLS][SEP] s [SEP]


def test_nbest_length_cap():
    """No decoded span may exceed MAX_ANSWER_LEN subtokens."""
    trig = "merged"
    ev = TRIGGER_LEXICON[trig]
    r = role_for(ev, ENTITY_GAZETTEER["washington"][0])
    sent = ["washington"] * 12  # many equally-matching positions
    res = qa_spans([question_tokens(r, trig)], [sent])
    lo, hi, score, null = res[0]
    assert lo >= 0 and hi - lo + 1 <= MAX_ANSWER_LEN
    assert score > null


def test_answer_text_joins_wordpieces():
    assert answer_text(["att", "##ack", "plan"], 0, 2) == "attack plan"
    assert answer_text(["x"], -1, -1) == ""


def test_question_template_variants_follow_qaee_derivation():
    """The 6 forms mirror QAEE run_args_qa.py:181-214: v1/v3/v5 are
    v0/v2/v4 with the trailing '?' stripped and 'in [ trigger ] ?'
    appended ([trigger] substituted at instance time, :111-112)."""
    from deepee_spark.kernels.bert import question_tokens_variant

    tail = ["in", "[", "merged", "]"]
    v = [question_tokens_variant("Place", "merged", i) for i in range(6)]
    assert v[0] == ["place"]
    assert v[1] == v[0] + tail
    assert v[2] == ["what", "is", "the", "place", "?"]
    assert v[3] == v[2][:-1] + tail + ["?"]
    assert v[4] == ["what", "is", "the", "place", "of", "the", "event", "?"]
    assert v[5] == v[4][:-1] + tail + ["?"]
    import pytest

    with pytest.raises(ValueError):
        question_tokens_variant("Place", "merged", 6)


def test_question_template_strings_match_contract_query():
    """' '.join(question_tokens_variant(...)) must equal the string the
    qa_question_templates contract query assembles JVM-side (and its
    DuckDB twin) for every (role, trigger, variant) combination."""
    from deepee_spark.kernels.bert import question_tokens_variant
    from deepee_spark.ontology import ROLE_RULE

    def sql_form(role, word, variant):
        r = role.lower()
        t = f" in [ {word} ] "
        return [
            r,
            f"{r} in [ {word} ]",
            f"what is the {r} ?",
            f"what is the {r}{t}?",
            f"what is the {r} of the event ?",
            f"what is the {r} of the event{t}?",
        ][variant]

    roles = sorted({r for r in ROLE_RULE.values()})
    for role in roles:
        for word in ["merged", "attacked"]:
            for variant in range(6):
                assert (
                    " ".join(question_tokens_variant(role, word, variant))
                    == sql_form(role, word, variant)
                ), (role, word, variant)


def test_qa_variant_selection_trigger_ful_forms_agree():
    """Template-variant selection: the trigger-ful forms (1/3/5) decode
    the same answer as the default phrasing; the trigger-less forms
    (0/2/4) carry no event identity and abstain — the constructed-
    kernel analogue of QAEE's '+ in [trigger]' templates performing
    best."""
    from deepee_spark.kernels.bert import question_tokens_variant

    trig = "attacked"
    ev = TRIGGER_LEXICON[trig]
    r = role_for(ev, ENTITY_GAZETTEER["washington"][0])
    sent = _pieces(
        "alpha beta gamma delta attacked eps zeta eta theta washington iota"
    )
    (def_lo, def_hi, _s, _n), = qa_spans([question_tokens(r, trig)], [sent])
    assert answer_text(sent, def_lo, def_hi) == "washington"
    for variant in (1, 3, 5):
        (lo, hi, _sc, _nu), = qa_spans(
            [question_tokens_variant(r, trig, variant)], [sent]
        )
        assert (lo, hi) == (def_lo, def_hi), variant
    for variant in (0, 2, 4):
        (lo, hi, _sc, _nu), = qa_spans(
            [question_tokens_variant(r, trig, variant)], [sent]
        )
        assert lo == -1, variant


def test_refine_span_reference_semantics():
    """RCEE util.py:230-248: snap on same-start, same-end, or an
    endpoint strictly inside; full entity span returned; None when no
    entity overlaps."""
    from deepee_spark.kernels.bert import refine_span

    spans = [(3, 5), (8, 9)]
    assert refine_span(3, 3, spans) == (3, 5)   # same start
    assert refine_span(2, 5, spans) == (3, 5)   # same end
    assert refine_span(4, 6, spans) == (3, 5)   # start strictly inside
    assert refine_span(1, 4, spans) == (3, 5)   # end strictly inside
    assert refine_span(9, 9, spans) == (8, 9)   # same end, 2nd entity
    assert refine_span(6, 7, spans) is None     # touches nothing
    assert refine_span(0, 1, spans) is None


def test_encode_chunked_bitwise_equals_monolithic():
    """encode() processes rows in ENC_CHUNK blocks for bounded
    allocations; every op is per-row, so the block path must reproduce
    the monolithic path BIT FOR BIT (the contract oracles depend on
    it)."""
    import numpy as np

    from deepee_spark.kernels import bert as B

    rng = np.random.default_rng(1)
    words = ["what", "is", "the", "target", "of", "attack", "in", "x", "?"]
    qs = [words[: rng.integers(4, 9)] for _ in range(B.ENC_CHUNK * 2 + 57)]
    sents = [words[: rng.integers(3, 9)] for _ in range(len(qs))]
    ids, lengths, s1s, _ = B.assemble(qs, sents)
    assert np.array_equal(
        B.encode(ids, lengths, s1s), B._encode_block(ids, lengths, s1s)
    )
