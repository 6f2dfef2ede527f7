"""Naive Bayes classifier (operators/nbayes): hand-computed smoothed
log-probabilities, OOV floor, separation on a toy corpus."""

from __future__ import annotations

import math

from deepee_spark.operators.nbayes import log_odds, score_nb, train_nb


def _fixture(spark):
    rows = [
        (1, "good", "clean prose clean text"),
        (2, "good", "clean text flows"),
        (3, "spam", "buy buy pills"),
        (4, "spam", "pills buy now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, label string, text string")


def test_train_hand_computed(spark):
    model = train_nb(_fixture(spark))
    toks = {
        (r.token, r.label): r.logp for r in model["tokens"].collect()
    }
    # vocab = {clean, prose, text, flows, buy, pills, now} -> V=7
    # good: 7 tokens; P(clean|good) = (3+1)/(7+7)
    assert math.isclose(toks[("clean", "good")], math.log(4 / 14))
    # spam: 6 tokens; P(buy|spam) = (3+1)/(6+7)
    assert math.isclose(toks[("buy", "spam")], math.log(4 / 13))
    labels = {r.label: (r.prior, r.logp_oov) for r in model["labels"].collect()}
    assert math.isclose(labels["good"][0], math.log(0.5))
    assert math.isclose(labels["good"][1], math.log(1 / 14))


def test_score_separates_and_oov_floor(spark):
    df = _fixture(spark)
    model = train_nb(df)
    probe = spark.createDataFrame(
        [(10, "clean text unseen"), (11, "buy pills unseen")],
        "doc_id long, text string",
    )
    odds = {
        r.doc_id: r.log_odds
        for r in log_odds(
            score_nb(probe, model), "good", "spam"
        ).collect()
    }
    assert odds[10] > 0 > odds[11]
    # hand-check doc 10: good = ln.5 + ln(4/14)+ln(3/14)+ln(1/14)
    want = (
        (math.log(0.5) + math.log(4 / 14) + math.log(3 / 14)
         + math.log(1 / 14))
        - (math.log(0.5) + math.log(1 / 13) * 3)
    )
    assert math.isclose(odds[10], want, rel_tol=1e-9)
