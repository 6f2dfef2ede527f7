"""Coreference-lite (operators/coref): recency rule, unresolved drop,
distance cap, per-doc isolation."""

from __future__ import annotations

from deepee_spark.operators.coref import resolve_pronouns


def _run(spark, rows, max_distance=50):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ents = spark.createDataFrame(
        [("smith",), ("acme",), ("paris",)], ["surface"]
    )
    return resolve_pronouns(docs, ents, max_distance=max_distance).collect()


def test_nearest_preceding_mention(spark):
    rows = [(1, "smith founded acme and he ran it from paris")]
    got = {(r.pos, r.pronoun): (r.antecedent, r.antecedent_pos)
           for r in _run(spark, rows)}
    # he (pos 4) and it (pos 6): nearest preceding mention is acme (2)
    assert got == {(4, "he"): ("acme", 2), (6, "it"): ("acme", 2)}


def test_unresolved_and_cross_doc_isolation(spark):
    rows = [
        (1, "he spoke before smith arrived"),     # pronoun before any mention
        (2, "acme expanded"),
        (3, "they grew fast"),                    # doc 2's acme must not leak
    ]
    got = _run(spark, rows)
    assert got == []


def test_distance_cap(spark):
    filler = " ".join(["x"] * 60)
    rows = [(1, f"smith said {filler} he left")]
    assert _run(spark, rows, max_distance=50) == []
    near = _run(spark, rows, max_distance=100)
    assert len(near) == 1 and near[0].antecedent == "smith"
