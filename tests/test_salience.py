"""Entity salience (operators/salience): hand-computed fixture scores
covering count dominance, title bonus, first-position remainder."""

from __future__ import annotations

from deepee_spark.operators.salience import entity_salience


def test_entity_salience(spark):
    docs = spark.createDataFrame(
        [
            (1, "Paris news", "paris hosts the games paris wins"),
            (2, "weather", "rain in london all week"),
            (3, "nothing", "no entities here at all"),
        ],
        "doc_id long, title string, text string",
    )
    ents = spark.createDataFrame(
        [("paris",), ("london",), ("Games",)], ["surface"]
    )
    rows = {
        (r.doc_id, r.surface): r
        for r in entity_salience(docs, ents).collect()
    }
    # doc 1 / paris: n=2, first=0, in_title=1, T=6 -> 200+50+6 = 256
    p = rows[(1, "paris")]
    assert (p.n_mentions, p.first_pos, p.in_title, p.doc_tokens) == (2, 0, 1, 6)
    assert p.salience == 256
    # doc 1 / games: n=1, first=3, no title hit -> 100 + (6-3) = 103
    g = rows[(1, "games")]
    assert (g.n_mentions, g.first_pos, g.in_title, g.salience) == (1, 3, 0, 103)
    # doc 2 / london: n=1, first=2, T=5 -> 100 + 3 = 103
    l2 = rows[(2, "london")]
    assert (l2.in_title, l2.salience) == (0, 103)
    # doc 3: no hits at all
    assert not any(d == 3 for d, _ in rows)
    assert len(rows) == 3


def test_salience_no_title(spark):
    docs = spark.createDataFrame(
        [(1, "paris paris")], "doc_id long, text string"
    )
    ents = spark.createDataFrame([("paris",)], ["surface"])
    r = entity_salience(docs, ents, title_col=None).collect()[0]
    assert (r.n_mentions, r.in_title, r.salience) == (2, 0, 200 + 2)
