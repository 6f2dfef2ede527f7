"""Truth discovery (operators/fusion): brute-force round-by-round
oracle, the liar-loses property, and cross-engine twin equality."""

import duckdb
import pytest

from deepee_spark.operators.fusion import (
    SCALE,
    fuse_claims,
    fusion_oracle_sql,
    source_trust,
    trust_oracle_sql,
)

CLAIMS = [
    # fact f1: honest sources a, b say "x"; liar c says "y".
    ("a", "f1", "x"),
    ("b", "f1", "x"),
    ("c", "f1", "y"),
    # fact f2: same split.
    ("a", "f2", "p"),
    ("b", "f2", "p"),
    ("c", "f2", "q"),
    # fact f3: only the liar speaks.
    ("c", "f3", "z"),
    # fact f4: a 1-vs-1 conflict between an honest and the liar.
    ("a", "f4", "m"),
    ("c", "f4", "n"),
]


def brute(claims, iters):
    """Literal Python replica of the integer recurrence."""
    c = sorted(set(claims))
    sources = sorted({s for s, _, _ in c})
    trust = {s: SCALE for s in sources}
    n_claims = {s: sum(1 for s2, _, _ in c if s2 == s) for s in sources}
    conf = {}
    for _ in range(iters):
        vote = {}
        for s, f, v in c:
            vote[(f, v)] = vote.get((f, v), 0) + trust[s]
        tot = {}
        for (f, v), w in vote.items():
            tot[f] = tot.get(f, 0) + w
        conf = {
            (f, v): (SCALE * w) // tot[f] for (f, v), w in vote.items()
        }
        trust = {
            s: sum(conf[(f, v)] for s2, f, v in c if s2 == s)
            // n_claims[s]
            for s in sources
        }
    return conf, trust


@pytest.mark.parametrize("iters", [1, 2, 3])
def test_fuse_matches_bruteforce(spark, iters):
    df = spark.createDataFrame(
        CLAIMS, "source: string, fact: string, value: string"
    )
    got = {
        (r.fact, r.value): (r.conf_e6, r.n_src, r.winner)
        for r in fuse_claims(df, iters=iters).collect()
    }
    conf, _ = brute(CLAIMS, iters)
    n_src = {}
    for s, f, v in set(CLAIMS):
        n_src[(f, v)] = n_src.get((f, v), 0) + 1
    for (f, v), c_e6 in conf.items():
        best = min(
            (k for k in conf if k[0] == f),
            key=lambda k: (-conf[k], k[1]),
        )
        assert got[(f, v)] == (c_e6, n_src[(f, v)], (f, v) == best)
    assert set(got) == set(conf)


def test_trust_matches_bruteforce_and_liar_loses(spark):
    df = spark.createDataFrame(
        CLAIMS, "source: string, fact: string, value: string"
    )
    got = {
        r.source: (r.trust_e6, r.n_claims)
        for r in source_trust(df, iters=3).collect()
    }
    _, trust = brute(CLAIMS, 3)
    assert got == {
        s: (t, sum(1 for s2, _, _ in set(CLAIMS) if s2 == s))
        for s, t in trust.items()
    }
    # The mutually-reinforcing majority wins: honest > liar.
    assert got["a"][0] > got["c"][0]
    assert got["b"][0] > got["c"][0]
    # And the fused winners side with the honest pair everywhere the
    # majority speaks; the liar keeps only its uncontested fact.
    winners = {
        r.fact: r.value
        for r in fuse_claims(df, iters=3).collect()
        if r.winner
    }
    assert winners["f1"] == "x" and winners["f2"] == "p"
    assert winners["f3"] == "z"
    assert winners["f4"] == "m"  # honest a outweighs liar c after r1


def test_confidence_mass_and_winner_unique(spark):
    df = spark.createDataFrame(
        CLAIMS, "source: string, fact: string, value: string"
    )
    rows = fuse_claims(df, iters=2).collect()
    by_fact = {}
    for r in rows:
        by_fact.setdefault(r.fact, []).append(r)
    for f, rs in by_fact.items():
        assert sum(r.conf_e6 for r in rs) <= SCALE
        assert sum(1 for r in rs if r.winner) == 1


def test_oracle_twins_hash_match(spark):
    df = spark.createDataFrame(
        CLAIMS, "source: string, fact: string, value: string"
    )
    union = " UNION ALL ".join(
        f"SELECT '{s}' AS source, '{f}' AS fact, '{v}' AS value"
        for s, f, v in CLAIMS
    )
    con = duckdb.connect()
    want_f = {
        (f, v): (n, c, w)
        for f, v, n, c, w in con.sql(fusion_oracle_sql(union, 3)).fetchall()
    }
    got_f = {
        (r.fact, r.value): (r.n_src, r.conf_e6, r.winner)
        for r in fuse_claims(df, iters=3).collect()
    }
    assert got_f == want_f
    want_t = {
        s: (n, t) for s, n, t in con.sql(trust_oracle_sql(union, 3)).fetchall()
    }
    got_t = {
        r.source: (r.n_claims, r.trust_e6)
        for r in source_trust(df, iters=3).collect()
    }
    assert got_t == want_t


def test_iters_guard(spark):
    df = spark.createDataFrame(
        CLAIMS, "source: string, fact: string, value: string"
    )
    with pytest.raises(ValueError):
        fuse_claims(df, iters=0)
