"""Corpus mixture allocation (operators/sampling.mixture_rates)."""

from __future__ import annotations

def test_mixture_rates_allocation_and_sampling(spark):
    """Quality-mass-proportional budget split, integer-exact; composed
    with stratified_sample the realized sizes track the targets."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from deepee_spark.operators.sampling import (
        mixture_rates,
        stratified_sample,
    )

    rows = (
        [("a", i, 10) for i in range(600)]          # mass 6000
        + [("b", 600 + i, 30) for i in range(200)]  # mass 6000
        + [("c", 800 + i, 1) for i in range(200)]   # mass 200
    )
    df = spark.createDataFrame(rows, ["source", "doc_id", "score"])
    budget = 500
    rates = mixture_rates(df, "source", "score", budget)
    got = {
        r.stratum: (r.n_rows, r.mass, r.permille)
        for r in rates.collect()
    }
    total_mass = 12200
    for s, n, m in (("a", 600, 6000), ("b", 200, 6000), ("c", 200, 200)):
        target = budget * m // total_mass
        assert got[s] == (n, m, min(1000, 1000 * target // n)), s
    # b's fair share (245 of 200 rows) caps at permille=1000
    assert got["b"][2] == 1000

    sampled = stratified_sample(
        df, "doc_id", "source",
        rates.select("stratum", "permille"),
    )
    by_src = {
        r.source: r.cnt
        for r in sampled.groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert by_src["b"] == 200          # capped stratum: keep all
    assert 0 < by_src["a"] < 600       # sampled fraction
    assert by_src.get("c", 0) <= 25    # tiny fair share

    with _pytest.raises(ValueError):
        mixture_rates(df, "source", "score", -1)


def test_script_profile(spark):
    from deepee_spark.operators.textstats import script_profile

    df = spark.createDataFrame(
        [(1, "Hello 世界 Привет مرحبا 42")], "doc_id long, text string"
    )
    r = script_profile(df).collect()[0]
    assert r.n_latin == 5 and r.n_cjk == 2 and r.n_cyrillic == 6
    assert r.n_arabic == 5 and r.n_digit == 2
    assert r.n_chars_total == len("Hello 世界 Привет مرحبا 42")
