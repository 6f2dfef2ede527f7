"""Group splits (operators/splits): determinism, leakage-freedom,
fraction calibration, bad-input guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deepee_spark.operators.splits import group_split, verify_no_leakage


def _df(spark, n=4000, hosts=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string")).alias(
            "host"
        ),
    )


def test_group_atomicity_and_determinism(spark):
    df = group_split(_df(spark), "host")
    assert verify_no_leakage(df, "host").count() == 0
    # repartitioned input -> identical assignment
    again = group_split(_df(spark).repartition(17), "host")
    a = {(r.doc_id, r.split) for r in df.collect()}
    b = {(r.doc_id, r.split) for r in again.collect()}
    assert a == b
    # all three labels present, train dominant
    n = df.groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in n}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_fraction_calibration(spark):
    # with many groups the empirical fractions approach the request
    df = group_split(_df(spark, 20000, 5000), "host", {"a": 0.5, "b": 0.5})
    counts = {r.split: r["count"] for r in df.groupBy("split").count().collect()}
    frac_a = counts["a"] / 20000
    assert 0.45 < frac_a < 0.55


def test_bad_fractions_rejected(spark):
    with pytest.raises(ValueError):
        group_split(_df(spark, 10), "host", {"a": 0.5, "b": 0.6})
