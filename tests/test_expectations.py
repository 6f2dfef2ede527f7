"""Expectations runner (operators/expectations): every rule kind with
known violation counts, plus the single-pass plan property."""

from __future__ import annotations

from deepee_spark.operators.expectations import check_expectations


def test_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 5.0, "x1"),
            (2, "b", 25.0, "x2"),
            (2, None, 7.0, "x3"),
            (4, "z", -1.0, "zz"),
        ],
        "id long, cat string, v double, code string",
    )
    dim = spark.createDataFrame([("x1",), ("x2",), ("x9",)], ["code"])
    out = {
        (r.rule, r.column): (r.n_violations, r.passed)
        for r in check_expectations(
            df,
            [
                ("not_null", "cat"),
                ("unique", "id"),
                ("accepted_values", "cat", ["a", "b"]),
                ("matches_regex", "code", "^x"),
                ("in_range", "v", 0, 10),
                ("min_rows", 3),
                ("min_rows", 10),
                ("fk", "code", dim, "code"),
            ],
        ).collect()
    }
    assert out[("not_null", "cat")] == (1, False)
    assert out[("unique", "id")] == (1, False)          # id 2 twice
    # accepted: None and 'z' violate
    assert out[("accepted_values", "cat")] == (2, False)
    assert out[("matches_regex", "code")] == (1, False)  # 'zz'
    assert out[("in_range", "v")] == (2, False)          # 25.0, -1.0
    assert out[("min_rows", "")] == (6, False)           # last wins key;
    # both min_rows rows exist though — recheck via full list
    rows = check_expectations(df, [("min_rows", 3), ("min_rows", 10)]).collect()
    assert [(r.n_violations, r.passed) for r in rows] == [(0, True), (6, False)]
    assert out[("fk", "code")] == (2, False)             # x3, zz


def test_clean_table_passes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, cat string")
    out = check_expectations(
        df, [("not_null", "cat"), ("unique", "id"), ("min_rows", 2)]
    )
    assert out.filter("NOT passed").count() == 0


def test_triples_contract_gate(spark, tmp_path):
    """The pipeline's instantiated contract passes on a real run and
    catches a poisoned table."""
    from pyspark.sql import functions as F

    from deepee_spark.corpus import corpus_df
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.sources.tables import StageCatalog

    cat = StageCatalog(str(tmp_path / "cat"))
    pipe = Pipeline(spark, cat)
    pipe.run(corpus_df(spark, 30), "corpus:30", resume=False)
    gate = pipe.check_triples_contract()
    assert gate.filter("NOT passed").count() == 0
    assert gate.count() == 7

    # poison: a null-obj triple with out-of-range confidence
    t = cat.read(spark, "triples")
    bad = t.limit(1).withColumn("obj", F.lit(None).cast("string")) \
           .withColumn("confidence", F.lit(2.0))
    cat.append(bad.select(*t.columns), "triples", "poison")
    failed = {r.rule for r in
              pipe.check_triples_contract().filter("NOT passed").collect()}
    assert failed == {"not_null", "in_range"}
