"""Count-min sketch (operators/sketches): never-undercount, oracle
identity, cell-sum merge."""

from __future__ import annotations

def test_cms_never_undercounts_and_oracle(spark):
    """CMS point estimates are exact or OVER, never under; the DuckDB
    twin reproduces every estimate; sketches merge by summing cells."""
    import duckdb
    from collections import Counter

    from pyspark.sql import functions as F

    from deepee_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_estimate_oracle_sql,
    )

    W, D = 64, 4  # tiny width so collisions (overcounts) actually occur
    vals = [f"k{i % 37}" for i in range(700)]  # skewed occurrence counts
    truth = Counter(vals)
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    probes = spark.createDataFrame(
        [(f"k{i}",) for i in range(50)], ["v"]  # 37 present + 13 absent
    )
    cms = cms_build(df, "v", width=W, depth=D)
    got = {
        r.v: r.est
        for r in cms_estimate(cms, probes, "v", width=W, depth=D).collect()
    }
    assert all(got[v] >= truth.get(v, 0) for v in got)
    assert sum(got[v] > truth.get(v, 0) for v in got) > 0  # W=64 must collide
    # exactness at generous width
    cms_wide = cms_build(df, "v", width=1 << 14, depth=D)
    wide = {
        r.v: r.est
        for r in cms_estimate(
            cms_wide, probes, "v", width=1 << 14, depth=D
        ).collect()
    }
    assert wide == {f"k{i}": truth.get(f"k{i}", 0) for i in range(50)}

    con = duckdb.connect()
    con.execute("CREATE TABLE vals(v VARCHAR)")
    con.executemany("INSERT INTO vals VALUES (?)", [(v,) for v in vals])
    con.execute("CREATE TABLE pr(v VARCHAR)")
    con.executemany(
        "INSERT INTO pr VALUES (?)", [(f"k{i}",) for i in range(50)]
    )
    oracle = dict(
        con.execute(
            cms_estimate_oracle_sql(
                "SELECT v FROM vals", "SELECT v FROM pr", W, D
            )
        ).fetchall()
    )
    assert got == oracle

    # merge = cell-sum: two halves summed equal the joint sketch
    h1 = cms_build(df.limit(350), "v", width=W, depth=D)
    h2 = cms_build(
        spark.createDataFrame([(v,) for v in vals[350:]], ["v"]),
        "v", width=W, depth=D,
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "col")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert {
        (r.row, r.col, r.cnt) for r in merged.collect()
    } == {(r.row, r.col, r.cnt) for r in cms.collect()}
