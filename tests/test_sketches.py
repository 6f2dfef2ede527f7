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


def test_heavy_hitters_exact(spark):
    """Sketch-prefiltered heavy hitters must equal the brute-force
    definition on a skewed corpus (heads far above, tail far below,
    and values straddling the threshold)."""
    from collections import Counter

    from deepee_spark.operators.sketches import heavy_hitters

    vals = (
        ["hot"] * 50
        + ["warm"] * 10
        + ["edge"] * 5
        + ["cool"] * 4
        + [f"tail{i}" for i in range(200)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "token: string")
    got = {(r.token, r.n) for r in heavy_hitters(df, "token", 5).collect()}
    want = {
        (v, c) for v, c in Counter(vals).items() if c >= 5
    }
    assert got == want


def test_heavy_hitters_probe_is_broadcast(spark):
    import io
    from contextlib import redirect_stdout

    from deepee_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(f"v{i % 7}",) for i in range(100)], "token: string"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        heavy_hitters(df, "token", 10).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
