"""Bloom-filter seen-set: no false negatives, cross-engine bitmap and
verdict identity, merge-by-bit_or additivity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from deepee_spark.operators.bloom import (
    bloom_build,
    bloom_build_oracle_sql,
    bloom_probe,
    bloom_probe_oracle_sql,
)

M, K = 1 << 12, 4  # small m so collisions actually occur in-test


def test_bloom_no_false_negatives_and_oracle(spark):
    seen = [f"https://s{i}.test/p/{i}" for i in range(300)]
    unseen = [f"https://u{i}.test/q/{i}" for i in range(300)]
    df = spark.createDataFrame([(v,) for v in seen], ["v"])
    bitmap = bloom_build(df, "v", m_bits=M, k=K)
    probes = spark.createDataFrame(
        [(v,) for v in seen + unseen], ["v"]
    )
    got = {
        r.v: r.possibly_seen
        for r in bloom_probe(bitmap, probes, "v", m_bits=M, k=K).collect()
    }
    # every built key MUST probe true
    assert all(got[v] for v in seen)
    # at m=4096 bits / n=300 keys / k=4 the FP rate is ~2.6%; all-true
    # on the unseen side would mean the filter is broken
    fp = sum(got[v] for v in unseen)
    assert fp < 60

    con = duckdb.connect()
    con.execute("CREATE TABLE seen(v VARCHAR)")
    con.executemany("INSERT INTO seen VALUES (?)", [(v,) for v in seen])
    con.execute("CREATE TABLE pr(v VARCHAR)")
    con.executemany(
        "INSERT INTO pr VALUES (?)", [(v,) for v in seen + unseen]
    )
    # bitmap identity
    b_spark = {
        (r.word_idx, r.word) for r in bitmap.collect()
    }
    b_duck = set(
        map(
            tuple,
            con.execute(
                bloom_build_oracle_sql("SELECT v FROM seen", M, K)
            ).fetchall(),
        )
    )
    assert b_spark == b_duck
    # verdict identity
    v_duck = dict(
        con.execute(
            bloom_probe_oracle_sql(
                "SELECT v FROM seen", "SELECT v FROM pr", M, K
            )
        ).fetchall()
    )
    assert got == v_duck


def test_bloom_merge_is_bit_or(spark):
    a = spark.createDataFrame([("x",), ("y",)], ["v"])
    b = spark.createDataFrame([("y",), ("z",)], ["v"])
    merged = (
        bloom_build(a, "v", m_bits=M, k=K)
        .unionByName(bloom_build(b, "v", m_bits=M, k=K))
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )
    together = bloom_build(a.unionByName(b), "v", m_bits=M, k=K)
    assert {
        (r.word_idx, r.word) for r in merged.collect()
    } == {(r.word_idx, r.word) for r in together.collect()}


def test_frontier_gate_admits_only_new_urls(spark, tmp_path):
    """Drop 1 admits everything; an overlapping drop 2 admits exactly
    its new urls (m is large enough that no false positive fires on 30
    urls); replaying drop 1 admits nothing."""
    from deepee_spark.corpus import corpus_df
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.sources.tables import StageCatalog

    docs = corpus_df(spark, 30).cache()
    d1 = docs.filter("url like '%/page/1%'")
    d2 = docs  # superset: overlap = all of d1
    cat = StageCatalog(str(tmp_path / "cat"))
    pipe = Pipeline(spark, cat)

    a1 = pipe.frontier_gate(d1, "drop:1")
    assert {r.url for r in a1.select("url").collect()} == {
        r.url for r in d1.select("url").collect()
    }
    a2 = pipe.frontier_gate(d2, "drop:2")
    want = {r.url for r in d2.select("url").collect()} - {
        r.url for r in d1.select("url").collect()
    }
    assert {r.url for r in a2.select("url").collect()} == want
    a3 = pipe.frontier_gate(d1, "drop:3")
    assert a3.count() == 0


def test_frontier_gate_is_canonical_url_aware(spark, tmp_path):
    """A re-crawl of a seen page under a tracking-param/fragment
    variant url must be gated out: the bitmap is keyed on canonical
    urls."""
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.sources.tables import StageCatalog

    cat = StageCatalog(str(tmp_path / "cat"))
    pipe = Pipeline(spark, cat)
    d1 = spark.createDataFrame(
        [("https://a.test/x", "h1"), ("https://a.test/y", "h2")],
        ["url", "html"],
    )
    assert pipe.frontier_gate(d1, "drop:1").count() == 2
    d2 = spark.createDataFrame(
        [
            ("https://a.test/x?utm_source=feed#top", "h1"),  # variant
            ("https://a.test/z", "h3"),  # genuinely new
        ],
        ["url", "html"],
    )
    got = {r.url for r in pipe.frontier_gate(d2, "drop:2").collect()}
    assert got == {"https://a.test/z"}


def test_frontier_gate_replay_after_merge_admits_same_rows(spark, tmp_path):
    """Crash between the eager bitmap merge and the caller's downstream
    commit of the lazily-returned admitted rows: the replayed gate must
    admit the SAME rows by time-travelling to the pre-merge bitmap
    snapshot — probing the post-merge bitmap would report the whole
    drop as seen (Bloom has no false negatives) and silently lose it
    forever."""
    from deepee_spark.corpus import corpus_df
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.sources.tables import StageCatalog

    cat = StageCatalog(str(tmp_path / "cat"))
    pipe = Pipeline(spark, cat)
    docs = corpus_df(spark, 30).cache()
    d1 = docs.filter("url like '%/page/1%'")
    d2 = docs  # superset of d1
    pipe.frontier_gate(d1, "drop:1")
    want = {r.url for r in pipe.frontier_gate(d2, "drop:2").collect()}
    assert want  # drop 2 genuinely admits new urls

    # drop:2's merge is already committed — the replay must return the
    # identical admitted set and must NOT merge the bitmap again
    n_snaps = len(cat._snapshots("url_bloom"))
    got = {r.url for r in pipe.frontier_gate(d2, "drop:2").collect()}
    assert got == want
    assert len(cat._snapshots("url_bloom")) == n_snaps

    # a replay of the FIRST drop probes the empty pre-merge seen-set
    got1 = {r.url for r in pipe.frontier_gate(d1, "drop:1").collect()}
    assert got1 == {r.url for r in d1.select("url").collect()}
    assert len(cat._snapshots("url_bloom")) == n_snaps
