"""Link-graph extraction (operators/links): resolution rules against a
hand-built page, a pure-Python oracle over the synthetic corpus, and the
host_links stage's resume contract."""

from __future__ import annotations

import re
from collections import Counter

from deepee_spark.operators.links import extract_outlinks, host_graph


def test_extract_outlinks_resolution_rules(spark):
    html = (
        "<html><body>"
        "<a href='https://other.example.org/x'>Abs <b>link</b>\n here</a>"
        '<a href="/rel/path">rooted</a>'
        "<a href='#frag'>frag</a>"
        "<a href='mailto:x@y.z'>mail</a>"
        "<a href='//proto.example.com/p'>protorel</a>"
        "<a href=''>empty</a>"
        "<a class='c' href='http://plain.example.com/'>plain http</a>"
        "</body></html>"
    ).encode()
    docs = spark.createDataFrame(
        [("https://src.example.com/a/b", html)], ["url", "html"]
    )
    got = {
        (r.dst_url, r.anchor)
        for r in extract_outlinks(docs).collect()
    }
    assert got == {
        ("https://other.example.org/x", "Abs link here"),
        ("https://src.example.com/rel/path", "rooted"),
        ("http://plain.example.com/", "plain http"),
    }


def test_host_graph_drops_self_links(spark):
    rows = [
        ("https://a.com/1", "https://b.com/x"),
        ("https://a.com/2", "https://b.com/y"),
        ("https://a.com/3", "https://a.com/other"),  # self-host
        ("https://b.com/1", "https://a.com/"),
    ]
    df = spark.createDataFrame(rows, ["src_url", "dst_url"])
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(df).collect()
    }
    assert got == {("a.com", "b.com"): 2, ("b.com", "a.com"): 1}


def test_corpus_outlinks_python_oracle(spark):
    """The Spark regex path must agree with a pure-Python re.findall
    over the same generated html, and the host rollup with a Counter."""
    from deepee_spark.corpus import corpus_df, gen_doc

    n = 60
    docs = corpus_df(spark, n)
    got = sorted(
        (r.src_url, r.dst_url)
        for r in extract_outlinks(docs).collect()
    )
    exp = []
    host_pairs = Counter()
    for i in range(n):
        d = gen_doc(i)
        src_host = re.match(r"^https?://([^/]+)", d["url"]).group(1)
        for m in re.finditer(
            r"(?s)<a\s[^>]*href=['\"]([^'\"]*)['\"]",
            d["html"].decode(),
        ):
            href = m.group(1)
            if re.match(r"^https?://", href):
                dst = href
            elif href.startswith("/"):
                dst = f"https://{src_host}{href}"
            else:
                continue
            exp.append((d["url"], dst))
            dst_host = re.match(r"^https?://([^/]+)", dst).group(1)
            if dst_host != src_host:
                host_pairs[(src_host, dst_host)] += 1
    assert got == sorted(exp)
    # every doc contributes its 4 nav links
    assert len(got) == 4 * n
    hg = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(extract_outlinks(docs)).collect()
    }
    assert hg == dict(host_pairs)
    assert hg  # cross-site links actually exist in the corpus


def test_materialize_links_stage_resume(spark, tmp_path):
    from deepee_spark.corpus import corpus_df
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.sources.tables import StageCatalog

    cat = StageCatalog(str(tmp_path / "cat"))
    pipe = Pipeline(spark, cat)
    docs = corpus_df(spark, 40)
    out = pipe.materialize_links(docs, "corpus:40")
    assert "host_links" in pipe.ran
    n = out.count()
    assert n > 0
    pipe2 = Pipeline(spark, cat)
    again = pipe2.materialize_links(docs, "corpus:40")
    assert pipe2.skipped == ["host_links"] and pipe2.ran == []
    assert again.count() == n


def test_anchor_aliases_normalization_and_counts(spark):
    from deepee_spark.operators.links import anchor_aliases

    rows = [
        ("https://s.com/1", "https://t.com/x", "Acme 42"),
        ("https://s.com/2", "https://t.com/y", "acme 17"),  # same surface
        ("https://s.com/3", "https://u.com/z", "Acme 42"),  # other host
        ("https://s.com/4", "https://t.com/w", ""),  # empty dropped
        ("https://s.com/5", "https://t.com/v", "plain"),
    ]
    df = spark.createDataFrame(rows, ["src_url", "dst_url", "anchor"])
    got = {
        (r.surface, r.dst_host): r.n
        for r in anchor_aliases(df).collect()
    }
    assert got == {
        ("acme 00", "t.com"): 2,
        ("acme 00", "u.com"): 1,
        ("plain", "t.com"): 1,
    }
    pruned = {
        (r.surface, r.dst_host): r.n
        for r in anchor_aliases(df, min_count=2).collect()
    }
    assert pruned == {("acme 00", "t.com"): 2}


def test_accumulate_host_links_equals_full_rebuild(spark, tmp_path):
    """Two crawl drops accumulated incrementally must equal the host
    graph of the union corpus exactly (n_links is additive)."""
    from deepee_spark.corpus import corpus_df
    from deepee_spark.operators.links import extract_outlinks, host_graph
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.sources.tables import StageCatalog

    all_docs = corpus_df(spark, 60)
    drop1 = all_docs.filter("url like '%/page/1%'")
    drop2 = all_docs.subtract(drop1)
    cat = StageCatalog(str(tmp_path / "cat"))
    pipe = Pipeline(spark, cat)
    pipe.accumulate_host_links(drop1, "drop:1")
    acc = pipe.accumulate_host_links(drop2, "drop:2")
    got = {
        (r.src_host, r.dst_host): r.n_links
        for r in acc.select("src_host", "dst_host", "n_links").collect()
    }
    full = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_graph(extract_outlinks(all_docs)).collect()
    }
    assert got == full and full
