"""Sitemap parsing (operators/sitemaps) and open-IE pattern triples
(operators/openie): fixture coverage of the documented rules."""

from __future__ import annotations

from deepee_spark.operators.openie import (
    extract_open_triples,
    filter_by_rel_freq,
)
from deepee_spark.operators.sitemaps import (
    parse_sitemap_index,
    parse_sitemaps,
)

_SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://ex.org/a </loc><lastmod>2024-03-01</lastmod>
       <priority>0.8</priority></url>
  <url><loc>https://ex.org/b</loc><lastmod>2024-03-02T10:00:00Z</lastmod></url>
  <url><loc>https://ex.org/c</loc><lastmod>soon</lastmod>
       <priority>7</priority></url>
  <url><lastmod>2024-01-01</lastmod></url>
</urlset>"""

_INDEX = """<sitemapindex>
  <sitemap><loc>https://ex.org/s1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>https://ex.org/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemaps(spark):
    df = spark.createDataFrame(
        [("https://ex.org/sitemap.xml", _SITEMAP)], "url string, xml string"
    )
    rows = {r.loc: r for r in parse_sitemaps(df).collect()}
    assert set(rows) == {"https://ex.org/a", "https://ex.org/b", "https://ex.org/c"}
    a, b, c = rows["https://ex.org/a"], rows["https://ex.org/b"], rows["https://ex.org/c"]
    assert (a.lastmod, a.priority) == ("2024-03-01", 0.8)
    assert b.lastmod == "2024-03-02" and b.priority == 0.5  # leading date kept
    assert c.lastmod is None and c.priority == 0.5          # out-of-range prio
    assert [a.entry_idx, b.entry_idx, c.entry_idx] == [0, 1, 2]


def test_parse_sitemap_index(spark):
    df = spark.createDataFrame(
        [("https://ex.org/sitemap.xml", _INDEX)], "url string, xml string"
    )
    rows = parse_sitemap_index(df).orderBy("entry_idx").collect()
    assert [r.child_loc for r in rows] == [
        "https://ex.org/s1.xml", "https://ex.org/s2.xml",
    ]
    assert rows[0].lastmod == "2024-02-01" and rows[1].lastmod is None


_DOCS = [
    (1, "Acme Corp acquired Beta Labs. Jane Doe joined Acme Corp in May."),
    (2, "Gamma Inc acquired Delta. Unrelated prose here. John Smith "
        "visited Berlin! lowercase words acquired nothing."),
    (3, "Jane Doe married John Smith."),
]


def test_extract_open_triples(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r.doc_id, r.subj, r.rel, r.obj)
        for r in extract_open_triples(df).collect()
    }
    assert (1, "Acme Corp", "acquired", "Beta Labs") in got
    assert (1, "Jane Doe", "joined", "Acme Corp") in got  # 'in May' tail NP-bounded
    assert (2, "Gamma Inc", "acquired", "Delta") in got
    assert (2, "John Smith", "visited", "Berlin") in got
    assert (3, "Jane Doe", "married", "John Smith") in got
    # lexicon-gated: lowercase NPs never fire
    assert not any(s == "lowercase words" for (_, s, _, _) in got)
    assert len(got) == 5


def test_filter_by_rel_freq(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    triples = extract_open_triples(df)
    kept = filter_by_rel_freq(triples, min_rel_freq=2)
    rels = {r.rel for r in kept.collect()}
    assert rels == {"acquired"}  # only relation with >= 2 distinct pairs
