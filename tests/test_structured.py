"""Structured-data extraction (operators/structured): JSON-LD triples,
flat-model microdata, and <head> metadata — hand-built HTML fixtures
covering the documented rules (subject selection, @-key handling,
nested-value raw-JSON capture, malformed blocks, content= vs
inner-text props, nesting flattening, og:/canonical/robots variants).
"""

from __future__ import annotations

from deepee_spark.operators.structured import (
    jsonld_triples,
    microdata_triples,
    page_metadata,
)

_LD_PAGE = """<html><head>
<script type="application/ld+json">
{"@context": "https://schema.org", "@type": "Organization",
 "@id": "https://ex.org/#org", "name": "Acme Corp",
 "numberOfEmployees": 42,
 "address": {"@type": "PostalAddress", "addressLocality": "Berlin"}}
</script>
<script type="application/ld+json">
{"@type": "Article", "headline": "A headline", "empty": ""}
</script>
<script type="application/ld+json">not json at all</script>
<script type="text/javascript">{"@type": "ignored"}</script>
</head><body></body></html>"""

_MD_PAGE = """<html><body>
<div itemscope itemtype="https://schema.org/Person">
  <span itemprop="name">Ada Lovelace</span>
  <meta itemprop="birthDate" content="1815-12-10">
  <span itemprop="empty"></span>
</div>
<div itemscope itemtype="https://schema.org/Book">
  <b itemprop="name"> Frankenstein </b>
</div>
</body></html>"""

_META_PAGE = """<html><head>
<title> The  Title </title>
<meta name="description" content="a description">
<link rel="canonical" href="https://ex.org/canon">
<meta property="og:title" content="OG Title">
<meta name="og:type" content="article">
<meta name="robots" content="NOINDEX, nofollow">
<link rel="alternate" hreflang="en" href="https://ex.org/en">
<link rel="alternate" hreflang="de" href="https://ex.org/de">
</head><body></body></html>"""


def _docs(spark, pages):
    return spark.createDataFrame(pages, "url string, html string")


def test_jsonld_triples(spark):
    out = jsonld_triples(_docs(spark, [("u1", _LD_PAGE)]))
    rows = {(r.block_idx, r.subj, r.pred, r.obj) for r in out.collect()}
    # block 0: @id subject, @type -> 'a', raw-JSON nested capture
    assert (0, "https://ex.org/#org", "a", "Organization") in rows
    assert (0, "https://ex.org/#org", "name", "Acme Corp") in rows
    assert (0, "https://ex.org/#org", "numberOfEmployees", "42") in rows
    nested = [o for (b, s, p, o) in rows if p == "address"]
    assert len(nested) == 1
    assert "addressLocality" in nested[0] and "Berlin" in nested[0]
    # block 1: synthesized subject, empty value dropped
    assert (1, "u1#jsonld1", "a", "Article") in rows
    assert (1, "u1#jsonld1", "headline", "A headline") in rows
    assert not any(p == "empty" for (_, _, p, _) in rows)
    # malformed block emits nothing; non-ld scripts ignored
    assert not any(b == 2 for (b, _, _, _) in rows)
    assert not any(o == "ignored" for (_, _, _, o) in rows)
    # @context / @id emit no triple
    assert not any(p in ("@context", "@id") for (_, _, p, _) in rows)


def test_microdata_triples(spark):
    out = microdata_triples(_docs(spark, [("u1", _MD_PAGE)]))
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("u1#item0", "a", "https://schema.org/Person") in rows
    assert ("u1#item0", "name", "Ada Lovelace") in rows
    assert ("u1#item0", "birthDate", "1815-12-10") in rows
    assert ("u1#item1", "a", "https://schema.org/Book") in rows
    assert ("u1#item1", "name", "Frankenstein") in rows  # trimmed
    assert not any(p == "empty" for (_, p, _) in rows)
    assert len(rows) == 5


def test_microdata_no_items(spark):
    out = microdata_triples(_docs(spark, [("u1", "<p>nothing</p>")]))
    assert out.count() == 0


def test_page_metadata(spark):
    row = page_metadata(_docs(spark, [("u1", _META_PAGE)])).collect()[0]
    assert row.title == "The Title"
    assert row.meta_description == "a description"
    assert row.canonical_url == "https://ex.org/canon"
    assert row.og_title == "OG Title"
    assert row.og_type == "article"  # name= spelling accepted
    assert row.robots_noindex is True
    assert row.n_hreflang == 2


def test_page_metadata_absent_fields(spark):
    row = page_metadata(_docs(spark, [("u1", "<p>x</p>")])).collect()[0]
    assert row.title == "" and row.canonical_url == ""
    assert row.robots_noindex is False and row.n_hreflang == 0


_MD_REVERSED_PAGE = """<html><body>
<div itemtype="https://schema.org/Person" itemscope>
  <span itemprop="name">Grace Hopper</span>
</div>
<article itemscope itemtype="https://schema.org/Article">
  <h1 itemprop="headline">Compilers</h1>
</article>
</body></html>"""

_MD_STRAY_TEXT_PAGE = """<html><body>
<div itemscope itemtype="https://schema.org/Person">
  <meta itemprop="birthDate" content="1815-12-10">stray text</meta>
  <span itemprop="name">Ada</span>
</div>
</body></html>"""


def test_microdata_itemtype_before_itemscope(spark):
    # ADVICE r3: <div itemtype="..." itemscope> must start an item too
    out = microdata_triples(_docs(spark, [("u1", _MD_REVERSED_PAGE)]))
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("u1#item0", "a", "https://schema.org/Person") in rows
    assert ("u1#item0", "name", "Grace Hopper") in rows
    assert ("u1#item1", "a", "https://schema.org/Article") in rows
    assert ("u1#item1", "headline", "Compilers") in rows
    assert len(rows) == 4


def test_microdata_content_tag_stray_text_no_double_emit(spark):
    # ADVICE r3: a content=-bearing tag with non-empty inner text must
    # emit ONLY the content binding, never p -> stray inner text
    out = microdata_triples(_docs(spark, [("u1", _MD_STRAY_TEXT_PAGE)]))
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("u1#item0", "birthDate", "1815-12-10") in rows
    assert not any(o == "stray text" for (_, _, o) in rows)
    assert ("u1#item0", "name", "Ada") in rows
    assert len(rows) == 3


def test_microdata_data_content_attribute_does_not_block_inner_text(spark):
    # review finding: the content= guard must match only the STANDALONE
    # attribute name — data-content= (Bootstrap popovers) is not content=
    page = """<div itemscope itemtype="https://schema.org/Person">
    <span data-content="tooltip" itemprop="name">Ada</span>
    <b itemprop="title" data-content="x">Countess</b>
    </div>"""
    out = microdata_triples(_docs(spark, [("u1", page)]))
    rows = {(r.pred, r.obj) for r in out.collect()}
    assert ("name", "Ada") in rows
    assert ("title", "Countess") in rows
