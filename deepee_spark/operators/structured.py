"""Structured-data extraction — schema.org JSON-LD and microdata
embedded in web pages, plus the <head> metadata block.

On Common-Crawl-scale corpora a large fraction of machine-readable
facts arrive not in prose but as publisher-embedded structured data:
``<script type="application/ld+json">`` blocks and microdata
(``itemscope``/``itemprop`` attributes), the substrate of the public
Web Data Commons extractions. The reference pipeline (DeepEE) stops at
sentence-level event extraction; these operators are the structured
companion a web-scale KG build runs beside it — they emit (url, subj,
pred, obj) triples that feed the SAME linking/canonicalization stages
as the event and web-table triples (plans/pipeline.py).

Spark-native and deliberately narrow, same discipline as
operators/webtables.py / operators/links.py: the html column decodes
once, blocks surface via regexp_extract_all / split + posexplode, and
per-block parsing is plain per-row regexp / from_json columns — NO
lambda higher-order functions (pyspark 4.1.2 mis-evaluates
multi-lambda-site plans; see operators/negatives.py), NO joins, NO
shuffle: the whole extraction is a linear map pipeline. At 10^12
documents this stage is embarrassingly parallel.

Interpretation rules (documented; oracles implement the same):

JSON-LD (``jsonld_triples``):
  - every ``<script type="application/ld+json">`` body is one block,
    indexed in document order;
  - a block must parse as a single flat-or-nested JSON OBJECT; arrays /
    malformed JSON emit nothing (from_json -> NULL map);
  - subject = the block's ``@id`` if present, else ``url#jsonld<idx>``;
  - ``@type`` becomes predicate ``a`` (the rdf:type shorthand);
  - ``@context`` and ``@id`` keys emit no triple;
  - other keys: predicate = key, object = the value's raw JSON token
    text (primitives unquoted, nested objects/arrays as JSON text —
    Spark's StringType capture rule, mirrored by the oracle).

Microdata (``microdata_triples``), flat-item model:
  - every open tag carrying ``itemscope`` AND ``itemtype="..."`` (in
    either attribute order — the html is normalized before extraction)
    starts a new item; everything up to the next such tag (or end of
    page) is its segment — nesting deliberately flattens (documented
    approximation; exact microdata trees need a DOM, which a 100 TB
    regex pass does not get);
  - subject = ``url#item<idx>``; each item emits (subj, 'a', itemtype);
  - within a segment, ``itemprop="p" ... content="v"`` attributes bind
    p -> v (meta/link style), and ``<tag itemprop="p">text</tag>``
    pairs bind p -> tag-stripped collapsed inner text — the inner-text
    rule skips tags that carry ``content=`` so a content-bearing tag
    with stray inner text never double-emits;
  - empty values are dropped.

Page metadata (``page_metadata``): one row per page with the classic
<head> fields — title, meta description, rel=canonical href, og:title
/ og:type (property= or name= spellings), meta-robots noindex flag,
and the hreflang alternate count. Feeds the canonical-URL dedup path
(operators/redirects.py) and the crawl-admission stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- JSON-LD -----------------------------------------------------------
_LDJSON_RE = (
    r"""(?si)<script[^>]*type=['"]application/ld\+json['"][^>]*>(.*?)"""
    r"""</script\s*>"""
)

# --- microdata ---------------------------------------------------------
# open tag with itemscope and an itemtype attribute. The capture pattern
# requires itemscope BEFORE itemtype; either-order support comes from
# _ITEMSCOPE_NORM_RE, which rewrites `<tag ... itemscope...>` so the
# itemscope token sits immediately after the tag name before extraction
# (a plain capture-group alternation can't share one group index across
# both orders, and per-tag re-extraction would need a lambda HOF — see
# the module-docstring pyspark 4.1.2 caveat).
_ITEMSCOPE_NORM_RE = r"(?si)<(\w+)([^>]*?)\s+itemscope\b"
_ITEMSCOPE_RE = (
    r"""(?si)<\w+[^>]*\bitemscope\b[^>]*\bitemtype=['"]([^'"]+)['"][^>]*>"""
)
_PROP_CONTENT_K = (
    r"""(?si)<\w+[^>]*\bitemprop=['"]([^'"]+)['"][^>]*\bcontent="""
    r"""['"][^'"]*['"][^>]*>"""
)
_PROP_CONTENT_V = (
    r"""(?si)<\w+[^>]*\bitemprop=['"][^'"]+['"][^>]*\bcontent="""
    r"""['"]([^'"]*)['"][^>]*>"""
)
# inner-text patterns must NOT also fire on content=-bearing tags: the
# [^>]* spans would otherwise cross a content attribute, double-emitting
# `p -> stray inner text` beside the content binding whenever such a tag
# has non-empty inner text. Java regex (Spark-side only; the oracles are
# fixture-replays, not regex) supports the tempered scan that walks the
# tag while refusing content=. The (?<![\w-]) lookbehind keeps the guard
# to the STANDALONE attribute name: data-content= (Bootstrap popovers)
# or xyzcontent= must not block extraction.
_NO_CONTENT = r"""(?:(?!(?<![\w-])content=)[^>])*"""
_PROP_TEXT_K = (
    r"""(?si)<\w+""" + _NO_CONTENT
    + r"""\bitemprop=['"]([^'"]+)['"]""" + _NO_CONTENT + r""">[^<]*</"""
)
_PROP_TEXT_V = (
    r"""(?si)<\w+""" + _NO_CONTENT
    + r"""\bitemprop=['"][^'"]+['"]""" + _NO_CONTENT + r""">([^<]*)</"""
)

# --- head metadata -----------------------------------------------------
_TITLE_RE = r"(?si)<title[^>]*>(.*?)</title\s*>"
_META_DESC_RE = (
    r"""(?si)<meta[^>]*name=['"]description['"][^>]*content=['"]([^'"]*)['"]"""
)
_CANONICAL_RE = (
    r"""(?si)<link[^>]*rel=['"]canonical['"][^>]*href=['"]([^'"]*)['"]"""
)
_OG_TITLE_RE = (
    r"""(?si)<meta[^>]*(?:property|name)=['"]og:title['"][^>]*"""
    r"""content=['"]([^'"]*)['"]"""
)
_OG_TYPE_RE = (
    r"""(?si)<meta[^>]*(?:property|name)=['"]og:type['"][^>]*"""
    r"""content=['"]([^'"]*)['"]"""
)
_ROBOTS_RE = (
    r"""(?si)<meta[^>]*name=['"]robots['"][^>]*content=['"]([^'"]*)['"]"""
)
_HREFLANG_RE = r"""(?si)<link[^>]*\bhreflang=['"][^'"]+['"][^>]*>"""
_TAG_RE = r"<[^>]+>"


def _html_str(docs: DataFrame, html_col: str):
    return (
        F.decode(F.col(html_col), "UTF-8")
        if dict(docs.dtypes)[html_col] == "binary"
        else F.col(html_col)
    )


def _clean(col):
    """Tag-strip + whitespace-collapse + trim (links.py anchor rule)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(col, _TAG_RE, " "), r"\s+", " ")
    )


def jsonld_triples(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """documents -> (url, block_idx, subj, pred, obj, *carry) from every
    application/ld+json block. Zero-shuffle narrow map: decode ->
    regexp_extract_all -> posexplode -> from_json(map<string,string>)
    -> explode. Spark's StringType JSON capture keeps nested values as
    raw JSON text, so no information is lost to the flat map view.
    ``carry`` names extra document columns to thread through (same
    contract as webtables.table_triples — avoids a join back)."""
    carry = tuple(carry)
    blocks = F.regexp_extract_all(
        _html_str(docs, html_col), F.lit(_LDJSON_RE), F.lit(1)
    )
    per_block = docs.select(
        F.col(url_col).alias("url"), blocks.alias("_b"), *carry
    ).select(
        "url", F.posexplode("_b").alias("block_idx", "_body"), *carry
    )
    mp = F.from_json(F.col("_body"), "map<string,string>")
    with_map = per_block.select(
        "url",
        "block_idx",
        F.coalesce(
            F.element_at(mp, "@id"),
            F.concat(
                F.col("url"), F.lit("#jsonld"), F.col("block_idx").cast("string")
            ),
        ).alias("subj"),
        mp.alias("_m"),
        *carry,
    ).filter(F.col("_m").isNotNull())
    kv = with_map.select(
        "url", "block_idx", "subj", F.explode("_m").alias("_k", "_v"), *carry
    ).filter(~F.col("_k").isin("@context", "@id"))
    return kv.select(
        "url",
        "block_idx",
        "subj",
        F.when(F.col("_k") == "@type", F.lit("a"))
        .otherwise(F.col("_k"))
        .alias("pred"),
        F.col("_v").alias("obj"),
        *carry,
    ).filter(F.col("obj").isNotNull() & (F.col("obj") != ""))


def microdata_triples(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """documents -> (url, item_idx, subj, pred, obj) under the flat-item
    model above. split() on the itemscope open tag yields segments;
    regexp_extract_all on the SAME pattern yields the itemtypes; the
    two arrays zip positionally (segment i+1 follows itemscope tag i).
    All narrow; the only explode is per item / per property.

    Attribute order: the html is first normalized so the itemscope
    token sits right after the tag name (_ITEMSCOPE_NORM_RE), making
    ``<div itemtype="..." itemscope>`` equivalent to
    ``<div itemscope itemtype="...">``."""
    html = F.regexp_replace(
        _html_str(docs, html_col), _ITEMSCOPE_NORM_RE, "<$1 itemscope$2"
    )
    types_arr = F.regexp_extract_all(html, F.lit(_ITEMSCOPE_RE), F.lit(1))
    segs_arr = F.split(html, _ITEMSCOPE_RE)
    base = docs.select(
        F.col(url_col).alias("url"),
        types_arr.alias("_types"),
        # segment 0 precedes the first item; align seg i+1 with type i
        F.slice(F.split(html, _ITEMSCOPE_RE), 2, F.size(segs_arr)).alias(
            "_segs"
        ),
    ).filter(F.size("_types") > 0)
    items = base.select(
        "url", F.posexplode(F.arrays_zip("_types", "_segs")).alias("item_idx", "_z")
    ).select(
        "url",
        "item_idx",
        F.col("_z._types").alias("_itemtype"),
        F.col("_z._segs").alias("_seg"),
        F.concat(
            F.col("url"), F.lit("#item"), F.col("item_idx").cast("string")
        ).alias("subj"),
    )
    type_rows = items.select(
        "url", "item_idx", "subj", F.lit("a").alias("pred"),
        F.col("_itemtype").alias("obj"),
    )
    # content= properties
    ck = F.regexp_extract_all(F.col("_seg"), F.lit(_PROP_CONTENT_K), F.lit(1))
    cv = F.regexp_extract_all(F.col("_seg"), F.lit(_PROP_CONTENT_V), F.lit(1))
    content_rows = (
        items.select(
            "url", "item_idx", "subj",
            F.explode(F.arrays_zip(ck.alias("k"), cv.alias("v"))).alias("_p"),
        )
        .select(
            "url", "item_idx", "subj",
            F.col("_p.k").alias("pred"), F.col("_p.v").alias("obj"),
        )
    )
    # inner-text properties (simple <tag itemprop=..>text</tag> pairs;
    # the tempered _NO_CONTENT spans refuse content=-bearing open tags,
    # so the two families can never double-emit)
    tk = F.regexp_extract_all(F.col("_seg"), F.lit(_PROP_TEXT_K), F.lit(1))
    tv = F.regexp_extract_all(F.col("_seg"), F.lit(_PROP_TEXT_V), F.lit(1))
    text_rows = (
        items.select(
            "url", "item_idx", "subj",
            F.explode(F.arrays_zip(tk.alias("k"), tv.alias("v"))).alias("_p"),
        )
        .select(
            "url", "item_idx", "subj",
            F.col("_p.k").alias("pred"), _clean(F.col("_p.v")).alias("obj"),
        )
    )
    out = type_rows.unionByName(content_rows).unionByName(text_rows)
    return out.filter(F.col("obj").isNotNull() & (F.col("obj") != ""))


def page_metadata(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """documents -> one row per page: (url, title, meta_description,
    canonical_url, og_title, og_type, robots_noindex, n_hreflang).
    Pure per-row regexp columns — zero shuffle, html read once."""
    html = _html_str(docs, html_col)
    first = lambda pat: F.regexp_extract(html, pat, 1)  # noqa: E731
    robots = F.lower(first(_ROBOTS_RE))
    return docs.select(
        F.col(url_col).alias("url"),
        _clean(first(_TITLE_RE)).alias("title"),
        _clean(first(_META_DESC_RE)).alias("meta_description"),
        F.trim(first(_CANONICAL_RE)).alias("canonical_url"),
        _clean(first(_OG_TITLE_RE)).alias("og_title"),
        F.trim(first(_OG_TYPE_RE)).alias("og_type"),
        robots.contains("noindex").alias("robots_noindex"),
        F.size(
            F.regexp_extract_all(html, F.lit(_HREFLANG_RE), F.lit(0))
        ).alias("n_hreflang"),
    )
