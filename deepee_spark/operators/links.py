"""Web link-graph extraction — the WAT-file side of a Common-Crawl
pipeline.

A KG built from web pages wants more than the page text: the hyperlink
structure carries entity salience (host PageRank feeds linking priors)
and crawl frontier signal. The reference has no analogue (DeepEE stops
at sentence extraction); this is the standard web-archive companion:
per page, the outgoing <a href> edges with their anchor text, rolled up
to a (src_host, dst_host, n_links) host graph the existing graph ops
(pagerank_int, co_neighbors, ...) consume directly.

Spark-native all the way: html decodes once, <a> elements surface via
regexp_extract_all, and href/anchor parse AFTER a posexplode — plain
per-row regexp_extract columns, deliberately NOT lambda higher-order
functions (pyspark 4.1.2 mis-evaluates multi-lambda-site plans; see
operators/negatives.py). The html column is read exactly once and
pruned from everything downstream, same discipline as extract.py.

Resolution rules (documented, both engines implement the same three):
  - absolute http(s)://...  -> kept as-is
  - root-relative /path     -> https:// + src host + path
  - everything else (fragments, mailto:, protocol-relative, empty)
    -> dropped
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# <a ...> open tag through matching close; DOTALL so anchors may wrap
_A_RE = r"(?s)<a\s[^>]*>.*?</a\s*>"
_HREF_RE = r"""(?s)<a\s[^>]*href=['"]([^'"]*)['"]"""
_ANCHOR_RE = r"(?s)<a\s[^>]*>(.*?)</a"
_TAG_RE = r"<[^>]+>"
_HOST_RE = r"^https?://([^/]+)"


def extract_outlinks(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """documents -> (src_url, dst_url, anchor): one row per resolvable
    <a href> in the page, anchor text tag-stripped and whitespace-
    collapsed. Narrow per-row work (decode + regex); the only wide op
    downstream is whatever the caller aggregates."""
    a_tags = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"), F.lit(_A_RE), F.lit(0)
    )
    exploded = docs.select(
        F.col(url_col).alias("src_url"), a_tags.alias("_a")
    ).select("src_url", F.explode("_a").alias("_tag"))
    href = F.regexp_extract("_tag", _HREF_RE, 1)
    anchor = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract("_tag", _ANCHOR_RE, 1), _TAG_RE, " "
            ),
            r"\s+",
            " ",
        )
    )
    src_host = F.regexp_extract("src_url", _HOST_RE, 1)
    dst = F.when(href.rlike("^https?://"), href).when(
        href.rlike("^/") & ~href.rlike("^//"),
        F.concat(F.lit("https://"), src_host, href),
    )
    return (
        exploded.select(
            "src_url", dst.alias("dst_url"), anchor.alias("anchor")
        )
        .filter(F.col("dst_url").isNotNull())
    )


def host_graph(outlinks: DataFrame) -> DataFrame:
    """(src_url, dst_url, ...) -> (src_host, dst_host, n_links):
    host-level rollup, self-links (intra-host navigation) dropped —
    they dominate raw counts and carry no cross-site signal. ONE
    shuffle (the host-pair agg); map-side partials do the heavy
    lifting since pages repeat the same host pairs."""
    pairs = outlinks.select(
        F.regexp_extract("src_url", _HOST_RE, 1).alias("src_host"),
        F.regexp_extract("dst_url", _HOST_RE, 1).alias("dst_host"),
    ).filter(
        (F.col("src_host") != "")
        & (F.col("dst_host") != "")
        & (F.col("src_host") != F.col("dst_host"))
    )
    return pairs.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links")
    )


def anchor_aliases(outlinks: DataFrame, min_count: int = 1) -> DataFrame:
    """(src_url, dst_url, anchor) -> (surface, dst_host, n): the
    anchor-text alias dictionary — how the web refers to each target —
    the classic linking prior (the public Wikipedia-anchor-dictionary
    technique): P(entity | surface) ∝ n. Surfaces are lowercased and
    digit-normalized (the SC6 rule entity linking already applies to
    mentions, operators/linking.py) so the two sides of the
    mention ⋈ alias join normalize identically. ONE shuffle (the
    (surface, dst_host) agg); min_count prunes the long tail of
    one-off anchors before the dictionary broadcasts into the linking
    join."""
    surface = F.regexp_replace(F.lower(F.col("anchor")), "[0-9]", "0")
    out = (
        outlinks.select(
            surface.alias("surface"),
            F.regexp_extract("dst_url", _HOST_RE, 1).alias("dst_host"),
        )
        .filter((F.col("surface") != "") & (F.col("dst_host") != ""))
        .groupBy("surface", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return out.filter(F.col("n") >= min_count) if min_count > 1 else out
