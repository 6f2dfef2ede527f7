"""Entity salience scoring — which entities a page is *about*.

A KG built from web pages needs more than mention spotting: ranking,
dedup-survivor choice, and crawl prioritization all want to know
whether a page is ABOUT an entity or merely mentions it. The classic
salience features (public: Gamon et al. 2013, Dunietz & Gillick 2014)
are positional and frequency-based — first-mention position, mention
count, title presence. This operator computes them with integer-exact
arithmetic so the ranking is engine-reproducible.

Score (documented, both engines): with T = doc token count,
f = first-mention token index, n = mention count, t = in-title flag:

    salience = 100*n + 50*t + (T - f)

— count dominates, the title bonus breaks near-ties, earlier first
mention wins the remainder. All integers; no float drift.

Shape: doc_tokens and the title flag are computed BEFORE the explode
and ride the exploded rows as constants (no join back to the doc
table — at 10^12 docs that join would shuffle the whole corpus); the
entity match is a BROADCAST join against the small surface dimension;
ONE shuffle total — the (doc, entity) aggregation, with map-side
partial aggs doing the heavy lifting since mentions repeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_salience(
    docs: DataFrame,
    entities: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    title_col: str | None = "title",
    surface_col: str = "surface",
) -> DataFrame:
    """(doc, text[, title]) x entities(surface) ->
    (id, surface, n_mentions, first_pos, in_title, doc_tokens,
    salience). Tokens = whitespace split, exact lowercase match against
    the surface dimension (normalization beyond lowercasing is the
    linking stage's job)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    title_words = (
        F.split(F.lower(F.col(title_col)), r"\s+")
        if title_col
        else F.array().cast("array<string>")
    )
    toks = docs.select(
        F.col(id_col),
        F.size(words).alias("doc_tokens"),
        title_words.alias("_title_words"),
        F.posexplode(words).alias("pos", "tok"),
    )
    dim = entities.select(F.lower(F.col(surface_col)).alias("tok")).distinct()
    hits = toks.join(F.broadcast(dim), "tok")
    agg = hits.groupBy(id_col, "tok").agg(
        F.count(F.lit(1)).cast("int").alias("n_mentions"),
        F.min("pos").cast("int").alias("first_pos"),
        F.max("doc_tokens").cast("int").alias("doc_tokens"),
        F.max(
            F.array_contains(F.col("_title_words"), F.col("tok")).cast("int")
        ).alias("in_title"),
    )
    return agg.select(
        F.col(id_col),
        F.col("tok").alias("surface"),
        "n_mentions",
        "first_pos",
        F.col("in_title").cast("int").alias("in_title"),
        "doc_tokens",
        (
            F.lit(100) * F.col("n_mentions")
            + F.lit(50) * F.col("in_title")
            + (F.col("doc_tokens") - F.col("first_pos"))
        ).cast("int").alias("salience"),
    )
