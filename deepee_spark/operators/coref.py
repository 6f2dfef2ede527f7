"""Coreference-lite — rule-based pronoun-to-antecedent resolution.

Full neural coreference is out of scope for a 100 TB extraction pass
(and for the reference, which has no coref at all); what a KG build
actually loses without ANY coref is recall on pronoun-argument events
("Smith founded Acme. He later sold it.") — the second sentence's
arguments never reach linking. The classic cheap recovery (the
Hobbs-distance / recency baseline from the public coref literature) is
purely positional: a pronoun resolves to the NEAREST PRECEDING entity
mention in the same document.

Rules (documented; both engines implement the same):
  - tokens = whitespace split of the lowercased text, 0-indexed;
  - entity mentions = tokens matching the (broadcast) surface
    dictionary — the same exact-match discipline as
    operators/salience.py, linking handles normalization;
  - pronouns = tokens in PRONOUNS;
  - a pronoun resolves to the nearest preceding mention (strictly
    smaller position); pronouns before any mention stay unresolved
    and are dropped;
  - max_distance (tokens) caps the lookback — a pronoun 200 tokens
    after the last mention is noise, not anaphora.

Shape: tokenize + posexplode narrow; ONE window per document
(partitionBy doc, orderBy pos — bounded by doc length, never global)
computing last-mention-so-far with last_value(ignorenulls); the
entity dictionary joins broadcast. Output rows feed
mentions_from_arguments-style downstream linking as extra surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

PRONOUNS = ["he", "she", "it", "they", "him", "her", "them", "its"]


def resolve_pronouns(
    docs: DataFrame,
    entities: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    surface_col: str = "surface",
    max_distance: int = 50,
) -> DataFrame:
    """-> (id, pos, pronoun, antecedent, antecedent_pos): one row per
    resolved pronoun occurrence."""
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+")).alias(
            "pos", "tok"
        ),
    )
    dim = entities.select(
        F.lower(F.col(surface_col)).alias("tok"),
        F.lit(True).alias("_is_ent"),
    ).distinct()
    marked = toks.join(F.broadcast(dim), "tok", "left")
    w = (
        W.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    ent_tok = F.when(F.col("_is_ent"), F.col("tok"))
    ent_pos = F.when(F.col("_is_ent"), F.col("pos"))
    resolved = marked.select(
        F.col(id_col),
        "pos",
        F.col("tok").alias("pronoun"),
        F.last(ent_tok, ignorenulls=True).over(w).alias("antecedent"),
        F.last(ent_pos, ignorenulls=True).over(w).alias("antecedent_pos"),
    ).filter(F.col("pronoun").isin(PRONOUNS))
    return resolved.filter(
        F.col("antecedent").isNotNull()
        & (F.col("pos") - F.col("antecedent_pos") <= max_distance)
    ).select(
        id_col, "pos", "pronoun", "antecedent",
        F.col("antecedent_pos").cast("int").alias("antecedent_pos"),
    )
