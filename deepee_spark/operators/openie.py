"""Open information extraction — lexicon-gated surface-pattern triples.

The reference's extractors are *closed*-schema (ACE/DuEE event types
with fixed roles). A web-scale KG build also wants the open channel:
ReVerb-style (Fader et al., EMNLP 2011 — public) surface patterns
``NP  rel-phrase  NP`` mined directly from text, no trained model in
the loop. This is the deterministic core of that idea, deliberately
restricted so the semantics are identical across engines:

  - sentences = text split on ``[.!?]`` followed by whitespace/EOS;
  - NPs = maximal runs of Capitalized tokens (``[A-Z][a-zA-Z]*``,
    1..4 words) — the proper-noun approximation of ReVerb's NP chunks;
  - relation phrase = a verb (+ optional particle/preposition) drawn
    from a fixed public lexicon (``RELATION_LEXICON``), lowercase in
    text, possibly followed by one preposition from ``PREPOSITIONS``;
  - a triple fires when a sentence contains NP1 rel NP2 with nothing
    but the relation phrase between the NPs;
  - confidence = ReVerb's frequency prior stand-in: triples whose
    relation was seen with >= ``min_rel_freq`` distinct argument pairs
    corpus-wide survive ``filter_by_rel_freq`` (the classic open-IE
    precision lever).

Extraction is a zero-shuffle narrow map (split + regexp per row);
the frequency filter is ONE groupBy on the relation string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RELATION_LEXICON = [
    "acquired", "founded", "launched", "joined", "visited", "met",
    "hired", "sued", "bought", "married", "leads", "owns", "runs",
    "advises", "backs",
]
PREPOSITIONS = ["in", "at", "from", "with", "for"]

_NP = r"[A-Z][a-zA-Z]*(?: [A-Z][a-zA-Z]*){0,3}"


def _pattern() -> str:
    rel = "|".join(RELATION_LEXICON)
    prep = "|".join(PREPOSITIONS)
    return (
        rf"({_NP}) ((?:{rel})(?: (?:{prep}))?) ({_NP})"
    )


def extract_open_triples(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """text -> (id, sent_idx, subj, rel, obj): every lexicon-gated
    ``NP rel NP`` match per sentence. Matches are non-overlapping
    left-to-right (Java regex scan order — the documented rule)."""
    sents = F.split(F.col(text_col), r"[.!?]\s+|[.!?]$")
    per_sent = docs.select(
        F.col(id_col), F.posexplode(sents).alias("sent_idx", "_sent")
    ).filter(F.col("_sent") != "")
    pat = _pattern()
    subs = F.regexp_extract_all("_sent", F.lit(pat), F.lit(1))
    rels = F.regexp_extract_all("_sent", F.lit(pat), F.lit(2))
    objs = F.regexp_extract_all("_sent", F.lit(pat), F.lit(3))
    return per_sent.select(
        id_col,
        "sent_idx",
        F.explode(
            F.arrays_zip(subs.alias("subj"), rels.alias("rel"), objs.alias("obj"))
        ).alias("_t"),
    ).select(
        id_col,
        "sent_idx",
        F.col("_t.subj").alias("subj"),
        F.col("_t.rel").alias("rel"),
        F.col("_t.obj").alias("obj"),
    )


def filter_by_rel_freq(triples: DataFrame, min_rel_freq: int = 2) -> DataFrame:
    """Keep triples whose relation string ties together at least
    ``min_rel_freq`` DISTINCT (subj, obj) pairs corpus-wide — the
    open-IE frequency-prior precision filter. One agg + one broadcast
    semi-join (the distinct-relation table is tiny next to the corpus:
    bounded by the lexicon x preposition cross)."""
    keep = (
        triples.groupBy("rel")
        .agg(F.count_distinct("subj", "obj").alias("n_pairs"))
        .filter(F.col("n_pairs") >= min_rel_freq)
        .select("rel")
    )
    return triples.join(F.broadcast(keep), "rel", "left_semi")
