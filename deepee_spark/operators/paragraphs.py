"""Paragraph-level boilerplate removal (RefinedWeb/CCNet-style).

Web pages share paragraphs — cookie banners, nav footers, "subscribe"
blurbs — that document-level dedup never touches because the payload
around them differs. The standard fix (Penedo et al. 2023 §3.3, CCNet)
is corpus-wide paragraph frequency: split every document into
paragraphs, count in how many distinct documents each paragraph
occurs, and drop paragraphs above a repetition threshold from *every*
document, reassembling the survivors in original order.

Distributed shape (three shuffles, all on partial-agged or hashed keys):
  1. posexplode paragraphs, key them by xxhash64 — the join/agg key is
     a fixed-width long, never the paragraph text itself, so the
     shuffle payload stays narrow.
  2. countDistinct(doc) per paragraph hash (partial-agged map-side).
  3. join frequencies back (shuffle on the same hash — co-located with
     2's output partitioning), filter, then groupBy doc to reassemble
     with an array_sort on position.

The frequent-paragraph keys are exactly the skewed ones; the frequency
side is one row per distinct paragraph, so skew lands on the exploded
side where AQE's skew-join splitting applies. A 64-bit hash collision
could conflate two paragraphs corpus-wide; at 10^12 paragraphs the
expected collision count is ~0.03 (birthday bound), and a collision
only ever *drops* an extra paragraph, never corrupts text.

Documents whose every paragraph is boilerplate vanish from the output
(inner join semantics) — by design: an all-boilerplate page carries no
training signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARA_SEP = "\n\n"


def explode_paragraphs(df: DataFrame, text_col: str = "text",
                       doc_col: str = "doc_id",
                       sep: str = PARA_SEP) -> DataFrame:
    """One row per (doc, position, paragraph), empty paragraphs dropped."""
    pe = F.posexplode(F.split(F.col(text_col), sep))
    return (
        df.select(doc_col, pe.alias("pos", "para"))
        .filter(F.col("para") != "")
        .withColumn("para_hash", F.xxhash64("para"))
    )


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    doc_col: str = "doc_id", sep: str = PARA_SEP,
                    max_docs: int = 2) -> DataFrame:
    """Drop paragraphs occurring in more than ``max_docs`` distinct
    documents; return (doc, text, n_paras_kept) with survivors rejoined
    in original order."""
    paras = explode_paragraphs(df, text_col, doc_col, sep)
    freq = paras.groupBy("para_hash").agg(
        F.countDistinct(doc_col).alias("n_docs")
    )
    kept = (
        paras.join(freq, "para_hash")
        .filter(F.col("n_docs") <= max_docs)
    )
    return kept.groupBy(doc_col).agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_paras_kept"),
    )
