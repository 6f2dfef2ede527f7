"""Benchmark decontamination — n-gram overlap against an eval set.

A training corpus that contains the eval benchmarks poisons every score
computed on them, so large-scale pipelines run a decontamination pass:
flag (or drop) any training document sharing at least one token n-gram
with any benchmark document (the 8-to-13-gram overlap rule used by the
public GPT-3 / Llama data cards).

Scale shape — the whole point of doing this in Spark:

  * the benchmark side is TINY (suites are megabytes); its distinct
    n-grams are broadcast, so the 100 TB training side streams through
    a broadcast hash join with NO shuffle of the corpus.
  * only MATCHED (doc, gram) rows reach the per-doc aggregation, so the
    one real shuffle is proportional to contamination volume, not
    corpus volume.
  * gram construction is pure Catalyst array ops (split / slice /
    concat_ws under transform) — whole-stage codegen, no Python.

Reference parity note: the reference (zjunlp/DeepEE) has no curation
layer; this extends the training-data operator family
(SURVEY.md "LLM-data-pipeline operators") alongside dedup/textstats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import tokens_of


def ngram_set(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) rows: every position-wise token n-gram of the
    lowercased, whitespace-tokenized text. Docs shorter than n tokens
    produce no rows."""
    toks = tokens_of(F.lower(F.col(text_col)))
    # sequence(1, k) DESCENDS for k < 1, so guard sub-n docs explicitly
    positions = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        positions, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )
    return df.select(
        F.col(id_col), F.explode(grams).alias("gram")
    )


def ngram_contamination(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Contaminated training docs: (id, n_hits) where n_hits is the
    number of DISTINCT n-grams the doc shares with the eval set.
    Join on the gram string itself (exact semantics, still
    broadcastable); switch to gram hashes only if a benchmark suite
    ever outgrows the broadcast threshold."""
    corpus_grams = ngram_set(docs, id_col, text_col, n)
    eval_grams = (
        ngram_set(eval_docs, id_col, text_col, n)
        .select("gram")
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.countDistinct("gram").cast("long").alias("n_hits"))
    )
