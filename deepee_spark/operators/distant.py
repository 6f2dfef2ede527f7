"""Distant-supervision labeling for relation-extraction training data.

The classic KG bootstrap (Mintz et al., ACL'09 — public): align a text
corpus with an existing KB — every context (sentence/doc) mentioning an
entity pair that the KB relates becomes a positively-labeled training
example for that relation; co-occurrences the KB does NOT relate become
'NA' negatives, downsampled because they dwarf the positives. This is
how the extraction kernels' successors get their training corpora at
web scale, closing the loop triples -> more training data -> better
triples.

Scale shape: ONE equi-join of the context pairs against the KB on
(subj, obj) — broadcast when the KB side fits, shuffle otherwise; the
planner chooses. NA downsampling is the engine-wide deterministic
hash-bucket filter (operators/sampling.sample_bucket's construction):
a pure filter, no shuffle, task-retry stable. Bag grouping for
multi-instance training (all contexts of one pair in one row) is a
single groupBy on the pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import sample_bucket


def distant_supervision(
    contexts: DataFrame,
    kb: DataFrame,
    na_keep_permille: int = 100,
) -> DataFrame:
    """-> (ctx_id, subj, obj, pred): every context pair labeled with
    its KB relation; pairs absent from the KB become 'NA' and survive
    with probability na_keep_permille/1000 (deterministic in
    (ctx_id, subj, obj) — a retried task regenerates the same sample).
    A pair related by k predicates yields k positive rows (the
    standard multi-label convention).

    contexts: (ctx_id, subj, obj); kb: (subj, pred, obj).
    """
    if not 0 <= na_keep_permille <= 1000:
        raise ValueError("na_keep_permille must be in [0, 1000]")
    labeled = contexts.join(kb, ["subj", "obj"], "left")
    positives = labeled.filter(F.col("pred").isNotNull())
    na_bucket = sample_bucket(
        F.concat_ws("|", F.col("ctx_id"), F.col("subj"), F.col("obj"))
    )
    negatives = (
        labeled.filter(F.col("pred").isNull())
        .filter(na_bucket < na_keep_permille)
        .withColumn("pred", F.lit("NA"))
    )
    return positives.unionByName(negatives).select(
        "ctx_id", "subj", "obj", "pred"
    )


def supervision_bags(labeled: DataFrame) -> DataFrame:
    """Multi-instance (bag) view: one row per (subj, obj, pred) with
    the sorted context list — the at-least-one assumption's training
    unit (the A2 bag-argmax eval consumes predictions at this grain).
    One partial-agged shuffle on the bag key."""
    return labeled.groupBy("subj", "obj", "pred").agg(
        F.sort_array(F.collect_list("ctx_id")).alias("ctx_ids"),
        F.count(F.lit(1)).cast("long").alias("n_contexts"),
    )
