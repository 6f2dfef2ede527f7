"""End-to-end corpus curation DAG: the filter funnel a training-data
pipeline runs BEFORE anything expensive (kernels, embedding, training)
touches the corpus.

Stage order follows the standard web-pipeline recipe (CCNet / Gopher /
RefinedWeb): cheap row-local signals first, corpus-global passes last,
so each stage shrinks the input of the next:

  1. quality   — row-local expression (length / token-shape / stopword
                 score), pure codegen, no shuffle
  2. repetition— Gopher duplicate-token + top-bigram rules (one shuffle
                 keyed by (doc, bigram), partial-agged)
  3. exact dedup — one shuffle on md5(text); survivor = min doc id
  4. sampling  — deterministic diffused-hash stratified sample; pure
                 filter + broadcast rates (no corpus shuffle)

Each stage consumes only the previous stage's survivors, so the
corpus-global stages (3) run on the post-filter corpus — at 10^12 docs
this ordering is the difference between hashing every page and hashing
the ~half that survive the row-local screens.

``curate`` returns the surviving documents; ``curation_funnel`` returns
the (stage, n_rows) audit trail — the number every curation run reports
so a threshold change is reviewable before the expensive stages rerun.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepee_spark.operators.sampling import stratified_sample
from deepee_spark.operators.textstats import (quality_features,
                                              repetition_features)


def _quality_pass(docs: DataFrame, quality_min: float) -> DataFrame:
    q = quality_features(docs.select("doc_id", "text")).filter(
        F.col("quality") >= quality_min
    )
    return docs.join(q.select("doc_id"), "doc_id")


def _repetition_pass(docs: DataFrame) -> DataFrame:
    r = repetition_features(docs.select("doc_id", "text")).filter("keep")
    return docs.join(r.select("doc_id"), "doc_id")


def _exact_dedup_pass(docs: DataFrame) -> DataFrame:
    survivors = docs.groupBy(F.md5("text").alias("_h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return docs.join(survivors.select("doc_id"), "doc_id")


def curate(docs: DataFrame, rates: DataFrame, quality_min: float = 0.9,
           default_permille: int = 200) -> dict[str, DataFrame]:
    """Run the funnel; returns {stage_name: surviving DataFrame} in
    stage order, 'input' first, final stage last."""
    stages: dict[str, DataFrame] = {"input": docs}
    stages["quality"] = _quality_pass(docs, quality_min)
    stages["repetition"] = _repetition_pass(stages["quality"])
    stages["exact_dedup"] = _exact_dedup_pass(stages["repetition"])
    stages["sample"] = stratified_sample(
        stages["exact_dedup"], "doc_id", "lang", rates,
        default_permille=default_permille,
    ).drop("sample_bucket")
    return stages


def run_curation(docs: DataFrame, rates: DataFrame, catalog,
                 input_fingerprint: str, quality_min: float = 0.9,
                 default_permille: int = 200,
                 resume: bool = True) -> tuple[DataFrame, dict]:
    """Durable funnel: each stage's survivors commit as an atomic
    StageCatalog snapshot before the next stage reads them — the same
    kill/resume contract as the main documents→triples DAG. A resumed
    run whose snapshots are current for this input fingerprint skips
    every stage's compute (catalog.is_current), and the per-stage row
    counts come from the writes' Observation counters for free
    (pipeline_runs.jsonl) instead of extra count jobs.

    Returns (final survivors, {stage: 'ran'|'skipped'}).
    """
    fp = lambda s: f"{input_fingerprint}/curation/{s}/q{quality_min}/p{default_permille}/v1"  # noqa: E731
    status: dict[str, str] = {}

    def stage(name: str, build) -> DataFrame:
        # same resume-or-build-and-commit contract as Pipeline._stage
        # (StageCatalog.stage), so a change to the currency/replay
        # rules lands in both DAGs at once
        df, ran, _ = catalog.stage(
            docs.sparkSession, name, fp(name), build, resume
        )
        status[name] = "ran" if ran else "skipped"
        return df

    quality = stage("cur_quality", lambda: _quality_pass(docs, quality_min))
    rep = stage("cur_repetition", lambda: _repetition_pass(quality))
    ded = stage("cur_exact_dedup", lambda: _exact_dedup_pass(rep))
    samp = stage(
        "cur_sample",
        lambda: stratified_sample(
            ded, "doc_id", "lang", rates, default_permille=default_permille
        ).drop("sample_bucket"),
    )
    return samp, status


def curation_funnel(docs: DataFrame, rates: DataFrame,
                    quality_min: float = 0.9,
                    default_permille: int = 200) -> DataFrame:
    """(stage, stage_idx, n_rows) audit counts for the whole funnel,
    one row per stage, as a union of aggregates (one job, no driver
    loop of .count() actions). Catalyst does NOT share the common
    prefix between union branches, so stage K's subtree re-runs for
    every later branch — fine for this audit query at bench scale, but
    a production 10^12-doc run gets these counts for free instead:
    each curate() stage is committed through StageCatalog.write, whose
    Observation counters land the per-stage row counts in
    pipeline_runs.jsonl as a side effect of the write."""
    stages = curate(docs, rates, quality_min, default_permille)
    counts = [
        df.agg(
            F.lit(name).alias("stage"),
            F.lit(i).cast("long").alias("stage_idx"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        for i, (name, df) in enumerate(stages.items())
    ]
    return functools.reduce(DataFrame.unionByName, counts)
