"""End-to-end DAG: triple agreement, resume, determinism, column pruning."""

from __future__ import annotations

from deepee_spark.corpus import corpus_df, gold_triples_df
from deepee_spark.operators.metrics import tuple_set_prf
from deepee_spark.plans.pipeline import Pipeline
from deepee_spark.sources.tables import StageCatalog

N_DOCS = 80
KEYS = ["url", "subj", "pred", "obj"]


def test_end_to_end_triple_agreement(spark, catalog):
    docs = corpus_df(spark, N_DOCS)
    pipe = Pipeline(spark, catalog)
    triples = pipe.run(docs, f"corpus:{N_DOCS}", resume=False)
    gold = gold_triples_df(spark, N_DOCS)
    m = tuple_set_prf(triples, gold, KEYS)
    assert m["n_gold"] > 50
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95  # BASELINE.md §2
    assert m["precision"] == 1.0 and m["recall"] == 1.0  # constructed weights


def test_resume_skips_completed_stages(spark, tmp_path):
    root = str(tmp_path / "cat")
    docs = corpus_df(spark, 30)
    p1 = Pipeline(spark, StageCatalog(root))
    t1 = p1.run(docs, "corpus:30", resume=True)
    n1 = t1.count()
    assert p1.skipped == []

    p2 = Pipeline(spark, StageCatalog(root))
    t2 = p2.run(docs, "corpus:30", resume=True)
    assert p2.ran == [] and len(p2.skipped) == 8
    assert t2.count() == n1

    # changed fingerprint -> full recompute
    p3 = Pipeline(spark, StageCatalog(root))
    p3.run(docs, "corpus:30/v2", resume=True)
    assert p3.skipped == []


def test_partial_resume_after_kill(spark, tmp_path):
    """Kill after stage N (drop later tables), rerun: earlier stages skipped."""
    root = str(tmp_path / "cat")
    docs = corpus_df(spark, 30)
    cat = StageCatalog(root)
    Pipeline(spark, cat).run(docs, "corpus:30", resume=True)
    for stage in ["arguments", "linked", "canonical", "triples"]:
        cat.drop(stage)
    p = Pipeline(spark, StageCatalog(root))
    p.run(docs, "corpus:30", resume=True)
    assert set(p.skipped) == {"documents", "extracted", "sentences", "triggers"}
    assert set(p.ran) == {"arguments", "linked", "canonical", "triples"}


def test_lineage_columns_stamped(spark, catalog):
    docs = corpus_df(spark, 20)
    pipe = Pipeline(spark, catalog)
    pipe.run(docs, "corpus:20", resume=False)
    sent = catalog.read(spark, "sentences")
    assert {"_run_id", "_stage", "_part_id"} <= set(sent.columns)
    assert sent.select("_stage").distinct().collect()[0][0] == "sentences"


def test_html_binary_dies_at_extracted(spark, catalog):
    """The html column must not survive past the extraction stage (scan
    width at 100 TB is dominated by it)."""
    docs = corpus_df(spark, 20)
    pipe = Pipeline(spark, catalog)
    pipe.run(docs, "corpus:20", resume=False)
    for stage in ["extracted", "sentences", "triggers", "arguments", "triples"]:
        cols = catalog.read(spark, stage).columns
        assert "html" not in cols, stage
