"""Structured Streaming ingest: micro-batch output == batch output."""

from __future__ import annotations

from deepee_spark.corpus import corpus_df
from deepee_spark.extract import documents_stage
from deepee_spark.functions.featurize import featurize_sentences
from deepee_spark.plans.pipeline import arguments_from_triggers, triggers_from_sentences
from deepee_spark.segment import sentences_stage
from deepee_spark.streaming.ingest import run_stream


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "docs")
    sink = str(tmp_path / "args")
    ckpt = str(tmp_path / "ckpt")
    docs = corpus_df(spark, 40)
    docs.write.parquet(src)

    run_stream(spark, src, sink, ckpt, available_now=True)
    streamed = spark.read.parquet(sink)

    batch = arguments_from_triggers(
        triggers_from_sentences(
            featurize_sentences(sentences_stage(documents_stage(docs)))
        )
    )
    key = ["url", "sent_id", "trigger_pos", "event_type", "arg_pos", "role"]
    assert streamed.count() == batch.count()
    assert streamed.select(*key).exceptAll(batch.select(*key)).count() == 0

    # idempotent restart: draining again adds nothing (checkpoint dedupe)
    run_stream(spark, src, sink, ckpt, available_now=True)
    assert spark.read.parquet(sink).count() == batch.count()
