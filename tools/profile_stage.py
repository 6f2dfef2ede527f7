"""Decompose one pipeline stage's wall time at a given parallelism.

The scaling campaigns (tools/scaling_bench.py, BENCH/BASELINE.md §3)
show a corpus-size-constant per-stage latency that bounds strong
scaling. This probe isolates WHERE a snapshot-to-snapshot stage spends
its wall: input scan, parquet write round-trip, or the stage's own
compute — so the constant can be attributed and cut instead of guessed
at.

    python tools/profile_stage.py --docs 400000 --master 'local[16]'

Prints one JSON line: scan/identity-write/stage-compute/stage-write
seconds (best of --reps), plus the scan partition count.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--master", default="local[16]")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from deepee_spark.corpus import corpus_df
    from deepee_spark.extract import documents_stage
    from deepee_spark.functions.featurize import featurize_sentences
    from deepee_spark.segment import sentences_stage
    from deepee_spark.session import get_spark

    spark = get_spark("profile-stage", master=args.master)
    cores = spark.sparkContext.defaultParallelism

    root = tempfile.mkdtemp(prefix="profile_stage_")
    ext_path = os.path.join(root, "extracted")
    try:
        # fixture: the 'extracted' snapshot exactly as the pipeline
        # writes it at this parallelism (untimed)
        docs = corpus_df(spark, args.docs)
        documents_stage(docs.repartition(cores, F.xxhash64("url"))).write.mode(
            "overwrite"
        ).parquet(ext_path)

        def scan():
            spark.read.parquet(ext_path).count()

        def identity_write():
            out = os.path.join(root, "ident")
            shutil.rmtree(out, ignore_errors=True)
            spark.read.parquet(ext_path).write.mode("overwrite").parquet(out)

        def stage_compute():
            featurize_sentences(
                sentences_stage(spark.read.parquet(ext_path))
            ).write.format("noop").mode("overwrite").save()

        def stage_write():
            out = os.path.join(root, "sent")
            shutil.rmtree(out, ignore_errors=True)
            featurize_sentences(
                sentences_stage(spark.read.parquet(ext_path))
            ).write.mode("overwrite").parquet(out)

        # warm pass (JIT/codegen/workers), then timed best-of
        for fn in (scan, identity_write, stage_compute, stage_write):
            fn()
        result = {
            "master": args.master,
            "docs": args.docs,
            "scan_partitions": spark.read.parquet(ext_path).rdd.getNumPartitions(),
            "scan_sec": timed(scan, args.reps),
            "identity_write_sec": timed(identity_write, args.reps),
            "stage_compute_sec": timed(stage_compute, args.reps),
            "stage_write_sec": timed(stage_write, args.reps),
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
