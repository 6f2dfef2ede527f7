"""spark-submit entry point for the daily crawl-drop composition.

Runs plans/pipeline.Pipeline.process_crawl_drop over one drop of
documents against a durable warehouse: Bloom frontier gating, MinHash
near-dedup against corpus history, incremental ingest of the novel
slice, host-link accumulation — every sub-step replay-idempotent under
the drop's fingerprint, so re-submitting a crashed drop is safe.

Production invocation:

    zip -r deepee_spark.zip deepee_spark
    spark-submit --master <cluster> --py-files deepee_spark.zip \
        tools/run_drop.py --input <drop parquet> \
        --warehouse <stage-table root> --drop-id 2026-08-21

Sandbox smoke:

    python tools/run_drop.py --docs 2000 --warehouse /tmp/wh \
        --drop-id d1 --master 'local[8]'

Prints one JSON line: wall seconds, admitted/near-dup/novel counts,
triples total, and docs/sec over the admitted set.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--docs", type=int, help="generate a synthetic drop of N docs")
    src.add_argument("--input", help="existing drop parquet path")
    ap.add_argument("--warehouse", required=True, help="stage-table root dir")
    ap.add_argument("--drop-id", required=True, help="drop fingerprint")
    ap.add_argument("--master", default=None)
    ap.add_argument("--min-jaccard", type=float, default=0.5)
    args = ap.parse_args()

    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.session import get_spark
    from deepee_spark.sources.tables import StageCatalog

    spark = get_spark("run_drop", master=args.master)
    if args.docs is not None:
        from deepee_spark.corpus import corpus_df

        docs = corpus_df(spark, args.docs)
    else:
        docs = spark.read.parquet(args.input)

    pipe = Pipeline(spark, StageCatalog(args.warehouse))
    t0 = time.time()
    r = pipe.process_crawl_drop(
        docs, f"drop:{args.drop_id}", min_jaccard=args.min_jaccard
    )
    wall = time.time() - t0
    out = {
        "drop_id": args.drop_id,
        "wall_sec": round(wall, 3),
        "n_admitted": r["n_admitted"],
        "n_near_dup": r["n_near_dup"],
        "n_novel": r["n_admitted"] - r["n_near_dup"],
        "n_triples_total": r["triples"].count(),
        "docs_per_sec": round(r["n_admitted"] / wall, 2) if wall else None,
        "skipped": pipe.skipped,
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
