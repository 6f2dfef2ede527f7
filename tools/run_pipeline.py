"""spark-submit entry point for the documents->triples KG pipeline.

Production invocation (north rule: spark-submit --py-files, resumable):

    zip -r deepee_spark.zip deepee_spark
    # multi-node clusters: also make the zip visible to executors for
    # the custom worker daemon (shared FS path, or
    # --conf spark.executorEnv.PYTHONPATH=<staged zip>); single-node /
    # local runs self-heal via session.get_spark
    spark-submit --master <cluster> --py-files deepee_spark.zip \
        tools/run_pipeline.py --input <documents table> \
        --warehouse <stage-table root> --run-id nightly-42 --resume

Sandbox invocation (also what tools/scaling_bench.py shells out to):

    python tools/run_pipeline.py --docs 16000 --master 'local[8]' \
        --warehouse /tmp/wh --json

With --docs N the deterministic synthetic corpus (deepee_spark.corpus) is
generated executor-side; with --input PATH an existing parquet/Iceberg
documents table (url, warc_ts, html, text, lang) is read instead.

Prints one JSON line with wall seconds, docs/sec, triples/sec, and the
ran/skipped stage lists (the resume evidence).
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
    src.add_argument("--docs", type=int, help="generate a synthetic corpus of N docs")
    src.add_argument("--input", help="existing documents parquet path")
    ap.add_argument("--warehouse", required=True, help="stage-table root dir")
    ap.add_argument("--master", default=None, help="override spark master")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--resume", action="store_true", help="skip current stages")
    ap.add_argument("--warmup-docs", type=int, default=0,
                    help="run a throwaway pipeline of N docs first (JIT warm)")
    ap.add_argument("--steady", action="store_true",
                    help="steady-state timing: run the full job once to warm "
                         "JIT/codegen/workers (a cluster runs this pipeline "
                         "continuously), then time a second identical run "
                         "into a fresh warehouse")
    ap.add_argument("--json", action="store_true", help="print one JSON line")
    ap.add_argument("--checkpoint", default="all",
                    choices=["all", "kernels", "final"],
                    help="'all' snapshots every stage; 'kernels' commits only "
                         "documents/sentences/arguments/triples (narrow chains "
                         "and the gazetteer-bounded tail fused; resume past "
                         "all kernel compute); 'final' is flow-through — one "
                         "commit, Spark-native task retry, no stage resume")
    ap.add_argument("--graph", action="store_true",
                    help="also materialize the nodes/edges graph tables "
                         "from the committed triples (north-star "
                         "triple/node/edge materialization)")
    args = ap.parse_args()

    from deepee_spark.corpus import corpus_df
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.session import get_spark
    from deepee_spark.sources.tables import StageCatalog

    spark = get_spark("deepee-pipeline", master=args.master)
    cores = spark.sparkContext.defaultParallelism

    if args.warmup_docs:
        import tempfile

        with tempfile.TemporaryDirectory() as wroot:
            wdocs = corpus_df(spark, args.warmup_docs)
            Pipeline(spark, StageCatalog(wroot), checkpoint=args.checkpoint).run(
                wdocs, f"warmup:{args.warmup_docs}", resume=False
            ).count()

    if args.docs:
        documents = corpus_df(spark, args.docs)
        fingerprint = f"synthetic:{args.docs}"
        n_docs = args.docs
    else:
        documents = spark.read.parquet(args.input)
        fingerprint = f"input:{args.input}"
        n_docs = documents.count()

    if args.steady:
        import tempfile

        with tempfile.TemporaryDirectory() as wroot:
            Pipeline(spark, StageCatalog(wroot), checkpoint=args.checkpoint).run(
                documents, fingerprint, resume=False
            ).count()

    catalog = StageCatalog(args.warehouse, run_id=args.run_id)
    pipe = Pipeline(spark, catalog, checkpoint=args.checkpoint)
    t0 = time.time()
    triples = pipe.run(documents, fingerprint, resume=args.resume)
    n_triples = triples.count()
    graph_counts = None
    if args.graph:
        nodes, edges = pipe.materialize_graph(
            triples, fingerprint, resume=args.resume
        )
        graph_counts = {"nodes": nodes.count(), "edges": edges.count()}
    wall = time.time() - t0

    out = {
        "cores": cores,
        "docs": n_docs,
        "triples": n_triples,
        **({"graph": graph_counts} if graph_counts else {}),
        "wall_sec": round(wall, 3),
        "docs_per_sec": round(n_docs / wall, 2),
        "triples_per_sec": round(n_triples / wall, 2),
        "ran": pipe.ran,
        "skipped": pipe.skipped,
        "stage_seconds": pipe.stage_seconds,
    }
    if args.json:
        print(json.dumps(out))
    else:
        for k, v in out.items():
            print(f"{k}: {v}")


if __name__ == "__main__":
    main()
