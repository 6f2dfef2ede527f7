"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the KG pipeline
documents->triples DAG on a generated corpus, and prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "docs_per_sec": ..., "triples_per_sec": ...}

Set BENCH_PIPELINE_DOCS to scale the pipeline corpus (default 4000).
"""

from __future__ import annotations

import json
import os

# BLAS thread pin MUST precede any numpy import (pyspark/pandas pull it
# in transitively): os.environ.setdefault inside _gemm_probe is a no-op
# once OpenBLAS has initialized its pool, and the probe then measures a
# MULTI-threaded gemm — observed in-process readings of 179-454/s while
# fresh single-threaded processes measured ~50/s on the same host. The
# §0 calibration is defined single-thread; emitted host_gemm_per_s
# values from rounds before this fix are multi-threaded when the bench
# process touched numpy first (BENCH/BASELINE.md §0 caveat).
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import sys
import tempfile
import time


def _gemm_probe(seconds: float = 2.0) -> float:
    """Warm-page single-thread float32 gemm rate (matmuls/sec), the
    same probe BENCH/BASELINE.md §0 calibrates the box with."""
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 300), dtype=np.float32)
    b = rng.standard_normal((300, 512), dtype=np.float32)
    a @ b  # warm pages + BLAS init
    n, t0 = 0, time.time()
    while time.time() - t0 < seconds:
        a @ b
        n += 1
    return round(n / (time.time() - t0), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_PIPELINE_DOCS", "16000"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry
    from deepee_spark.corpus import corpus_df
    from deepee_spark.plans.pipeline import Pipeline
    from deepee_spark.session import get_spark
    from deepee_spark.sources.tables import StageCatalog

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)

    headline = [
        "q1_pricing_summary",
        "q5_nation_revenue",
        "a1_vocab_build",
        "a2_bag_argmax",
        "a4_chunk_prf",
        "w1_pr_curve",
        "j9_interval_join",
        "s4_conll_scan",
        "dedup_minhash_signatures",
        "dedup_ngram_jaccard",
        "ann_cosine_topk",
        "ann_ivf_topk",
        "ann_pq_topk",
        "text_quality_score",
        "text_repetition_filter",
        "text_unigram_logprob",
        "url_host_stats",
        "url_blocklist_filter",
        "pii_redact",
        "paragraph_dedup",
        "curation_funnel",
        "decontaminate",
        "sequence_packing",
        "kg_node_rollup",
        "kg_edge_rollup",
        "kg_pagerank",
        "kg_triangles",
        "kg_co_neighbors",
        "kg_distinct_sketch",
        "kg_hll_distinct",
        "kg_fact_latest",
        "kg_fact_asof",
        "kg_kcore",
        "kg_taxonomy_closure",
        "kg_scc",
        "kg_sssp",
        "dedup_containment",
        "kg_skipgram_pairs",
        "kg_outlink_hosts",
        "kg_bloom_frontier",
        "kg_cms_frequencies",
        "kg_corpus_mixture",
        "kg_crawl_schedule",
        "kg_politeness",
        "ee_trigger_counts",
        "bert_trigger_tags",
        "qa_span_args",
        "dedup_embedding_cosine",
        # round-3 families
        "kg_web_tables",
        "bpe_merges",
        "robots_admission",
        "passage_windows",
        "crawl_budget",
        "kg_redirects",
        "shard_assignment",
        "crawl_refresh",
        # round-3 late additions
        "kg_hits",
        "kg_wl_roles",
        "domain_registrable",
        "domain_quota_cap",
        "dsir_weights",
        "bpe_segment",
        "heavy_hitters",
        "dedup_minhash_resolve",
        "winnow_fingerprints",
        "kg_hyperball",
        # round-3 structured-data / web-ingest family
        "kg_jsonld",
        "warc_records",
        "timex_normalize",
        "openie_triples",
        "text_mojibake_repair",
        "kg_entity_salience",
        "kg_coref_pronouns",
        "kg_node2vec_walks",
        # round-4 additions
        "j12_salted_linking",
        "wordpiece_file_vocab",
        "rcee_anchor_windows",
        "rcee_question_stems",
        "m2_viterbi_roles",
        "semdedup",
        "bpe_fertility",
        "w1_joint_pr_curve",
        "kmeans_cells",
        "semdedup_trained",
        "text_nfc_normalize",
        "robots_crawl_delay",
        # round-5 additions
        "j12_planned_salt",
        "cep_funnel_replay",
        "politeness_replay",
        "stream_dedup_replay",
        "politeness_adaptive",
    ]
    qs = entry.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footers once
    qs["q1_pricing_summary"](spark, sf_dir).count()

    # Host-health calibration, reported alongside the timings: this
    # box's effective speed swings wildly under hypervisor-level
    # contention invisible to the guest (BENCH/BASELINE.md §0; observed
    # this round: the SAME warm single-thread gemm at 190/s in one
    # session and 30/s hours later, and first-touch page faults at
    # 7 MB/s vs 2.4 GB/s). host_gemm_per_s is the §0 calibration probe
    # (2048x300 @ 300x512 float32, 1 BLAS thread, warm pages) measured
    # at bench time — readers should normalize round-over-round query
    # deltas by it before calling anything a regression.
    host_gemm_per_s = _gemm_probe()

    # INTERLEAVED best-of-N per query (same rationale as the pipeline
    # trials below): host-contention bursts on this box swing identical
    # runs up to 2.5x, and a burst inflates whichever single-shot run it
    # overlaps. Two full sweeps — not 2x back-to-back per query — so a
    # burst lands on one sweep, and min() discards it (contention only
    # ever adds time). min() also absorbs first-execution costs (plan
    # codegen, python-worker warm-up), making this a steady-state number
    # — the same protocol the scaling campaigns use. Raw trials are
    # emitted for spread inspection.
    n_q_trials = int(os.environ.get("BENCH_QUERY_TRIALS", "2"))
    q_trials: dict[str, list[float]] = {name: [] for name in headline}
    for _cycle in range(n_q_trials):
        for name in headline:
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            q_trials[name].append(time.time() - t0)
    for name in headline:
        timings[name] = round(min(q_trials[name]), 3)

    # KG pipeline: documents -> triples under all three durability
    # profiles ("all" = per-stage snapshots, "kernels" = fused tail,
    # "final" = flow-through). One small warm run first (JIT/codegen/
    # python-worker spawn): the steady-state protocol — a production
    # pipeline runs continuously.
    #
    # PAIRED INTERLEAVED trials (all, kernels, final) x N, report per
    # profile the BEST trial: host-contention bursts on this box swing
    # identical runs up to 2.5x (BENCH/BASELINE.md §1), and a burst
    # inflates whichever single-shot run it overlaps — interleaving
    # spreads the exposure across profiles and min() discards it
    # (contention only ever adds time). Raw trials are also emitted so
    # round-over-round comparisons can see the spread.
    with tempfile.TemporaryDirectory() as wroot:
        Pipeline(spark, StageCatalog(wroot)).run(
            corpus_df(spark, 2000), "bench:warm", resume=False
        ).count()
    docs = corpus_df(spark, n_docs)
    profiles = [
        ("kg_pipeline", "all"),
        ("kg_pipeline_fused", "kernels"),
        ("kg_pipeline_flow", "final"),
    ]
    n_cycles = int(os.environ.get("BENCH_PIPELINE_TRIALS", "2"))
    trials: dict[str, list[float]] = {name: [] for name, _ in profiles}
    n_triples = None
    for cycle in range(n_cycles):
        for name, mode in profiles:
            with tempfile.TemporaryDirectory() as root:
                t0 = time.time()
                n_out = (
                    Pipeline(spark, StageCatalog(root), checkpoint=mode)
                    .run(docs, f"bench-{mode}-{cycle}:{n_docs}", resume=False)
                    .count()
                )
                trials[name].append(time.time() - t0)
            if n_triples is None:
                n_triples = n_out
            assert n_out == n_triples, (name, cycle, n_out, n_triples)
    for name, _ in profiles:
        timings[name] = round(min(trials[name]), 3)

    # graph materialization (nodes/edges from the triples snapshot) —
    # the post-pipeline step; one flow run feeds it, best of 2
    g_trials = []
    for cycle in range(2):
        with tempfile.TemporaryDirectory() as root:
            p = Pipeline(spark, StageCatalog(root), checkpoint="final")
            t = p.run(docs, f"bench-graph-{cycle}:{n_docs}", resume=False)
            t0 = time.time()
            nodes, edges = p.materialize_graph(t, f"bench-graph-{cycle}:{n_docs}")
            nodes.count(), edges.count()
            g_trials.append(time.time() - t0)
    timings["kg_graph_materialize"] = round(min(g_trials), 3)

    pipe_sec = timings["kg_pipeline"]
    fused_sec = timings["kg_pipeline_fused"]
    flow_sec = timings["kg_pipeline_flow"]

    # the probe again AFTER the sweeps: a host collapse DURING the run
    # (start healthy, end sick — observed: 282/s -> 62/s across one
    # bench) is invisible to a start-only probe; with both ends
    # recorded, readers can tell "slow host" from "slow code" even
    # when the collapse lands mid-run.
    host_gemm_per_s_end = _gemm_probe()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries+kg_pipeline_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "host_gemm_per_s": host_gemm_per_s,
                "host_gemm_per_s_end": host_gemm_per_s_end,
                "sf": sf,
                "pipeline_docs": n_docs,
                "pipeline_triples": n_triples,
                "docs_per_sec": round(n_docs / pipe_sec, 2),
                "triples_per_sec": round(n_triples / pipe_sec, 2),
                "docs_per_sec_fused": round(n_docs / fused_sec, 2),
                "triples_per_sec_fused": round(n_triples / fused_sec, 2),
                "docs_per_sec_flow": round(n_docs / flow_sec, 2),
                "triples_per_sec_flow": round(n_triples / flow_sec, 2),
                "pipeline_trials": {
                    k: [round(v, 3) for v in vs] for k, vs in trials.items()
                },
                "query_trials": {
                    k: [round(v, 3) for v in vs] for k, vs in q_trials.items()
                },
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
