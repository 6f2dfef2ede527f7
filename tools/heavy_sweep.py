"""Targeted best-of-2 sweep of the heaviest per-query benchmarks
(r3 verdict task 2: re-measure qa_span_args / kg_kcore / kg_hits /
kg_node2vec_walks / kg_pagerank inside a gemm-gated healthy window).

Run directly (one sweep, probes recorded regardless of health), or via
tools/healthy_window.sh which polls the §0 gemm probe and fires this
only when the host is at calibration.

Usage: python tools/heavy_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

QUERIES = [
    "qa_span_args",
    "kg_kcore",
    "kg_hits",
    "kg_node2vec_walks",
    "kg_pagerank",
    # r4 verdict task 4: +31% r3->r4 with one burst-contaminated trial
    # ([3.406, 8.919]) and no plan-touching commit — adjudicate here
    "dedup_ngram_jaccard",
]


def gemm_probe(seconds: float = 2.0) -> float:
    import numpy as np

    a = np.random.rand(2048, 300).astype(np.float32)
    b = np.random.rand(300, 512).astype(np.float32)
    a @ b
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        a @ b
        n += 1
    return round(n / (time.perf_counter() - t0), 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH/heavy_sweep_r4.json"
    probe_start = gemm_probe()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from deepee_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "heavy_sweep", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    qs = entry.queries()
    qs["q1_pricing_summary"](spark, sf_dir).count()  # warm JVM/footers

    trials: dict[str, list[float]] = {q: [] for q in QUERIES}
    for _cycle in range(2):
        for q in QUERIES:
            t0 = time.time()
            qs[q](spark, sf_dir).count()
            trials[q].append(round(time.time() - t0, 3))
    probe_end = gemm_probe()
    result = {
        "host_gemm_per_s": probe_start,
        "host_gemm_per_s_end": probe_end,
        "best": {q: min(v) for q, v in trials.items()},
        "trials": trials,
        "sf_dir": sf_dir,
        "cpus": cpus,
    }
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
