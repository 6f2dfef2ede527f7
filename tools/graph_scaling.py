"""Strong-scaling evidence for the graph-analytics operators.

Same protocol as tools/scaling_bench.py (SURVEY.md §5.2.7 sandbox
substitute for the N→4N executor rule): the SAME query on the SAME
input at two parallelism levels, fresh JVM per run, steady-state timing
(one full warm execution inside the JVM before the timed one, BLAS
pinned to one thread), back-to-back interleaved (lo, hi) pairs, and the
headline efficiency is the MEDIAN of per-pair ratios — host-contention
bursts move one pair, not the median.

    python tools/graph_scaling.py [--low 4] [--high 16] [--trials 2]
        [--queries kg_pagerank,kg_co_neighbors] [--sf-dir .../sf0.1]

Prints one JSON line per query with per-pair times and the median
efficiency = (t_low / t_high) / (high / low).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PIN_ENV = {
    "OPENBLAS_NUM_THREADS": "1",
    "OMP_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
}

_RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
import __spark_entry__ as entry
from deepee_spark.session import get_spark
spark = get_spark("graph-scale", master="local[{cores}]",
                  shuffle_partitions={cores})
q = entry.queries()[{query!r}]
q(spark, {sf_dir!r}).count()          # steady-state: warm plan + workers
t0 = time.time()
n = q(spark, {sf_dir!r}).count()
print(json.dumps({{"sec": time.time() - t0, "rows": n}}))
"""

# Synthetic-graph mode: the sf0.1 graph (73k edges) is latency-bound —
# per-job fixed costs (~1.5s) swamp the compute at any core count, so
# no operator can show its scaling there. This mode generates a
# DETERMINISTIC hash-derived edge list of the requested size (the same
# graph at every level, no data files), materializes it to parquet so
# the timed run starts from storage like the real job, and times the
# operator itself.
_SYNTH_RUNNER = r"""
import json, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from deepee_spark.session import get_spark
from deepee_spark.operators.graph import co_neighbors, pagerank_int
spark = get_spark("graph-scale", master="local[{cores}]",
                  shuffle_partitions={cores})
path = tempfile.mkdtemp(prefix="synth_edges_") + "/e"
(spark.range({n_edges})
 .select(F.pmod(F.xxhash64("id"), F.lit({n_src})).alias("src"),
         F.pmod(F.xxhash64("id", F.lit(1)), F.lit({n_dst})).alias("dst"))
 .write.mode("overwrite").parquet(path))
edges = spark.read.parquet(path)
op = {op!r}
def run():
    if op == "pagerank":
        return pagerank_int(edges, iters=3).count()
    return co_neighbors(edges).count()
run()                                  # steady-state warm pass
t0 = time.time()
n = run()
print(json.dumps({{"sec": time.time() - t0, "rows": n}}))
"""


def run_once(cores: int, query: str, sf_dir: str,
             synth: dict | None = None) -> dict:
    env = dict(os.environ, **PIN_ENV)
    if synth:
        code = _SYNTH_RUNNER.format(
            repo=REPO, cores=cores, op=query, **synth
        )
    else:
        code = _RUNNER.format(
            repo=REPO, cores=cores, query=query, sf_dir=sf_dir
        )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"{query} at local[{cores}] failed:\n"
            + "\n".join(out.stderr.splitlines()[-15:])
        )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--queries", default="kg_pagerank,kg_co_neighbors")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--synthetic-edges", type=int, default=None,
                    help="generate this many deterministic edges instead "
                         "of reading sf tables; --queries then names ops "
                         "(pagerank, co_neighbors)")
    ap.add_argument("--n-src", type=int, default=None,
                    help="synthetic src-node count (default edges/10)")
    ap.add_argument("--n-dst", type=int, default=None,
                    help="synthetic dst-node count (default edges/10)")
    args = ap.parse_args()
    ratio = args.high / args.low
    synth = None
    if args.synthetic_edges:
        synth = {
            "n_edges": args.synthetic_edges,
            "n_src": args.n_src or args.synthetic_edges // 10,
            "n_dst": args.n_dst or args.synthetic_edges // 10,
        }

    for query in args.queries.split(","):
        pairs = []
        for _ in range(args.trials):
            lo = run_once(args.low, query, args.sf_dir, synth)
            hi = run_once(args.high, query, args.sf_dir, synth)
            pairs.append((lo["sec"], hi["sec"]))
        effs = [(l / h) / ratio for l, h in pairs]
        print(json.dumps({
            "query": query,
            "synthetic": synth,
            "low_cores": args.low,
            "high_cores": args.high,
            "pairs_sec": [[round(l, 3), round(h, 3)] for l, h in pairs],
            "pair_efficiencies": [round(e, 3) for e in effs],
            "median_efficiency": round(statistics.median(effs), 3),
            "rows": lo["rows"],
        }))


if __name__ == "__main__":
    main()
