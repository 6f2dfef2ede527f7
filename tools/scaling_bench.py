"""Scaling-efficiency evidence (BASELINE.json north rule, sandbox variant).

The rule demands throughput scaling efficiency >= 0.8 from N to 4N
executors on a real cluster. The sandbox has one machine, so the agreed
substitute (SURVEY.md §5.2.7) is: the SAME job on the SAME input at two
parallelism levels, fresh JVM each, JIT-warmed inside each JVM,
efficiency = (docs_per_sec_high / docs_per_sec_low) / (high / low).

Defaults compare local[4] vs local[16]. The box advertises 32 logical
CPUs but they are SMT pairs over 16 physical cores — a pure-CPU
calibration (multiprocessing busy-loop) measures only ~2.9x aggregate
gain from 8 -> 32 processes, so no software could show 0.8 efficiency on
that span; 4 -> 16 keeps both levels within physical cores, which is the
honest analog of N -> 4N executors (each executor core a real core).

Each level runs tools/run_pipeline.py (the spark-submit entry) in its own
subprocess with BLAS pinned to one thread per worker (cluster task-slot
semantics) and --steady (one full warm run of the same job inside the JVM
before the timed run: a production pipeline runs continuously, so driver
plan/codegen warm-up is not part of marginal throughput). Trials run as
back-to-back interleaved (lo, hi) PAIRS and the headline efficiency is
the MEDIAN of per-pair ratios: identical runs vary up to 2.5x from
host-level contention invisible to the guest (in-VM CPU calibration
stays stable while wall times swing), and a burst moves one pair's
ratio, not the median. Per-level best-of is also reported as the
uncontended-capability estimate. Results overwrite BENCH/BASELINE.md.

    python tools/scaling_bench.py [--docs 400000] [--trials 3]
        [--high-docs N]            # weak scaling: 4x docs on 4x cores
        [--checkpoint all|kernels|final]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PIN_ENV = {
    "OPENBLAS_NUM_THREADS": "1",
    "OMP_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
}


def run_once(cores: int, docs: int, warmup: int, checkpoint: str = "all",
             retries: int = 1) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), **PIN_ENV)
    # a transient JVM death must not kill a multi-hour campaign: retry
    # once, with the TemporaryDirectory INSIDE the attempt loop so the
    # retry gets a genuinely fresh warehouse (no partial snapshots
    # lingering from the crashed attempt)
    for attempt in range(retries + 1):
        with tempfile.TemporaryDirectory() as wh:
            cmd = [
                sys.executable,
                os.path.join(REPO, "tools", "run_pipeline.py"),
                "--docs", str(docs),
                "--warehouse", wh,
                "--master", f"local[{cores}]",
                "--warmup-docs", str(warmup),
                "--steady",
                "--json",
                "--checkpoint", checkpoint,
            ]
            out = subprocess.run(
                cmd, capture_output=True, text=True, env=env, cwd=REPO
            )
            if out.returncode == 0:
                line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
                return json.loads(line)
            print(
                f"run_once(local[{cores}], {docs} docs) attempt {attempt} "
                f"failed rc={out.returncode}; stderr tail:\n"
                + "\n".join(out.stderr.splitlines()[-15:]),
                flush=True,
            )
    raise RuntimeError(
        f"pipeline run failed {retries + 1}x at local[{cores}], {docs} docs"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--high-docs", type=int, default=None,
                    help="docs at the HIGH level (weak scaling: 4x docs on "
                         "4x cores; default = --docs, strong scaling)")
    ap.add_argument("--warmup-docs", type=int, default=4000)
    ap.add_argument("--low", type=int, default=4)
    ap.add_argument("--high", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    ap.add_argument("--checkpoint", default="all",
                    choices=["all", "kernels", "final"])
    args = ap.parse_args()
    hi_docs = args.high_docs or args.docs

    # PAIRED INTERLEAVED trials (lo, hi, lo, hi, ...): host-contention
    # bursts last minutes and would otherwise bias whichever level ran
    # during them. Each back-to-back (lo, hi) pair shares roughly the
    # same contention exposure, so the MEDIAN of per-pair efficiencies is
    # the robust headline: a burst that throttles one pair's hi run (the
    # round-2 campaign measured one local[16] trial at 1/3 speed) moves
    # one pair's ratio, not the median. Per-level best-of is still
    # reported as the uncontended-capability estimate.
    lo_runs, hi_runs = [], []
    for _ in range(args.trials):
        lo_runs.append(run_once(args.low, args.docs, args.warmup_docs, args.checkpoint))
        hi_runs.append(run_once(args.high, hi_docs, args.warmup_docs, args.checkpoint))

    def best_of(runs, cores):
        best = max(runs, key=lambda r: r["docs_per_sec"])
        best["all_docs_per_sec"] = [r["docs_per_sec"] for r in runs]
        print(
            f"local[{cores}]: best {best['docs_per_sec']} docs/s over "
            f"{len(runs)} trials {best['all_docs_per_sec']}, "
            f"triples={best['triples']}",
            flush=True,
        )
        return best

    lo = best_of(lo_runs, args.low)
    hi = best_of(hi_runs, args.high)

    ratio = args.high / args.low
    pair_effs = [
        round((h["docs_per_sec"] / l["docs_per_sec"]) / ratio, 3)
        for l, h in zip(lo_runs, hi_runs)
    ]
    eff_median = statistics.median(pair_effs)
    eff_best = (hi["docs_per_sec"] / lo["docs_per_sec"]) / ratio
    result = {
        "checkpoint": args.checkpoint,
        "mode": "weak" if hi_docs != args.docs else "strong",
        "docs": args.docs,
        "high_docs": hi_docs,
        "low_cores": args.low,
        "high_cores": args.high,
        "low_docs_per_sec": lo["docs_per_sec"],
        "high_docs_per_sec": hi["docs_per_sec"],
        "low_triples_per_sec": lo["triples_per_sec"],
        "high_triples_per_sec": hi["triples_per_sec"],
        "pair_efficiencies": pair_effs,
        "scaling_efficiency": round(eff_median, 3),
        "scaling_efficiency_best": round(eff_best, 3),
        "triples_match": (lo["triples"] == hi["triples"])
        if hi_docs == args.docs
        else None,
        "trials": args.trials,
    }
    print(json.dumps(result))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "# BENCH — measured scaling results\n\n"
            "Protocol (BASELINE.md §2, sandbox substitute for the N->4N\n"
            "cluster rule): identical `documents -> triples` pipeline job +\n"
            "identical synthetic input at two parallelism levels, fresh JVM\n"
            "per run, steady-state timing (one full warm run of the same\n"
            "job in each JVM before the timed run — a production pipeline\n"
            "runs continuously, so driver plan/codegen warm-up is not part\n"
            "of marginal throughput), BLAS pinned to 1 thread/worker.\n"
            "Trials run as back-to-back interleaved (lo, hi) PAIRS so both\n"
            "levels share contention exposure; the headline efficiency is\n"
            "the MEDIAN of per-pair (thru_hi/thru_lo)/(cores_hi/cores_lo)\n"
            "(identical runs vary up to 2.5x from host-level contention\n"
            "invisible to the guest; a burst moves one pair's ratio, not\n"
            "the median). Per-level best-of is also reported as the\n"
            "uncontended-capability estimate.\n\n"
            "Levels are local[4] vs local[16]: the box's 32 logical CPUs\n"
            "are SMT pairs over 16 physical cores (a pure-CPU busy-loop\n"
            "calibration yields only ~2.9x aggregate from 8->32 procs), so\n"
            "4->16 is the span where 4x hardware actually exists — the\n"
            "honest analog of N->4N executors with one real core each.\n\n"
            f"Mode: **{result['mode']}** scaling, checkpoint="
            f"{args.checkpoint}.\n\n"
            f"| docs | level | docs/sec (best) | triples/sec | trials |\n"
            f"|---|---|---|---|---|\n"
            f"| {args.docs} | local[{args.low}] | {lo['docs_per_sec']} | "
            f"{lo['triples_per_sec']} | {lo['all_docs_per_sec']} |\n"
            f"| {hi_docs} | local[{args.high}] | {hi['docs_per_sec']} | "
            f"{hi['triples_per_sec']} | {hi['all_docs_per_sec']} |\n\n"
            f"**Scaling efficiency {args.low} -> {args.high} cores: "
            f"median {result['scaling_efficiency']} over pairs "
            f"{pair_effs}, best-of {result['scaling_efficiency_best']}** "
            f"(target >= 0.8); triples_match={result['triples_match']}.\n"
        )
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
