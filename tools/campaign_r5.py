"""Round-5 measurement campaign (r4 verdict task 4).

Phase 1 — immediate record on the round-5 tree, whatever the host
state: the §1 weak-scaling pairs (local[4] 400k docs vs local[16]
1.6M docs, checkpoint=kernels — the r3/r4 protocol) and the targeted
heavy sweep (dedup_ngram_jaccard now included). §0 gemm probes are
logged before/after each piece so the record is honestly annotated.

Phase 2 — healthy-window watcher: after phase 1, poll the §0 probe
every ~4 minutes; when TWO consecutive probes read >= 150/s (the
calibration is ~190/s), re-run both measurements into *_healthy
artifacts and exit. Gives up at the deadline.

    python tools/campaign_r5.py [--max-hours 4.0] [--skip-phase1]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_LOG = os.path.join(REPO, "BENCH", "probes_r5.jsonl")


def gemm_probe(seconds: float = 2.0) -> float:
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((2048, 300), dtype=np.float32)
    b = rng.standard_normal((300, 512), dtype=np.float32)
    a @ b
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        a @ b
        n += 1
    return round(n / (time.perf_counter() - t0), 1)


def log_probe(tag: str) -> float:
    v = gemm_probe()
    with open(PROBE_LOG, "a") as fh:
        fh.write(json.dumps({"t": round(time.time(), 1), "tag": tag,
                             "gemm_per_s": v}) + "\n")
    print(f"[campaign] probe {tag}: {v}/s", flush=True)
    return v


def run(cmd: list[str]) -> int:
    print(f"[campaign] run: {' '.join(cmd)}", flush=True)
    return subprocess.run(cmd, cwd=REPO).returncode


def scaling(out_md: str) -> None:
    run([
        sys.executable, "tools/scaling_bench.py",
        "--docs", "400000", "--high-docs", "1600000",
        "--trials", "3", "--checkpoint", "kernels",
        "--out", out_md,
    ])


def heavy(out_json: str) -> None:
    run([sys.executable, "tools/heavy_sweep.py",
         "/root/testdata/sf0.1", out_json])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--skip-phase1", action="store_true")
    args = ap.parse_args()
    deadline = time.time() + args.max_hours * 3600

    if not args.skip_phase1:
        log_probe("phase1_start")
        scaling(os.path.join("BENCH", "scaling_r5_weak.md"))
        log_probe("phase1_mid")
        heavy(os.path.join("BENCH", "heavy_sweep_r5.json"))
        log_probe("phase1_end")

    consecutive = 0
    while time.time() < deadline:
        v = log_probe("watch")
        consecutive = consecutive + 1 if v >= 150.0 else 0
        if consecutive >= 2:
            print("[campaign] healthy window — re-running", flush=True)
            scaling(os.path.join("BENCH", "scaling_r5_healthy.md"))
            log_probe("healthy_mid")
            heavy(os.path.join("BENCH", "heavy_sweep_r5_healthy.json"))
            log_probe("healthy_end")
            return
        time.sleep(240)
    print("[campaign] no healthy window before deadline", flush=True)


if __name__ == "__main__":
    main()
