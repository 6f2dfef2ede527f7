"""Preloading Python-worker daemon (spark.python.daemon.module).

PySpark's stock daemon forks workers that then import numpy/pandas/pyarrow
from scratch (~1-2 s CPU each). When a stage fans out to N fresh workers
at once, that is N x import-cost of pure contention before the first Arrow
batch is read — measured as a multi-second stall per kernel stage at
local[32], and the same import storm happens per executor on a real
cluster whenever idle workers were evicted.

This daemon imports the heavy libraries AND materializes the frozen
kernel weight arrays (lru_cached NumPy) BEFORE calling the stock daemon's
accept loop, so every forked worker inherits them via copy-on-write:
zero import cost, zero per-worker weight build, shared physical pages for
the read-only weights.

Enabled by session.get_spark via
    spark.python.daemon.module = deepee_spark.daemon
Importability: the worker factory imports this module BEFORE --py-files
reach any sys.path, so a zip-only deployment would die here with
ModuleNotFoundError — get_spark therefore self-heals by putting the
package's own root (repo dir, or the .zip it was imported from) on
spark.executorEnv.PYTHONPATH / the driver env (session.py pkg_root
note; regression-tested end-to-end by tests/test_submit.py).
"""

from __future__ import annotations

import ctypes

# Keep big allocations on the heap and never trim it back to the OS.
# glibc serves >128KB allocations (every kernel batch array) via
# mmap/munmap, so EVERY batch faults fresh pages; on hosts that back
# guest memory lazily, first-touch faults run ~100x slower than warm
# pages (measured 7 MB/s vs 2.4 GB/s on this box) and 32 workers
# faulting together serialize on the host. With the thresholds raised,
# each worker's heap grows to its high-water mark once and stays warm
# for every later batch. mallopt state survives fork, so setting it in
# the daemon covers all workers.
try:  # pragma: no cover - glibc-specific, best-effort elsewhere
    _libc = ctypes.CDLL("libc.so.6")
    _libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    _libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
except OSError:
    pass

# heavy third-party imports first: these dominate fork-cold start
import numpy  # noqa: F401
import pandas  # noqa: F401

try:  # pyarrow is present wherever pandas-UDF execution happens
    import pyarrow  # noqa: F401
except ImportError:  # pragma: no cover
    pass

# pre-build the frozen kernel weights so forks share them copy-on-write
try:
    from deepee_spark.kernels import weights as _w

    _w.kernel_vocab()
    _w.embedding_table()
    _w.trigger_weights()
    _w.argument_weights()
except Exception:  # pragma: no cover - workers rebuild lazily if this fails
    pass


if __name__ == "__main__":
    from pyspark.daemon import manager

    manager()
