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
(deepee_spark must be importable by executors — it is shipped with
--py-files, which is on sys.path before the daemon starts).
"""

from __future__ import annotations

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
