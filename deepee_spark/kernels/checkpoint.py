"""K3: model-checkpoint sink/restore through the stage catalog.

The reference persists trained model state per run (DMCNN
train_trigger.py saves checkpoints; EEGCN main.py:146-148 reloads the
best one for eval). Our checkpoint is the constructed frozen state
(kernels/weights.py), but the *sink contract* is the same: every tensor
and the vocabulary land in one versioned, atomically-published snapshot
(StageCatalog.write — the same machinery as every stage table), and a
restore must reproduce the kernels bitwise.

Layout: one row per tensor — (component, tensor, shape, values) with
values a flattened float32 array (array<float> in parquet preserves
float32 exactly, so the round-trip is bitwise) — plus the vocabulary as
(component='vocab', tensor=word, shape=[id], values=[]) rows riding the
same table. Checkpoints version like any snapshot: a re-publish under
the same name gets snapshot=n+1, and `load_checkpoint` reads the
latest.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..sources.tables import StageCatalog
from .weights import argument_weights, embedding_table, kernel_vocab, trigger_weights

_SCHEMA = T.StructType(
    [
        T.StructField("component", T.StringType()),
        T.StructField("tensor", T.StringType()),
        T.StructField("shape", T.ArrayType(T.IntegerType())),
        T.StructField("values", T.ArrayType(T.FloatType())),
    ]
)


def _tensor_rows(component: str, tensors: dict[str, np.ndarray]):
    for name, arr in sorted(tensors.items()):
        a = np.asarray(arr, dtype=np.float32)
        yield (component, name, list(a.shape),
               [float(v) for v in a.ravel()])


def checkpoint_weights(catalog: StageCatalog, spark: SparkSession,
                       name: str = "model_checkpoint") -> dict:
    """Publish the full frozen checkpoint as one catalog snapshot."""
    rows = [
        *_tensor_rows("embedding", {"table": embedding_table()}),
        *_tensor_rows("trigger", trigger_weights()),
        *_tensor_rows("argument", argument_weights()),
        *[("vocab", w, [i], []) for w, i in kernel_vocab().items()],
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    return catalog.write(df, name, fingerprint="constructed-v1")


def load_checkpoint(catalog: StageCatalog, spark: SparkSession,
                    name: str = "model_checkpoint"):
    """Latest snapshot -> ({component: {tensor: ndarray}}, vocab)."""
    rows = catalog.read(spark, name).select(
        "component", "tensor", "shape", "values"
    ).collect()
    tensors: dict[str, dict[str, np.ndarray]] = {}
    vocab: dict[str, int] = {}
    for r in rows:
        if r["component"] == "vocab":
            vocab[r["tensor"]] = int(r["shape"][0])
        else:
            arr = np.asarray(r["values"], dtype=np.float32).reshape(
                tuple(r["shape"])
            )
            tensors.setdefault(r["component"], {})[r["tensor"]] = arr
    return tensors, vocab
