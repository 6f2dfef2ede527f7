"""S9/S10: one-shot pickle -> parquet conversion jobs.

The reference stacks load pickled datasets and vocabularies at startup
(RCEE util.py:335-351 `pickle.load` of cached examples; EEGCN
main.py:38-39 vocab pickles). In a Spark engine those are one-time
conversions into parquet dimension tables; afterwards every run scans
columnar data with predicate pushdown instead of unpickling a blob.

Driver-side unpickle is the right shape here: these are dimension-scale
artifacts (vocab maps, cached example lists), not the corpus. For a
pickle too big for one driver, shard it upstream and run this per shard
— each call is a pure (path in, path out) job.
"""

from __future__ import annotations

import pickle

from pyspark.sql import DataFrame, SparkSession


def examples_pickle_to_parquet(
    spark: SparkSession, pickle_path: str, out_path: str
) -> DataFrame:
    """Convert a pickled list-of-dicts example cache (RCEE util.py
    layout: words / entity and event annotations as lists) to parquet.

    Schema is inferred from the records; keys missing in some records
    become nulls (dict rows union their keys)."""
    with open(pickle_path, "rb") as f:
        records = pickle.load(f)
    if not isinstance(records, list):
        raise ValueError(f"expected a pickled list of records, got {type(records)}")
    keys = sorted({k for r in records for k in r})
    rows = [tuple(r.get(k) for k in keys) for r in records]
    df = spark.createDataFrame(rows, keys)
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def vocab_pickle_to_parquet(
    spark: SparkSession, pickle_path: str, out_path: str
) -> DataFrame:
    """Convert a pickled vocab (dict token -> id, or list of tokens with
    implicit positional ids — both EEGCN layouts) to a (token, id)
    parquet dimension table."""
    with open(pickle_path, "rb") as f:
        vocab = pickle.load(f)
    if isinstance(vocab, dict):
        rows = sorted(vocab.items(), key=lambda kv: (kv[1], kv[0]))
    elif isinstance(vocab, list):
        rows = [(tok, i) for i, tok in enumerate(vocab)]
    else:
        raise ValueError(f"expected dict or list vocab, got {type(vocab)}")
    df = spark.createDataFrame(
        [(str(t), int(i)) for t, i in rows], ["token", "id"]
    )
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)
