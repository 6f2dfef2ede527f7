"""Sharded JSONL dataset export/import — the publishing sink.

Training-data pipelines end by handing a corpus to a trainer, and the
lingua franca there is sharded ``*.jsonl.gz`` (the public WebDataset/
HuggingFace convention): fixed shard count, deterministic assignment,
a manifest with per-shard counts and content checksums so a consumer
can verify a transfer without re-reading the source.

Determinism contract:
  - shard = pmod(xxhash64(key), n_shards) — content-addressed, so the
    same corpus always shards identically regardless of partitioning;
  - per-shard content checksum = SUM of xxhash64 of the serialized
    lines (order-INdependent — files may be written in any row order
    by the engine, and verification must not depend on it);
  - the manifest records n_shards, per-shard row counts and checksums,
    and the total, all computed in the SAME job that writes (one extra
    aggregation, not a second scan at 100 TB — observed via the
    written data's own groupBy).

Layout: ``out_dir/shard=<k>/part-*.txt.gz`` (one task per shard via
repartition on the shard column, so each shard directory is a single
gzip member stream) + ``out_dir/manifest.json``.

``import_jsonl`` reads the tree back with an explicit schema and
``verify_manifest`` recomputes counts/checksums distributively and
compares — the transfer-integrity check a consumer runs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _lines(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        payload.alias("value"),
    )


def export_jsonl(
    df: DataFrame,
    out_dir: str,
    key_col: str = "url",
    n_shards: int = 8,
) -> dict:
    """Write ``df`` as gzip JSONL shards + manifest; returns the
    manifest dict."""
    lines = _lines(df, key_col, n_shards).repartition(n_shards, "shard")
    lines.write.partitionBy("shard").option("compression", "gzip").mode(
        "overwrite"
    ).text(out_dir)
    stats = (
        lines.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            # order-independent content checksum; decimal(38,0) sum
            # cannot overflow below 10^19 rows (ANSI mode forbids
            # silent long wraparound)
            F.sum(F.xxhash64("value").cast("decimal(38,0)")).alias(
                "checksum"
            ),
        )
        .collect()
    )
    shards = {
        int(r["shard"]): {"rows": r["rows"], "checksum": str(r["checksum"])}
        for r in stats
    }
    manifest = {
        "format": "jsonl.gz",
        "n_shards": n_shards,
        "key_col": key_col,
        "columns": list(df.columns),
        "total_rows": int(sum(s["rows"] for s in shards.values())),
        "shards": shards,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def import_jsonl(
    spark: SparkSession, out_dir: str, schema: T.StructType | str
) -> DataFrame:
    """Read an exported tree back into typed rows (shard column kept)."""
    raw = spark.read.text(out_dir)
    # partition discovery yields the shard column from the directory
    parsed = raw.select(
        F.col("shard").cast("int").alias("shard"),
        F.from_json("value", schema).alias("_r"),
    )
    return parsed.select("shard", "_r.*")


def verify_manifest(spark: SparkSession, out_dir: str) -> dict:
    """Recompute per-shard rows/checksums from the written files and
    compare against manifest.json. Returns {'ok': bool, 'bad_shards':
    [...]}. Distributed: one scan + one small agg."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    got = {
        int(r["shard"]): (r["rows"], str(r["checksum"]))
        for r in spark.read.text(out_dir)
        .groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(F.xxhash64("value").cast("decimal(38,0)")).alias(
                "checksum"
            ),
        )
        .collect()
    }
    bad = []
    for k, s in manifest["shards"].items():
        if got.get(int(k)) != (s["rows"], s["checksum"]):
            bad.append(int(k))
    for k in got:
        if str(k) not in manifest["shards"]:
            bad.append(k)
    return {"ok": not bad, "bad_shards": sorted(bad)}
