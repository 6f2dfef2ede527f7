"""JSONL dataset export (sources/jsonl): roundtrip fidelity,
deterministic sharding, manifest verification and tamper detection."""

from __future__ import annotations

import gzip
import glob
import json
import os

from deepee_spark.sources.jsonl import (
    export_jsonl,
    import_jsonl,
    verify_manifest,
)


def _df(spark, n=200):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.concat(F.lit("https://s/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 7).cast("int").alias("label"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )


def test_roundtrip_and_manifest(spark, tmp_path):
    out = str(tmp_path / "ds")
    df = _df(spark)
    manifest = export_jsonl(df, out, key_col="url", n_shards=4)
    assert manifest["total_rows"] == 200
    assert set(manifest["shards"]) == {0, 1, 2, 3}
    # files are gzip, one directory per shard
    assert len(glob.glob(os.path.join(out, "shard=*"))) == 4
    assert glob.glob(os.path.join(out, "shard=0", "*.gz"))

    back = import_jsonl(spark, out, "url string, label int, text string")
    assert back.count() == 200
    cols = ["url", "label", "text"]
    assert back.select(*cols).exceptAll(df.select(*cols)).count() == 0
    assert df.select(*cols).exceptAll(back.select(*cols)).count() == 0

    assert verify_manifest(spark, out) == {"ok": True, "bad_shards": []}


def test_sharding_is_content_addressed(spark, tmp_path):
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    df = _df(spark)
    m1 = export_jsonl(df, out1, n_shards=4)
    # different input partitioning, same content -> identical manifest
    m2 = export_jsonl(df.repartition(13), out2, n_shards=4)
    assert m1["shards"] == m2["shards"]


def test_tamper_detection(spark, tmp_path):
    out = str(tmp_path / "ds")
    export_jsonl(_df(spark, 50), out, n_shards=2)
    victim = glob.glob(os.path.join(out, "shard=1", "*.gz"))[0]
    lines = gzip.open(victim, "rt").read().splitlines()
    row = json.loads(lines[0])
    row["label"] = 999
    lines[0] = json.dumps(row)
    with gzip.open(victim, "wt") as f:
        f.write("\n".join(lines) + "\n")
    # drop Hadoop's local .crc sidecar — a transferred dataset has no
    # sidecars, and it would otherwise fail the read before our
    # manifest check gets to vote
    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    v = verify_manifest(spark, out)
    assert v["ok"] is False and v["bad_shards"] == [1]
