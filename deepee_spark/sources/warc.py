"""WARC (Web ARChive, ISO 28500 — public spec) record parsing.

Common-Crawl ships as WARC: concatenated records, each a version line
(``WARC/1.0``), CRLF-delimited named headers, a blank line, then
``Content-Length`` bytes of payload, then CRLF CRLF. A web-scale KG
build ingests WARC directly rather than via a pre-extracted table, so
this source turns raw WARC bytes into the pipeline's documents schema.

Two layers, same discipline as the other sources (the pure function IS
the oracle):

- ``parse_warc_bytes(data) -> list[dict]`` — the single canonical pure
  parser (bytes in, records out), used by both the Spark path and the
  tests' reference path. Strict per record, resilient per file: a
  malformed record (bad version line, missing/invalid Content-Length,
  or a declared length that overruns the buffer) is skipped by
  RESYNCING to the next ``CRLF WARC/`` magic — real Common-Crawl WARCs
  contain isolated corrupt records mid-file, and one bad record must
  cost only its own span, never the file's whole tail. Skipped byte
  spans are reported via the optional ``dropped`` out-list. A record
  truncated by end-of-file is dropped, never half-parsed. Tolerant on
  content (any header set, any payload bytes).
- ``read_warc(spark, paths)`` — ``spark.read.format("binaryFile")``
  over whole .warc files, then ``mapInPandas`` applying the parser
  per file. One task per file: WARC's gzip-per-record layout (and the
  driver's one-file-per-crawl-shard convention) makes the FILE the
  parallelism unit, exactly how Common-Crawl jobs shard (one WARC ≈
  1 GB). For response records the http payload splits into http
  headers + body so the body lands in ``html`` ready for extract.py.

Emitted schema: (path, rec_idx, warc_type, target_uri, warc_date,
content_type, payload binary, html binary) — ``html`` is the
http-header-stripped body for ``response`` records, NULL otherwise.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"


def parse_warc_bytes(
    data: bytes | None, dropped: list[tuple[int, int]] | None = None
) -> list[dict]:
    """Canonical pure parser: WARC bytes -> record dicts.

    Malformed records resync to the next ``CRLF WARC/`` magic instead
    of aborting the file (see module docstring); pass ``dropped`` to
    collect the skipped (start, end) byte spans."""
    out: list[dict] = []
    if not data:
        return out
    pos = 0
    n = len(data)

    def skip_bad(rec_start: int, search_from: int) -> int:
        nxt = data.find(_CRLF + b"WARC/", search_from)
        end = nxt + 2 if nxt >= 0 else n
        if dropped is not None:
            dropped.append((rec_start, end))
        return end

    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        rec_start = pos
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            pos = skip_bad(rec_start, pos)
            continue
        pos = eol + 2
        headers: dict[str, str] = {}
        truncated = False
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                truncated = True  # header block cut by end-of-file
                break
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        if truncated:
            if dropped is not None:
                dropped.append((rec_start, n))
            break
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            pos = skip_bad(rec_start, pos)
            continue
        if pos + length > n:
            # declared length overruns the buffer: either a truncated
            # tail (resync finds nothing, scan ends) or a corrupt
            # length field (resync recovers the following records)
            pos = skip_bad(rec_start, pos)
            continue
        payload = data[pos : pos + length]
        pos = pos + length
        rec = {
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": payload,
            "html": None,
        }
        if rec["warc_type"] == "response":
            # strip the http header block if present
            sep = payload.find(_CRLF + _CRLF)
            if payload.startswith(b"HTTP/") and sep >= 0:
                rec["html"] = payload[sep + 4 :]
            else:
                rec["html"] = payload
        out.append(rec)
    return out


WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("rec_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def parse_warc_df(files: DataFrame, path_col: str = "path",
                  content_col: str = "content") -> DataFrame:
    """(path, content binary) -> exploded WARC records. Arrow-batched
    mapInPandas, one file per row in, many records out; the parallelism
    unit is the file, matching Common-Crawl's sharding."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                for i, rec in enumerate(parse_warc_bytes(bytes(content))):
                    rows.append(
                        {"path": path, "rec_idx": i, **rec}
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(run, WARC_SCHEMA)


def read_warc(spark: SparkSession, paths: str) -> DataFrame:
    """Read .warc files under ``paths`` into the record schema."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc")
        .load(paths)
        .select("path", "content")
    )
    return parse_warc_df(files)


def write_warc_bytes(records: list[dict]) -> bytes:
    """Serialize record dicts back to WARC bytes (test fixture /
    roundtrip helper; also the export path for handing crawl shards to
    non-Spark consumers). Inverse of parse_warc_bytes for the header
    fields it owns."""
    chunks: list[bytes] = []
    for rec in records:
        payload = rec.get("payload") or b""
        head = [
            b"WARC/1.0",
            b"WARC-Type: " + rec.get("warc_type", "").encode(),
            b"WARC-Target-URI: " + rec.get("target_uri", "").encode(),
            b"WARC-Date: " + rec.get("warc_date", "").encode(),
            b"Content-Type: " + rec.get("content_type", "").encode(),
            b"Content-Length: " + str(len(payload)).encode(),
            b"",
        ]
        chunks.append(_CRLF.join(head) + _CRLF + payload + _CRLF + _CRLF)
    return b"".join(chunks)
