"""N-Triples export/import for the materialized triple table.

The KG's consumers live outside Spark (triple stores, RDF toolchains);
N-Triples (W3C RDF 1.1 N-Triples — public spec) is the line-oriented
interchange format that needs no framing: one triple per line, safe to
split at any newline, so a 10^12-triple export parallelizes as one text
file per task with no cross-partition state.

Terms are mapped to IRIs under a base prefix with percent-encoding of
every byte outside the IRI-safe set (RFC 3986 unreserved) — fully
deterministic and reversible, so export -> import roundtrips
bit-exactly even for subjects containing spaces, quotes, newlines, or
non-ASCII. Encoding/decoding is Spark-side (url_encode / url_decode,
JVM codegen — url_encode escapes ' ' as '+', which we normalize to
'%20' per RFC 3986), no Python UDF in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BASE = "urn:deepee:"


def _iri(col) -> "F.Column":
    # url_encode is application/x-www-form-urlencoded: space -> '+'.
    # IRIs need RFC 3986, so rewrite '+' -> '%20' ('+' itself encodes
    # to '%2B' first, so the rewrite is unambiguous).
    return F.concat(
        F.lit("<" + BASE),
        F.replace(F.url_encode(col), F.lit("+"), F.lit("%20")),
        F.lit(">"),
    )


def to_ntriples(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj, ...) -> one-column (line) N-Triples rows."""
    return triples.select(
        F.concat_ws(
            " ", _iri(F.col("subj")), _iri(F.col("pred")), _iri(F.col("obj")),
            F.lit(".")
        ).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    """Export as N-Triples text, one file per partition."""
    to_ntriples(triples).write.mode("overwrite").text(path)


def read_ntriples(spark, path: str) -> DataFrame:
    """Import an N-Triples export back to (subj, pred, obj)."""
    pat = rf"^<{BASE}([^>]*)> <{BASE}([^>]*)> <{BASE}([^>]*)> \.$"
    lines = spark.read.text(path)
    return lines.select(
        F.url_decode(F.regexp_extract("value", pat, 1)).alias("subj"),
        F.url_decode(F.regexp_extract("value", pat, 2)).alias("pred"),
        F.url_decode(F.regexp_extract("value", pat, 3)).alias("obj"),
    )
