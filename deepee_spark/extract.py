"""Stage A — boilerplate-stripped text extraction.

``extract_text`` is the *single* canonical pure function (bytes -> str).
The Spark path wraps it in an Arrow-batched pandas UDF; the oracle path
calls it single-process. The byte-identical invariant (BASELINE.md §2)
holds by construction because both paths share this function — the test
asserts it anyway on every fixture url, including CJK full-width and
HTML-entity edge cases (reference text-normalize lineage: EEGCN
data_utils.py:282-292 / loader.py:19-21, reconstructed here since the
reference's full_to_half/replace_html bodies are missing from the repo).

Normalization order (fixed, documented, byte-stable):
  1. utf-8 decode (errors='replace')
  2. drop <script>/<style>/<nav>/<header>/<footer>/<aside> subtrees
  3. keep text of <p>/<h1>-<h3>/<li> elements inside <body>
  4. strip remaining tags
  5. HTML entity unescape (stdlib html.unescape, deterministic)
  6. full-width -> half-width (U+FF01..U+FF5E -> ASCII; U+3000 -> space)
  7. collapse runs of whitespace to one space, strip; paragraphs joined '\n'
"""

from __future__ import annotations

import html as _html
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DROP_SUBTREE = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_BODY = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.IGNORECASE | re.DOTALL)
_KEEP_ELEMENT = re.compile(
    r"<(p|h1|h2|h3|li)\b[^>]*>(.*?)</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")

_FULLWIDTH = {i: i - 0xFEE0 for i in range(0xFF01, 0xFF5F)}
_FULLWIDTH[0x3000] = 0x20  # ideographic space


def full_to_half(s: str) -> str:
    """Full-width ASCII variants -> half-width (SC5)."""
    return s.translate(_FULLWIDTH)


def extract_text(html_bytes: bytes | bytearray | memoryview | None) -> str:
    """Canonical extractor: HTML bytes -> boilerplate-stripped text."""
    if html_bytes is None:
        return ""
    raw = bytes(html_bytes).decode("utf-8", errors="replace")
    raw = _DROP_SUBTREE.sub(" ", raw)
    m = _BODY.search(raw)
    scope = m.group(1) if m else raw
    paragraphs = []
    for _tag, inner in _KEEP_ELEMENT.findall(scope):
        txt = _TAG.sub(" ", inner)
        txt = _html.unescape(txt)
        txt = full_to_half(txt)
        txt = _WS.sub(" ", txt).strip()
        if txt:
            paragraphs.append(txt)
    return "\n".join(paragraphs)


def with_extracted_text(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """documents(url, warc_ts, html, lang, ...) -> + extracted ``text``.

    Arrow-batched via mapInPandas; schema preserved plus/replacing ``text``.
    The html binary column is read once here and never again downstream
    (column pruning keeps it out of later scans — SURVEY.md §4).
    """
    out_fields = [f for f in docs.schema.fields if f.name != "text"]
    schema = T.StructType(out_fields + [T.StructField("text", T.StringType())])
    in_cols = [f.name for f in out_fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[in_cols].copy()
            out["text"] = [extract_text(h) for h in pdf[html_col]]
            yield out

    return docs.mapInPandas(run, schema=schema)


def documents_stage(docs: DataFrame) -> DataFrame:
    """documents -> extracted stage table: drop html, keep lineage columns."""
    extracted = with_extracted_text(docs)
    return extracted.select(
        "url", "warc_ts", "lang", "text", F.length("text").alias("n_chars")
    )
