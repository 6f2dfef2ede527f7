"""Web-table relational extraction — HTML <table> elements -> triples.

A large share of the facts on Common-Crawl pages live in tables, not
prose (the classic WebTables observation: Cafarella et al., VLDB 2008).
The reference pipeline (DeepEE) stops at sentence-level event
extraction; this operator is the companion *relational* extractor a
web-scale KG build runs beside it: per page, every <table> is read as
an entity-attribute relation — header row = predicates, first column =
subjects, data cells = objects — and emitted as (url, table_idx, subj,
pred, obj) triples that feed the same linking/canonicalization stages
as the event triples.

Spark-native and deliberately *narrow*: the html column decodes once,
tables/rows/cells surface via regexp_extract_all + posexplode (same
discipline as operators/links.py — per-row regexp, NOT lambda
higher-order functions, and NO joins: the header and subject cells are
carried as array columns next to each exploded data cell, so the whole
extraction is a zero-shuffle map pipeline that scales linearly with
pages). At 10^12 documents this stage is embarrassingly parallel; the
first wide op is whatever the caller aggregates downstream.

Interpretation rules (documented; both engines implement the same):
  - row 0 of each table is the header (th or td both accepted);
  - rows with a different cell count than the header are dropped
    (ragged rows = layout tables, not relations);
  - tables with < 2 columns or < 2 rows emit nothing;
  - subject = cleaned cell of column 0; predicate = cleaned header
    cell of the same column; empty subjects/objects are dropped;
  - cell cleaning = strip inner tags, collapse whitespace, trim
    (links.py anchor rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TABLE_RE = r"(?s)<table[^>]*>(.*?)</table\s*>"
_TR_RE = r"(?s)<tr[^>]*>(.*?)</tr\s*>"
_CELL_RE = r"(?s)<t[dh][^>]*>(.*?)</t[dh]\s*>"
_TAG_RE = r"<[^>]+>"


def _clean(col):
    """Tag-strip + whitespace-collapse + trim (links.py anchor rule)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(col, _TAG_RE, " "), r"\s+", " ")
    )


def extract_cells(
    docs: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """documents -> (url, table_idx, row_idx, col_idx, cell): the raw
    relational view of every <table> on every page, cells cleaned.
    Pure narrow map work (decode + regex + two posexplodes)."""
    html_str = (
        F.decode(F.col(html_col), "UTF-8")
        if dict(docs.dtypes)[html_col] == "binary"
        else F.col(html_col)
    )
    tables = docs.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(html_str, F.lit(_TABLE_RE), F.lit(1))
        ).alias("table_idx", "_tbl"),
    )
    rows = tables.select(
        "url",
        "table_idx",
        F.posexplode(
            F.regexp_extract_all("_tbl", F.lit(_TR_RE), F.lit(1))
        ).alias("row_idx", "_row"),
    )
    return rows.select(
        "url",
        "table_idx",
        "row_idx",
        F.posexplode(
            F.regexp_extract_all("_row", F.lit(_CELL_RE), F.lit(1))
        ).alias("col_idx", "_cell"),
    ).select(
        "url", "table_idx", "row_idx", "col_idx", _clean("_cell").alias("cell")
    )


def table_triples(
    docs: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """documents -> (url, table_idx, subj, pred, obj, *carry): the
    WebTables entity-attribute reading of every well-formed table.
    Zero joins: per exploded table the header-cell and per-row subject
    arrays ride along as columns, so the plan is one narrow map chain —
    no Exchange until the caller's first aggregation. ``carry`` names
    extra input columns to propagate unchanged (e.g. the crawl
    timestamp), keeping the chain join-free for callers that need
    them."""
    carry = tuple(carry)
    html_str = (
        F.decode(F.col(html_col), "UTF-8")
        if dict(docs.dtypes)[html_col] == "binary"
        else F.col(html_col)
    )
    tables = docs.select(
        F.col(url_col).alias("url"),
        *carry,
        F.posexplode(
            F.regexp_extract_all(html_str, F.lit(_TABLE_RE), F.lit(1))
        ).alias("table_idx", "_tbl"),
    ).withColumn(
        "_rows", F.regexp_extract_all("_tbl", F.lit(_TR_RE), F.lit(1))
    )
    # header = cells of row 0, carried as an array column
    tables = tables.withColumn(
        "_hdr",
        F.regexp_extract_all(
            F.element_at("_rows", 1), F.lit(_CELL_RE), F.lit(1)
        ),
    ).filter((F.size("_rows") >= 2) & (F.size("_hdr") >= 2))
    # data rows: posexplode skips row 0 via slice
    rows = tables.select(
        "url",
        *carry,
        "table_idx",
        "_hdr",
        F.posexplode(
            F.slice("_rows", 2, F.size("_rows") - 1)
        ).alias("_ridx", "_row"),
    ).withColumn(
        "_cells", F.regexp_extract_all("_row", F.lit(_CELL_RE), F.lit(1))
    )
    # ragged rows dropped; subject = column 0 of the row
    rows = rows.filter(F.size("_cells") == F.size("_hdr")).withColumn(
        "_subj", _clean(F.element_at("_cells", 1))
    )
    cells = rows.select(
        "url",
        *carry,
        "table_idx",
        "_subj",
        "_hdr",
        F.posexplode(
            F.slice("_cells", 2, F.size("_cells") - 1)
        ).alias("_cidx", "_cell"),
    )
    return (
        cells.select(
            "url",
            "table_idx",
            *carry,
            F.col("_subj").alias("subj"),
            # header cell aligned with this data cell (offset by the
            # subject column): header index = _cidx + 2 (1-based)
            _clean(F.element_at("_hdr", F.col("_cidx") + 2)).alias("pred"),
            _clean("_cell").alias("obj"),
        )
        .filter((F.col("subj") != "") & (F.col("obj") != "") & (F.col("pred") != ""))
    )
