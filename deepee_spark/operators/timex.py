"""Temporal-expression normalization (TIMEX-lite) — date mentions in
extracted text -> ISO-8601 ``yyyy-MM-dd`` values.

Event triples are only as useful as their time arguments: the
reference's event schemas carry Time-Within/Time-Holds roles (ACE) and
DuEE time arguments as raw surface strings, and a KG build must
canonicalize them before temporal queries (operators/temporal.py
asof_join / fact_validity_intervals) can consume them. This is the
deterministic, lexicon-driven core of a TIMEX normalizer — the part
that covers the overwhelming majority of web date mentions — kept
regex+expression only so both engines (Spark and the DuckDB oracle)
can implement identical semantics.

Recognized forms (documented; first match wins per rule order):
  1. ISO               2020-01-05
  2. Slash D/M/Y or M/D/Y per the ``dayfirst`` flag   05/01/2020
  3. Month-name D, Y   January 5, 2020   /  Jan 5 2020  (ordinals ok:
     "January 5th, 2020"; case-insensitive; 3-letter abbreviations)
  4. D Month-name Y    5 January 2020    /  5th Jan 2020

Rules (both engines):
  - years must be 4-digit 1000-2999; months 01-12; days 01-31 (no
    calendar validation — a normalizer flags, it does not correct);
  - output is zero-padded ISO; non-matching input -> NULL iso_date;
  - ``extract_dates`` scans free text and emits ALL matches in
    document order; ``normalize_date_col`` normalizes a column that
    already holds a single expression (the event-argument path).

All pure Catalyst expressions (regexp_extract / str_to_map lookup via
a literal month map) — zero shuffle, zero UDF, linear in input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MONTHS = {
    "jan": "01", "feb": "02", "mar": "03", "apr": "04",
    "may": "05", "jun": "06", "jul": "07", "aug": "08",
    "sep": "09", "oct": "10", "nov": "11", "dec": "12",
}

_ISO_RE = r"^([12]\d{3})-(0[1-9]|1[0-2])-(0[1-9]|[12]\d|3[01])$"
_SLASH_RE = r"^(\d{1,2})/(\d{1,2})/([12]\d{3})$"
# "January 5, 2020" | "Jan 5th 2020"
_MDY_RE = (
    r"(?i)^([a-z]{3,9})\.?\s+(\d{1,2})(?:st|nd|rd|th)?\s*,?\s+([12]\d{3})$"
)
# "5 January 2020" | "5th Jan, 2020"
_DMY_RE = (
    r"(?i)^(\d{1,2})(?:st|nd|rd|th)?\s+([a-z]{3,9})\.?\s*,?\s+([12]\d{3})$"
)

# free-text scan variants (unanchored, word-bounded)
_SCAN_RES = [
    r"[12]\d{3}-\d{2}-\d{2}",
    r"\b\d{1,2}/\d{1,2}/[12]\d{3}\b",
    r"(?i)\b[a-z]{3,9}\.?\s+\d{1,2}(?:st|nd|rd|th)?\s*,?\s+[12]\d{3}\b",
    r"(?i)\b\d{1,2}(?:st|nd|rd|th)?\s+[a-z]{3,9}\.?\s*,?\s+[12]\d{3}\b",
]


def _month_num(name: Column) -> Column:
    """Month name/abbreviation -> '01'..'12' via a literal map lookup
    on the first 3 letters; unknown -> NULL. (A 12-entry literal map,
    not a join — the lookup stays inside codegen.)"""
    m = F.create_map(
        *[F.lit(x) for kv in _MONTHS.items() for x in kv]
    )
    return m[F.lower(F.substring(name, 1, 3))]


def _pad2(c: Column) -> Column:
    return F.lpad(c.cast("string"), 2, "0")


def _valid(y: Column, m: Column, d: Column) -> Column:
    ok = (
        y.isNotNull() & m.isNotNull() & d.isNotNull()
        & m.cast("int").between(1, 12)
        & d.cast("int").between(1, 31)
    )
    return F.when(ok, F.concat_ws("-", y, _pad2(m), _pad2(d)))


def normalize_expr(col: Column, dayfirst: bool = False) -> Column:
    """One date expression -> ISO string or NULL. Rule order as
    documented; ``dayfirst`` picks D/M/Y for the slash form."""
    s = F.trim(col)
    iso = F.when(s.rlike(_ISO_RE), s)
    s1 = F.regexp_extract(s, _SLASH_RE, 1)
    s2 = F.regexp_extract(s, _SLASH_RE, 2)
    s3 = F.regexp_extract(s, _SLASH_RE, 3)
    slash = F.when(
        s.rlike(_SLASH_RE),
        _valid(s3, s1 if not dayfirst else s2, s2 if not dayfirst else s1),
    )
    mdy = F.when(
        s.rlike(_MDY_RE),
        _valid(
            F.regexp_extract(s, _MDY_RE, 3),
            _month_num(F.regexp_extract(s, _MDY_RE, 1)),
            F.regexp_extract(s, _MDY_RE, 2),
        ),
    )
    dmy = F.when(
        s.rlike(_DMY_RE),
        _valid(
            F.regexp_extract(s, _DMY_RE, 3),
            _month_num(F.regexp_extract(s, _DMY_RE, 2)),
            F.regexp_extract(s, _DMY_RE, 1),
        ),
    )
    return F.coalesce(iso, slash, mdy, dmy)


def normalize_date_col(
    df: DataFrame, col: str, out_col: str = "iso_date", dayfirst: bool = False
) -> DataFrame:
    """Add ``out_col`` = normalized ISO date (or NULL) for ``col``."""
    return df.withColumn(out_col, normalize_expr(F.col(col), dayfirst))


def extract_dates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scan free text for date mentions: -> (id, mention, iso_date),
    one row per recognized mention (all four surface families),
    normalized through the same rule set. Narrow map + explode."""
    scans = [
        F.regexp_extract_all(F.col(text_col), F.lit(p), F.lit(0))
        for p in _SCAN_RES
    ]
    mentions = F.flatten(F.array(*scans))
    return (
        docs.select(F.col(id_col), F.explode(mentions).alias("mention"))
        .withColumn("iso_date", normalize_expr(F.col("mention")))
        .filter(F.col("iso_date").isNotNull())
    )
