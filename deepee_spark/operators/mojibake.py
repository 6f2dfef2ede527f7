"""Mojibake repair — undo UTF-8-as-Latin-1 double encoding (ftfy-lite).

The single most common encoding defect in web crawls: a page's UTF-8
bytes were decoded as Latin-1/Windows-1252 somewhere upstream, so
every non-ASCII character became 2-4 junk characters ('é' -> 'Ã©',
'—' -> 'â€”', '中' -> 'ä¸­'). The public ftfy library's core insight
is that this transformation is *invertible*: re-encode the junk as
(Windows-1252-extended) Latin-1 and decode as UTF-8.

A 100 TB pass cannot run a per-row Python library, and the repair must
be replicable by the DuckDB oracle, so this implements the inverse as
a FINITE substitution table: every 2-byte UTF-8 sequence for the
Latin-1 supplement (U+00A0-U+00FF — the Western-European alphabet that
dominates real mojibake) plus the common Windows-1252 punctuation
(curly quotes, dashes, ellipsis, €). Each entry maps the 2-3-char
junk form back to its original character; application is a chained
`replace` fold (pure Catalyst, JVM codegen — one pass per table entry,
each a simple scan). Characters outside the table pass through
untouched — the ftfy contract: never corrupt clean text.

``MOJIBAKE_TABLE`` is ordered longest-junk-first so 3-char
Windows-1252 sequences ('â€"') repair before any 2-char prefix could
shadow them.

``score_mojibake`` counts junk-sequence hits per document — the
detection side: route only suspicious docs through the repair fold
(at scale the repair is a filter-then-map, not a blanket rewrite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Windows-1252 bytes 0x80-0x9F map to these codepoints (public spec);
# the rest of 0xA0-0xFF is identity Latin-1.
_CP1252 = {
    0x80: 0x20AC, 0x82: 0x201A, 0x83: 0x0192, 0x84: 0x201E, 0x85: 0x2026,
    0x86: 0x2020, 0x87: 0x2021, 0x88: 0x02C6, 0x89: 0x2030, 0x8A: 0x0160,
    0x8B: 0x2039, 0x8C: 0x0152, 0x8E: 0x017D, 0x91: 0x2018, 0x92: 0x2019,
    0x93: 0x201C, 0x94: 0x201D, 0x95: 0x2022, 0x96: 0x2013, 0x97: 0x2014,
    0x98: 0x02DC, 0x99: 0x2122, 0x9A: 0x0161, 0x9B: 0x203A, 0x9C: 0x0153,
    0x9E: 0x017E,
}


def _byte_to_char(b: int) -> str:
    """A mojibake byte as it appears on screen: Windows-1252 glyph for
    0x80-0x9F (that's how browsers and most pipelines render it),
    Latin-1 for the rest."""
    return chr(_CP1252.get(b, b))


def _build_table() -> list[tuple[str, str]]:
    out = []
    # Latin-1 supplement + the CP1252 punctuation block, as seen
    # through the UTF-8-decoded-as-1252 lens.
    targets = [chr(c) for c in range(0xA0, 0x100)] + [
        chr(v) for v in _CP1252.values()
    ]
    for ch in targets:
        junk = "".join(_byte_to_char(b) for b in ch.encode("utf-8"))
        out.append((junk, ch))
    # longest junk first so no prefix shadows a longer sequence
    out.sort(key=lambda kv: (-len(kv[0]), kv[0]))
    return out


MOJIBAKE_TABLE: list[tuple[str, str]] = _build_table()


def repair_expr(col: Column) -> Column:
    """Chained-replace repair fold over MOJIBAKE_TABLE."""
    for junk, good in MOJIBAKE_TABLE:
        col = F.replace(col, F.lit(junk), F.lit(good))
    return col


def repair_mojibake(
    df: DataFrame, text_col: str = "text", out_col: str = "text_fixed"
) -> DataFrame:
    """Add ``out_col`` = double-encoding-repaired ``text_col``."""
    return df.withColumn(out_col, repair_expr(F.col(text_col)))


# UTF-8 continuation bytes (0x80-0xBF) as their on-screen 1252 glyphs:
# what follows a mojibake lead character. None are regex-class specials.
_CONT_GLYPHS = "".join(_byte_to_char(b) for b in range(0x80, 0xC0))
# Lead glyphs: 0xC2/0xC3 (2-byte Latin-1 supplement) and 0xE2 (3-byte
# CP1252 punctuation) -- the overwhelmingly common mojibake starts.
_SCORE_PAT = "[" + _byte_to_char(0xC3) + _byte_to_char(0xC2) \
    + _byte_to_char(0xE2) + "][" + _CONT_GLYPHS + "]"


def score_mojibake(
    df: DataFrame, text_col: str = "text", out_col: str = "n_mojibake"
) -> DataFrame:
    """Count mojibake-sequence hits (detection gate for the repair):
    occurrences of a telltale lead glyph followed by a continuation-
    range glyph. One regexp_count, no fold -- route only hits through
    the repair at scale."""
    return df.withColumn(
        out_col,
        F.regexp_count(F.col(text_col), F.lit(_SCORE_PAT)).cast("int"),
    )


def oracle_repair_sql(col: str) -> str:
    """The DuckDB twin of repair_expr: the same chained replace()
    fold, same order."""
    expr = col
    for junk, good in MOJIBAKE_TABLE:
        j = junk.replace("'", "''")
        g = good.replace("'", "''")
        expr = f"replace({expr}, '{j}', '{g}')"
    return expr


def repair_suspects(
    df: DataFrame, text_col: str = "text", out_col: str = "text"
) -> DataFrame:
    """The scale composition: detect -> repair ONLY flagged rows ->
    union the untouched rest. The 122-entry replace fold costs 122
    string scans per row, but real-corpus mojibake incidence is a few
    percent — one cheap regexp_count gates the fold to that slice, so
    the pass costs ~1 scan/row + fold on the suspects. Output schema
    == input schema (text repaired in place)."""
    scored = score_mojibake(df, text_col, "_n_mojibake")
    clean = scored.filter(F.col("_n_mojibake") == 0).drop("_n_mojibake")
    fixed = (
        scored.filter(F.col("_n_mojibake") > 0)
        .drop("_n_mojibake")
        .withColumn(out_col, repair_expr(F.col(text_col)))
    )
    if out_col != text_col:
        clean = clean.withColumn(out_col, F.col(text_col))
    return clean.unionByName(fixed)
