"""Web-table relational extraction (operators/webtables).

Hand-built HTML fixtures + a tiny single-process python oracle using
the same documented interpretation rules, so every branch (ragged rows,
1-column tables, header-only tables, nested tags in cells, th vs td,
attributes, whitespace) is pinned by an independent implementation.
"""

from __future__ import annotations

import re

from deepee_spark.operators.webtables import extract_cells, table_triples

_PAGES = [
    (
        "http://a.example/1",
        """<html><body><p>prose</p>
        <table class="x">
          <tr><th>name</th><th>capital</th><th>pop</th></tr>
          <tr><td>France</td><td>Paris</td><td>68</td></tr>
          <tr><td>Japan</td><td>Tokyo</td><td>125</td></tr>
        </table></body></html>""",
    ),
    (
        "http://a.example/2",
        # second table on the page; first is too narrow (1 col)
        """<table><tr><td>only</td></tr><tr><td>one</td></tr></table>
        <table>
          <tr><td>k</td><td>v</td></tr>
          <tr><td> <b>alpha</b> </td><td>1 &amp; 2</td></tr>
          <tr><td>beta</td><td></td></tr>
          <tr><td>ragged</td><td>x</td><td>y</td></tr>
        </table>""",
    ),
    (
        "http://a.example/3",
        # header-only table and a table with uppercase/attr'd tags
        """<table><tr><th>h1</th><th>h2</th></tr></table>
        <TABLE id="t"><TR><TD>col</TD><TD a=1>val</TD></TR>
        <TR><TD>s</TD><TD>o</TD></TR></TABLE>""",
    ),
    ("http://a.example/4", "<p>no tables at all</p>"),
]


def _clean(s: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"<[^>]+>", " ", s)).strip()


def _oracle_triples(pages):
    """Independent single-process implementation of the documented rules."""
    out = []
    for url, html in pages:
        for t_idx, tbl in enumerate(
            re.findall(r"(?s)<table[^>]*>(.*?)</table\s*>", html)
        ):
            rows = [
                re.findall(r"(?s)<t[dh][^>]*>(.*?)</t[dh]\s*>", r)
                for r in re.findall(r"(?s)<tr[^>]*>(.*?)</tr\s*>", tbl)
            ]
            if len(rows) < 2 or len(rows[0]) < 2:
                continue
            hdr = [_clean(c) for c in rows[0]]
            for row in rows[1:]:
                if len(row) != len(hdr):
                    continue
                subj = _clean(row[0])
                for c_idx in range(1, len(row)):
                    pred, obj = hdr[c_idx], _clean(row[c_idx])
                    if subj and pred and obj:
                        out.append((url, t_idx, subj, pred, obj))
    return sorted(out)


def _docs(spark):
    return spark.createDataFrame(_PAGES, "url string, html string")


def test_table_triples_match_oracle(spark):
    got = sorted(
        tuple(r)
        for r in table_triples(_docs(spark)).collect()
    )
    assert got == _oracle_triples(_PAGES)
    # spot-check semantic content
    assert ("http://a.example/1", 0, "France", "capital", "Paris") in got
    assert ("http://a.example/1", 0, "Japan", "pop", "125") in got
    # second table of page 2 (the 1-col table is table_idx 0, emits none)
    assert ("http://a.example/2", 1, "alpha", "v", "1 & 2") not in got  # &amp; not unescaped
    assert ("http://a.example/2", 1, "alpha", "v", "1 &amp; 2") in got
    # beta row: empty object dropped
    assert not [t for t in got if t[2] == "beta"]
    # ragged row dropped
    assert not [t for t in got if t[2] == "ragged"]


def test_case_sensitivity_documented(spark):
    # lowercase tags only (both the operator and the oracle): page 3's
    # uppercase <TABLE> is skipped, and its header-only table emits
    # nothing — the page yields zero triples
    got = [
        r
        for r in table_triples(_docs(spark)).collect()
        if r.url == "http://a.example/3"
    ]
    assert got == []


def test_extract_cells_shape(spark):
    cells = extract_cells(_docs(spark)).collect()
    page1 = [c for c in cells if c.url == "http://a.example/1"]
    assert len(page1) == 9  # 3x3 table
    assert {(c.row_idx, c.col_idx) for c in page1} == {
        (r, c) for r in range(3) for c in range(3)
    }
    hdr = sorted(c.cell for c in page1 if c.row_idx == 0)
    assert hdr == ["capital", "name", "pop"]


def test_binary_html_column(spark):
    bdocs = spark.createDataFrame(
        [(u, h.encode("utf-8")) for u, h in _PAGES], "url string, html binary"
    )
    got = sorted(tuple(r) for r in table_triples(bdocs).collect())
    assert got == _oracle_triples(_PAGES)


def test_no_shuffle_plan(spark):
    plan = table_triples(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
