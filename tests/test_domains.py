"""Registrable-domain (PSL) extraction: pure-python reference over all
rule types (plain/wildcard/exception/default), plan shape (broadcast
joins only — the corpus never shuffles), and the per-domain quota."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from deepee_spark.operators.domains import apply_psl, domain_quota

RULES = [
    "com",
    "org",
    "net",
    "io",
    "uk",
    "co.uk",
    "gov.uk",
    "github.io",
    "*.ck",
    "!www.ck",
]

HOSTS = [
    "www.site1.com",
    "site2.com",
    "blog.site3.co.uk",
    "a.b.site4.org",
    "deep.sub.tree.site5.gov.uk",
    "site6.github.io",
    "pages.site7.github.io",
    "site8.wat.ck",
    "x.site9.wat.ck",
    "www.ck",
    "gov.uk",  # apex: host == its public suffix -> NULL registrable
    "com",
    "weird.unknowntld",  # default '*' rule: last label is the suffix
    "unknowntld",
]


def _psl_py(host: str, rules: list[str]) -> tuple[str, str | None]:
    labels = host.split(".")
    n = len(labels)
    exc = [r[1:] for r in rules if r.startswith("!")]
    wild = [r[2:] for r in rules if r.startswith("*.")]
    plain = [r for r in rules if not r.startswith(("!", "*"))]
    ps_len = None
    for e in sorted(exc, key=lambda r: -len(r.split("."))):
        el = e.split(".")
        if n >= len(el) and labels[n - len(el):] == el:
            ps_len = len(el) - 1
            break
    if ps_len is None:
        best = 1
        for p in plain:
            pl = p.split(".")
            if n >= len(pl) and labels[n - len(pl):] == pl:
                best = max(best, len(pl))
        for wx in wild:
            wl = wx.split(".")
            if n >= len(wl) + 1 and labels[n - len(wl):] == wl:
                best = max(best, len(wl) + 1)
        ps_len = best
    ps = ".".join(labels[n - ps_len:])
    rd = ".".join(labels[n - ps_len - 1:]) if n > ps_len else None
    return ps, rd


@pytest.fixture(scope="module")
def rules_df(spark):
    return spark.createDataFrame([(r,) for r in RULES], "rule: string")


def test_apply_psl_matches_reference(spark, rules_df):
    df = spark.createDataFrame([(h,) for h in HOSTS], "host: string")
    got = {
        r.host: (r.public_suffix, r.registrable_domain)
        for r in apply_psl(df, rules_df).collect()
    }
    want = {h: _psl_py(h, RULES) for h in HOSTS}
    assert got == want


def test_apply_psl_no_shuffle(spark, rules_df):
    """The matching is K broadcast joins over the fact side: the plan
    must contain no shuffle of the corpus (no Exchange hashpartitioning
    on the host side, no SortMergeJoin)."""
    df = spark.range(0, 1000).select(
        F.concat(
            F.lit("www.site"), F.col("id").cast("string"), F.lit(".co.uk")
        ).alias("host")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        apply_psl(df, rules_df).explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_domain_quota(spark, rules_df):
    rows = [
        (i, f"{'abc'[i % 3]}.site{i % 4}.co.uk", (i * 7) % 50)
        for i in range(200)
    ]
    df = apply_psl(
        spark.createDataFrame(rows, "doc_id: long, host: string, score: long"),
        rules_df,
    )
    kept = domain_quota(df, quota=5).collect()
    by_dom = {}
    for r in kept:
        by_dom.setdefault(r.registrable_domain, []).append(r)
    assert set(by_dom) == {f"site{k}.co.uk" for k in range(4)}
    for dom, rs in by_dom.items():
        assert len(rs) == 5
        # kept rows are exactly the top-5 by (score DESC, doc_id ASC)
        # among that domain's candidates
        cand = sorted(
            (r for r in rows if _psl_py(r[1], RULES)[1] == dom),
            key=lambda t: (-t[2], t[0]),
        )[:5]
        assert sorted(r.doc_id for r in rs) == sorted(c[0] for c in cand)


def test_domain_quota_null_domain_kept(spark, rules_df):
    df = apply_psl(
        spark.createDataFrame(
            [(1, "gov.uk", 10), (2, "gov.uk", 5), (3, "gov.uk", 1)],
            "doc_id: long, host: string, score: long",
        ),
        rules_df,
    )
    assert domain_quota(df, quota=1).count() == 3  # NULL domain: all kept
