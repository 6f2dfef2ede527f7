"""Mojibake repair (operators/mojibake): table correctness against
Python's own encode/decode (the ground truth the table is derived
from), Spark repair/score behavior, and clean-text passthrough."""

from __future__ import annotations

from deepee_spark.operators.mojibake import (
    MOJIBAKE_TABLE,
    repair_mojibake,
    score_mojibake,
)


def _break(s: str) -> str:
    """Ground-truth mojibake: utf-8 bytes seen through the sloppy-1252
    lens (1252 glyphs for defined bytes, Latin-1 passthrough for the
    five undefined ones) — exactly what _byte_to_char models."""
    from deepee_spark.operators.mojibake import _byte_to_char

    return "".join(_byte_to_char(b) for b in s.encode("utf-8"))


def _fix(s: str) -> str:
    for junk, good in MOJIBAKE_TABLE:
        s = s.replace(junk, good)
    return s


def test_table_inverts_latin1_supplement():
    for c in map(chr, range(0xA0, 0x100)):
        assert _fix(_break(c)) == c, hex(ord(c))


def test_table_inverts_cp1252_punct():
    for c in ["€", "‘", "’", "“", "”", "–", "—", "…", "™", "Š", "œ"]:
        assert _fix(_break(c)) == c


def test_spark_repair_and_score(spark):
    rows = [
        (1, _break("café — naïve €5 “ok”")),
        (2, "perfectly clean ascii text"),
        (3, _break("résumé für Sørensen")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_mojibake, r.text_fixed)
        for r in score_mojibake(repair_mojibake(df)).collect()
    }
    assert out[1][1] == "café — naïve €5 “ok”"
    assert out[3][1] == "résumé für Sørensen"
    # clean text untouched, scores zero
    assert out[2] == (0, "perfectly clean ascii text")
    # broken rows scored positive BEFORE repair
    pre = {r.doc_id: r.n_mojibake for r in score_mojibake(df).collect()}
    assert pre[1] > 0 and pre[3] > 0 and pre[2] == 0


def test_repaired_text_scores_zero(spark):
    df = spark.createDataFrame(
        [(1, _break("déjà vu — l’été"))], "doc_id long, text string"
    )
    fixed = repair_mojibake(df).select(
        "doc_id", "text_fixed"
    ).withColumnRenamed("text_fixed", "text")
    assert score_mojibake(fixed).collect()[0].n_mojibake == 0


def test_repair_suspects_gated_composition(spark):
    rows = [
        (1, _break("café au lait")),
        (2, "already clean"),
        (3, _break("naïve — test")),
    ]
    from deepee_spark.operators.mojibake import repair_suspects

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.text for r in repair_suspects(df).collect()}
    assert out == {1: "café au lait", 2: "already clean", 3: "naïve — test"}


def test_nfc_normalize_gate_and_equivalence(spark):
    import unicodedata

    from deepee_spark.operators.textstats import nfc_normalize

    rows = [
        (1, "plain ascii"),
        (2, "café"),            # decomposed -> café
        (3, "café"),             # already NFC
        (4, "Å ring"),          # decomposed ring -> Å
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text_nfc, r.nfc_changed)
           for r in nfc_normalize(df).collect()}
    for i, t in rows:
        want = unicodedata.normalize("NFC", t)
        assert got[i] == (want, want != t), (i, got[i])
    assert got[2][0] == "café" and got[2][1] is True
    assert got[3][1] is False and got[1][1] is False
    # cross-engine: DuckDB nfc_normalize agrees
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?,?)", rows)
    oracle = {
        i: n for i, n in con.execute(
            "SELECT doc_id, nfc_normalize(text) FROM t"
        ).fetchall()
    }
    assert {i: v[0] for i, v in got.items()} == oracle
    con.close()


def test_nfc_gate_is_structural_not_when_wrapped(spark):
    """ADVICE r4: F.when(gate, pandas_udf(...)) does NOT gate — Spark
    hoists the UDF into an ArrowEvalPython node evaluated for every
    row. The fixed gate is structural: the plan must hold exactly ONE
    ArrowEvalPython node, fed ONLY by the positive non-ASCII rlike
    filter branch of the union; the ASCII branch stays pure JVM (a
    null text row routes through the ASCII branch — pinned above by
    the row-5 empty string and here by an explicit None)."""
    from deepee_spark.operators.textstats import nfc_normalize

    df = spark.createDataFrame(
        [(1, "plain"), (2, "café"), (3, None)], "doc_id long, text string"
    )
    out = nfc_normalize(df)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # one ArrowEvalPython node: once in the tree, once in the detail
    assert plan.count("ArrowEvalPython") == 2, plan
    # the tree: Union over [ascii branch (no Arrow), exotic branch]
    tree = plan.split("\n\n")[0]
    branches = tree.split("Union")[-1]
    assert branches.count("ArrowEvalPython") == 1, tree
    rows = {r.doc_id: (r.text_nfc, r.nfc_changed) for r in out.collect()}
    assert rows[3] == (None, None)
    assert rows[1] == ("plain", False)
