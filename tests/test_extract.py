"""Byte-identical extraction invariant (BASELINE.md §2) + SC5 edge cases."""

from __future__ import annotations

from deepee_spark.corpus import corpus_df, gen_doc
from deepee_spark.extract import extract_text, full_to_half, with_extracted_text


def test_full_to_half():
    assert full_to_half("ＡＢ１２３") == "AB123"
    assert full_to_half("　x") == " x"
    assert full_to_half("abc") == "abc"


def test_extract_basics():
    html = (
        b"<html><head><style>x{}</style></head>"
        b"<nav>junk</nav><body><p>Hello &amp; world</p>"
        b"<p>\xef\xbc\xa1\xef\xbc\xa2</p></body><footer>f</footer></html>"
    )
    assert extract_text(html) == "Hello & world\nAB"


def test_extract_edge_cases():
    assert extract_text(None) == ""
    assert extract_text(b"") == ""
    assert extract_text(b"<html><body></body></html>") == ""
    # boilerplate-only body
    assert extract_text(b"<body><nav>a</nav><script>b</script></body>") == ""
    # whitespace collapse + numeric entity
    assert extract_text(b"<body><p> a\n\t b &#97; </p></body>") == "a b a"


def test_generator_golden_text_is_extractor_output():
    for i in range(50):
        d = gen_doc(i)
        assert extract_text(d["html"]) == d["text"], d["url"]


def test_udf_path_byte_identical(spark):
    docs = corpus_df(spark, 40)
    out = with_extracted_text(docs.withColumnRenamed("text", "golden"))
    rows = out.select("url", "golden", "text").collect()
    assert len(rows) == 40
    for r in rows:
        assert r["text"].encode() == r["golden"].encode(), r["url"]
