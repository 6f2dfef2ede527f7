"""Web-crawl pipeline operators: PII redaction, paragraph-level
boilerplate removal, URL blocklist filtering."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pii_detect_and_redact(spark):
    from deepee_spark.operators.pii import pii_stats

    cases = [
        # (text, n_emails, n_ipv4, n_phones, redacted)
        ("mail a.b+c@sub.example.co.uk now", 1, 0, 0, "mail <EMAIL> now"),
        ("x@y.org and z@w.io", 2, 0, 0, "<EMAIL> and <EMAIL>"),
        ("host 192.168.0.1 up", 0, 1, 0, "host <IP> up"),
        # the email's digit-bearing domain must not also count as an IP
        ("u@10x.example.org", 1, 0, 0, "<EMAIL>"),
        ("call +1-555-0192 or +44 203 0000", 0, 0, 2,
         "call <PHONE> or <PHONE>"),
        # version strings: 1.2.3 is not an IPv4 (needs 4 octets)
        ("release 1.2.3 shipped", 0, 0, 0, "release 1.2.3 shipped"),
        ("nothing here", 0, 0, 0, "nothing here"),
        ("a@b.io at 10.0.0.7 call +9 111 2222", 1, 1, 1,
         "<EMAIL> at <IP> call <PHONE>"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_rest) in enumerate(cases)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in pii_stats(df).collect()}
    for i, (text, ne, ni, np_, red) in enumerate(cases):
        r = out[i]
        got = (r["n_emails"], r["n_ipv4"], r["n_phones"], r["redacted"])
        assert got == (ne, ni, np_, red), (text, got)
        assert r["pii_total"] == ne + ni + np_


def test_paragraph_dedup_threshold_and_order(spark):
    from deepee_spark.operators.paragraphs import paragraph_dedup

    boiler = "subscribe now"
    docs = [
        (0, f"{boiler}\n\nunique zero\n\nshared pair"),
        (1, f"shared pair\n\n{boiler}\n\nunique one"),
        (2, f"{boiler}\n\nunique two"),
        (3, boiler),                      # all-boilerplate doc vanishes
        (4, "unique four\n\n\n\nunique four tail"),  # empty para dropped
    ]
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            spark.createDataFrame(docs, ["doc_id", "text"]), max_docs=2
        ).collect()
    }
    # boiler occurs in 4 docs -> dropped everywhere; "shared pair" in
    # exactly 2 docs -> sits on the threshold, kept; order preserved.
    assert out[0]["text"] == "unique zero\n\nshared pair"
    assert out[1]["text"] == "shared pair\n\nunique one"
    assert out[2]["text"] == "unique two"
    assert 3 not in out
    assert out[4]["text"] == "unique four\n\nunique four tail"
    assert out[4]["n_paras_kept"] == 2


def test_blocklist_filter_is_broadcast_anti_join(spark):
    from deepee_spark.operators.urls import filter_blocked_hosts

    crawl = spark.createDataFrame(
        [
            ("https://Bad.example.com/a",),
            ("https://ok.example.com/b",),
            ("http://also-ok.example.com:80/c",),
        ],
        ["url"],
    )
    blocked = spark.createDataFrame([("bad.example.com",)], ["host"])
    kept = filter_blocked_hosts(crawl, blocked)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert sorted(r["url"] for r in kept.collect()) == [
        "http://also-ok.example.com:80/c",
        "https://ok.example.com/b",
    ]
