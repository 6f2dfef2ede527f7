"""WARC source (sources/warc): pure-parser unit coverage (structure
strictness, http-header stripping, truncation) plus the Spark
binaryFile -> mapInPandas path and the write/parse roundtrip."""

from __future__ import annotations

from deepee_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    write_warc_bytes,
)


def _recs():
    body = b"<html><body><p>hello</p></body></html>"
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    return [
        {
            "warc_type": "warcinfo",
            "target_uri": "",
            "warc_date": "2024-01-01T00:00:00Z",
            "content_type": "application/warc-fields",
            "payload": b"software: test",
        },
        {
            "warc_type": "response",
            "target_uri": "https://ex.org/a",
            "warc_date": "2024-01-01T00:00:01Z",
            "content_type": "application/http; msgtype=response",
            "payload": http,
        },
        {
            "warc_type": "response",
            "target_uri": "https://ex.org/b",
            "warc_date": "2024-01-01T00:00:02Z",
            "content_type": "application/http; msgtype=response",
            # no http preamble: payload passes through as html
            "payload": b"<p>bare</p>",
        },
    ], body


def test_roundtrip_and_http_strip():
    recs, body = _recs()
    data = write_warc_bytes(recs)
    out = parse_warc_bytes(data)
    assert [r["warc_type"] for r in out] == ["warcinfo", "response", "response"]
    assert out[0]["html"] is None
    assert out[1]["html"] == body
    assert out[1]["target_uri"] == "https://ex.org/a"
    assert out[2]["html"] == b"<p>bare</p>"
    # payload preserved bit-exactly
    assert out[1]["payload"] == recs[1]["payload"]


def test_truncated_and_malformed():
    recs, _ = _recs()
    data = write_warc_bytes(recs)
    # cut inside the last record's payload: first two survive
    cut = parse_warc_bytes(data[: len(data) - 8])
    assert len(cut) == 2
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"not a warc\r\n\r\n") == []
    # missing Content-Length drops the record (nothing to resync to)
    bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    assert parse_warc_bytes(bad) == []


def test_malformed_record_resyncs_to_tail():
    # ADVICE r3: one corrupt record mid-file must not cost the tail
    recs, _ = _recs()
    good = write_warc_bytes(recs)  # 3 records
    corrupt = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"Content-Length: notanumber\r\n\r\njunk junk\r\n\r\n"
    )
    dropped: list = []
    out = parse_warc_bytes(corrupt + good, dropped)
    assert len(out) == 3
    assert [r["target_uri"] for r in out] == [r["target_uri"] for r in recs]
    assert len(dropped) == 1 and dropped[0][0] == 0
    # corrupt length field that overruns into the next record: resync
    # recovers everything after the bad record
    bad_len = write_warc_bytes([recs[0]]).replace(
        b"Content-Length: " + str(len(recs[0]["payload"])).encode(),
        b"Content-Length: 99999", 1)
    dropped2: list = []
    out2 = parse_warc_bytes(bad_len + good, dropped2)
    assert len(out2) == 3 and len(dropped2) == 1


def test_read_warc_spark(spark, tmp_path):
    recs, body = _recs()
    p = tmp_path / "shard-00000.warc"
    p.write_bytes(write_warc_bytes(recs))
    # a second file to prove per-file parallel explode
    (tmp_path / "shard-00001.warc").write_bytes(
        write_warc_bytes([recs[1]])
    )
    df = read_warc(spark, str(tmp_path)).cache()
    assert df.count() == 4
    resp = df.filter("warc_type = 'response' and rec_idx = 1").collect()
    assert len(resp) == 1 and bytes(resp[0].html) == body
    by_file = {r.path: r for r in df.filter("rec_idx = 0").collect()}
    assert len(by_file) == 2


def test_warc_resync_property_junk_never_costs_following_records():
    # property: arbitrary junk spliced BETWEEN record encodings (as long
    # as it cannot be mistaken for a record boundary mid-scan, i.e. the
    # junk itself contains no CRLF WARC/ magic) never costs any record
    # that follows it
    from hypothesis import given, settings
    from hypothesis import strategies as st

    recs, _ = _recs()
    encoded = [write_warc_bytes([r]) for r in recs]

    junk = st.binary(min_size=1, max_size=60).filter(
        lambda b: b"\r\nWARC/" not in b
        and not b.startswith(b"WARC/")
        and b.strip(b"\r\n") != b""
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(st.none(), junk), min_size=4, max_size=4))
    def check(gaps):
        buf = b""
        for g, enc in zip(gaps, encoded + [b""]):
            if g is not None:
                buf += g + b"\r\n"
            buf += enc
        dropped: list = []
        out = parse_warc_bytes(buf, dropped)
        got = [r["target_uri"] for r in out]
        want = [r["target_uri"] for r in recs]
        # every real record survives, in order, regardless of junk
        assert got == want, (got, gaps)
        # one reported span per junk segment (trailing junk included)
        assert len(dropped) == sum(1 for g in gaps if g is not None)

    check()
