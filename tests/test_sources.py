"""Scan operators S1-S4 (sources/ace_json.py, sources/conll.py) against
reference-shaped fixtures (MOGANED data/sample.json, JMEE
ace-05-splits/sample.json, QAEE convert_examples output, EEGCN
data_doc/example_data layouts)."""

from __future__ import annotations

import json

import pytest

from deepee_spark.sources.ace_json import (
    read_ace_array,
    read_ace_jsonl_arrays,
    read_sentence_jsonl,
)
from deepee_spark.sources.conll import read_conll

_ACE_SENT = {
    "words": ["he", "was", "arrested", "in", "baghdad", "yesterday"],
    "pos-tags": ["PRP", "VBD", "VBN", "IN", "NNP", "NN"],
    "golden-entity-mentions": [
        {"start": 0, "end": 1, "entity-type": "PER"},
        {"start": 4, "end": 5, "entity-type": "GPE"},
    ],
    "golden-event-mentions": [
        {
            "trigger": {"start": 2, "end": 3, "text": "arrested"},
            "event_type": "Justice:Arrest-Jail",
            "arguments": [
                {"start": 0, "end": 1, "role": "Person"},
                {"start": 4, "end": 5, "role": "Place"},
            ],
        }
    ],
}

_SHORT = {"words": ["too", "short"], "pos-tags": ["RB", "JJ"],
          "golden-entity-mentions": [], "golden-event-mentions": []}

_LONG = {
    "words": [f"w{i}" for i in range(60)],
    "pos-tags": ["NN"] * 60,
    "golden-entity-mentions": [
        {"start": 55, "end": 56, "entity-type": "PER"},  # past CUTOFF: drop
        {"start": 48, "end": 57, "entity-type": "ORG"},  # end clamps to 50
    ],
    "golden-event-mentions": [],
}


def test_s1_ace_array(spark, tmp_path):
    p = tmp_path / "ace.json"
    p.write_text(json.dumps([_ACE_SENT, _SHORT, _LONG]))
    out = read_ace_array(spark, str(p)).orderBy("sent_id").collect()
    # min-length filter dropped _SHORT
    assert len(out) == 2
    first = out[0]
    assert first["words"][2] == "arrested"
    assert first["events"][0]["event_type"] == "Justice:Arrest-Jail"
    assert [a["role"] for a in first["events"][0]["arguments"]] == [
        "Person", "Place",
    ]
    longrow = out[1]
    assert len(longrow["words"]) == 50  # CUTOFF truncation
    assert [e["entity_type"] for e in longrow["entities"]] == ["ORG"]
    assert longrow["entities"][0]["end"] == 50  # clamped


def test_s2_jsonl_arrays(spark, tmp_path):
    p = tmp_path / "ace.jsonl"
    p.write_text(
        json.dumps([_ACE_SENT, _SHORT]) + "\n" + json.dumps([_ACE_SENT]) + "\n"
    )
    out = read_ace_jsonl_arrays(spark, str(p)).collect()
    assert len(out) == 2  # _SHORT filtered; two surviving sentences
    assert all(r["words"][2] == "arrested" for r in out)


def test_s3_sentence_jsonl(spark, tmp_path):
    p = tmp_path / "sent.jsonl"
    rec = {
        "sentence": ["he", "was", "arrested", "in", "baghdad"],
        "event": [[[12, "Justice:Arrest-Jail"], [10, 10, "Person"],
                   [14, 14, "Place"]]],
        "s_start": 10,
    }
    p.write_text(json.dumps(rec) + "\n")
    out = read_sentence_jsonl(spark, str(p)).collect()
    assert len(out) == 1
    ev = out[0]["events"][0]
    assert ev["trigger_start"] == 2 and ev["event_type"] == "Justice:Arrest-Jail"
    assert [(a["start"], a["end"], a["role"]) for a in ev["arguments"]] == [
        (0, 1, "Person"), (4, 5, "Place"),
    ]


def test_s4_conll(spark, tmp_path):
    p = tmp_path / "conll.txt"
    lines = [
        "He doc1 PER PER.Individual O nsubj 2",
        "was doc1 O O O aux 2",
        "arrested doc1 O O B-Justice root 0",
        "",
        "... doc1 O O O punct 1",  # noise token dropped (F8)
        "Short doc1 O O O nsubj 1",
        "sentence doc1 O O O obj 0",
        "",
    ]
    p.write_text("\n".join(lines) + "\n")
    out = {r["sent_id"]: r for r in read_conll(spark, str(p)).collect()}
    assert len(out) == 2
    s0 = out[0]
    assert s0["tokens"] == ["He", "was", "arrested"]
    assert s0["event_tags"] == ["O", "O", "B-Justice"]
    assert s0["dep_heads"] == [2, 2, 0]
    s1 = out[max(out)]
    assert s1["tokens"] == ["Short", "sentence"]  # '...' dropped


def test_s2_jsonl_arrays_multifile_no_overflow(spark, tmp_path):
    """ADVICE r1 (high): >1 input partition used to overflow the int
    sent_id cast (monotonically_increasing_id embeds partitionId<<33).
    Two files force two partitions; sent_ids must stay dense per file."""
    for i in range(2):
        (tmp_path / f"part{i}.jsonl").write_text(
            json.dumps([_ACE_SENT]) + "\n" + json.dumps([_ACE_SENT]) + "\n"
        )
    out = read_ace_jsonl_arrays(spark, str(tmp_path)).collect()
    assert len(out) == 4
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["sent_id"])
    assert len(by_doc) == 2
    for sids in by_doc.values():
        assert sorted(sids) == [0, 1]  # dense per-file rank, no overflow


def test_s4_conll_short_line_degrades_to_nulls(spark, tmp_path):
    """ADVICE r1 (medium): a line with fewer than 7 fields must not abort
    the read under ANSI mode — missing columns degrade to nulls."""
    p = tmp_path / "conll.txt"
    p.write_text("He doc1 PER PER.Individual O nsubj 2\nbroken doc1\n\n")
    out = read_conll(spark, str(p)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["tokens"] == ["He", "broken"]
    assert row["event_tags"] == ["O", None]
    assert row["dep_heads"] == [2, None]


def test_s3_malformed_event_entries_skipped(spark, tmp_path):
    """ADVICE r1 (low): empty/short event inner lists are skipped, not a
    scan-wide ANSI failure."""
    p = tmp_path / "sent.jsonl"
    rec = {
        "sentence": ["he", "was", "arrested", "in", "baghdad"],
        "event": [
            [],                                   # empty event entry
            [[12]],                               # trigger missing type
            [[12, "Justice:Arrest-Jail"], [10]],  # short argument entry
        ],
        "s_start": 10,
    }
    p.write_text(json.dumps(rec) + "\n")
    out = read_sentence_jsonl(spark, str(p)).collect()
    assert len(out) == 1
    evs = out[0]["events"]
    assert len(evs) == 1  # only the well-formed trigger survives
    assert evs[0]["event_type"] == "Justice:Arrest-Jail"
    assert evs[0]["arguments"] == []  # short argument entry dropped


def test_s9_examples_pickle_to_parquet(spark, tmp_path):
    import pickle

    from deepee_spark.sources.pickle_convert import examples_pickle_to_parquet

    recs = [
        {"words": ["he", "ran"], "sent_id": 0, "event_type": "Conflict:Attack"},
        {"words": ["x"], "sent_id": 1},  # missing key -> null column
    ]
    p = tmp_path / "ex.pkl"
    p.write_bytes(pickle.dumps(recs))
    out = examples_pickle_to_parquet(spark, str(p), str(tmp_path / "ex.parquet"))
    rows = {r["sent_id"]: r for r in out.collect()}
    assert rows[0]["words"] == ["he", "ran"]
    assert rows[0]["event_type"] == "Conflict:Attack"
    assert rows[1]["event_type"] is None


def test_s10_vocab_pickle_to_parquet(spark, tmp_path):
    import pickle

    from deepee_spark.sources.pickle_convert import vocab_pickle_to_parquet

    p1 = tmp_path / "v1.pkl"
    p1.write_bytes(pickle.dumps({"<pad>": 0, "the": 1, "cat": 2}))
    out1 = vocab_pickle_to_parquet(spark, str(p1), str(tmp_path / "v1.parquet"))
    assert {(r["token"], r["id"]) for r in out1.collect()} == {
        ("<pad>", 0), ("the", 1), ("cat", 2),
    }
    p2 = tmp_path / "v2.pkl"
    p2.write_bytes(pickle.dumps(["<pad>", "a", "b"]))
    out2 = vocab_pickle_to_parquet(spark, str(p2), str(tmp_path / "v2.parquet"))
    assert {(r["token"], r["id"]) for r in out2.collect()} == {
        ("<pad>", 0), ("a", 1), ("b", 2),
    }


def test_k2_conll_result_sink_roundtrip(spark, tmp_path):
    """K2: the conlleval-format sink writes `token gold pred` lines with
    blank sentence separators that read_conll-style grouping recovers."""
    from deepee_spark.sources.conll import write_conll_results

    df = spark.createDataFrame(
        [
            (0, ["He", "ran"], ["B-PER", "O"], ["B-PER", "O"]),
            (1, ["Stop"], ["O"], ["B-ORG"]),
        ],
        ["sent_id", "tokens", "gold_tags", "pred_tags"],
    )
    out = str(tmp_path / "results")
    write_conll_results(df, out)
    text = spark.sparkContext.textFile(out).collect()
    sentences, cur = [], []
    for ln in text:
        if ln.strip() == "":
            if cur:
                sentences.append(cur)
                cur = []
        else:
            cur.append(ln.split(" "))
    if cur:
        sentences.append(cur)
    parsed = {tuple(t[0] for t in s): s for s in sentences}
    assert ("He", "ran") in parsed and ("Stop",) in parsed
    assert parsed[("Stop",)][0] == ["Stop", "O", "B-ORG"]
    assert parsed[("He", "ran")][0] == ["He", "B-PER", "B-PER"]


def test_s11_framenet_ingest_and_fanout(spark, tmp_path):
    """S11: FrameNet-style frame/exemplar JSON ingest (RCEE
    util_framenet.py:6-48 dump shapes) — explicit-schema reads, FE and
    lexunit fan-outs, and JVM-side FE surface slicing that must match
    python string slicing of the same artifact byte-for-byte."""
    import json

    from deepee_spark.sources.framenet import (
        exemplar_fe_surfaces,
        frame_elements,
        lexunit_index,
        read_exemplars,
        read_frames,
        synth_framenet,
    )

    fp, ep = synth_framenet(str(tmp_path))
    frames = read_frames(spark, fp)
    ex = read_exemplars(spark, ep)

    raw_frames = json.load(open(fp))
    raw_ex = json.load(open(ep))
    assert frames.count() == len(raw_frames)
    assert ex.count() == len(raw_ex)

    fe = frame_elements(frames)
    assert fe.count() == sum(len(f["fes"]) for f in raw_frames)
    core = {r["fe_name"] for r in fe.filter(fe.core_type == "Core").collect()}
    assert all(fn.endswith("_0") for fn in core)

    lu = lexunit_index(frames)
    rows = {(r["lexunit"], r["frame"]) for r in lu.collect()}
    assert rows == {
        (l, f["name"]) for f in raw_frames for l in f["lexunit"]
    }
    assert all(r["pos"] == "v" and "." not in r["lemma"] for r in lu.collect())

    got = sorted(
        (r["frame"], r["lexunit"], r["fe_name"], r["start"], r["end"],
         r["fe_text"])
        for r in exemplar_fe_surfaces(ex).collect()
    )
    want = sorted(
        (e["name"], e["lexunit"], sp[2], int(sp[0]), int(sp[1]),
         e["text"][int(sp[0]):int(sp[1])])
        for e in raw_ex
        for sp in e["fe"]
    )
    assert got == want


def test_ntriples_roundtrip_bitexact(spark, tmp_path):
    """N-Triples export -> import roundtrips bit-exactly, including
    terms with spaces, quotes, angle brackets, newlines, '+', '%', and
    non-ASCII; every emitted line is spec-shaped."""
    from pyspark.sql import functions as F

    from deepee_spark.sources.ntriples import (
        read_ntriples,
        to_ntriples,
        write_ntriples,
    )

    rows = [
        ("Attack#http://x/1#0", "Attack:Attacker", "ent one"),
        ('we"ird', "pred<>", "a+b%20c"),
        ("line\nbreak", "tab\there", "ünïcödé 事件"),
        ("plain", "p", "o"),
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    path = str(tmp_path / "nt")
    write_ntriples(df, path)

    # every line matches the N-Triples shape: three IRIs, dot, no raw
    # newline/quote/space inside a term
    for line in [r.line for r in to_ntriples(df).collect()]:
        assert line.endswith(" .")
        parts = line[:-2].split(" ")
        assert len(parts) == 3 and all(
            p.startswith("<urn:deepee:") and p.endswith(">") for p in parts
        )

    back = read_ntriples(spark, path)
    assert {tuple(r) for r in back.collect()} == set(rows)


def test_catalog_writes_bloom_filters_on_key_columns(spark, tmp_path):
    """Snapshots of tables carrying join-key columns embed parquet
    bloom filters (row-group skipping for the point-lookup/anti-join
    paths). Verified by the file-size signature: the bloom-tagged
    write is larger than the identical untagged write by at least one
    filter's worth, and reads back identically."""
    import glob
    import os

    from pyspark.sql import functions as F

    from deepee_spark.sources.tables import StageCatalog

    df = spark.range(5000).coalesce(1).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("v"),
    )
    cat = StageCatalog(str(tmp_path / "cat"))
    cat.write(df, "with_key", "fp")
    cat.write(df.withColumnRenamed("url", "plain"), "no_key", "fp")
    size = lambda t: sum(  # noqa: E731
        os.path.getsize(f)
        for f in glob.glob(str(tmp_path / "cat" / t / "snapshot=0" / "*.parquet"))
    )
    assert size("with_key") > size("no_key") + 50_000
    back = cat.read(spark, "with_key")
    assert back.count() == 5000
    assert back.filter("url = 'u42'").count() == 1
