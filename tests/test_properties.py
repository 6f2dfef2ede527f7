"""Property-based tests (hypothesis) for the row-local algebra.

Strategy: each hypothesis example is a BATCH of random inputs loaded as
ONE DataFrame, the Spark operator runs once over the batch, and every
row is checked against an independent pure-python oracle. This keeps
job count at max_examples (Spark jobs are ~1s each) while the row count
per example carries the case diversity.

Covers the invariants unit fixtures can't enumerate:
  * IOB -> IOBES -> IOB roundtrips for EVERY valid tag sequence (SC2)
  * bio_merge_spans / spans_to_bio are mutual inverses on valid BIO (SC3/SC18)
  * wordpiece alignment maps are mutually consistent for arbitrary text (SC7/SC8)
  * the two-level bucketed prefix sum equals the single global window
    (the S4/F4 scale pattern) on arbitrary 0/1 streams
"""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

TYPES = ["PER", "ORG", "LOC"]


@st.composite
def valid_iob_seq(draw):
    """Random VALID IOB2 sequence: I-X only continues B-X/I-X."""
    n = draw(st.integers(min_value=1, max_value=12))
    tags, prev_type = [], None
    for _ in range(n):
        choices = ["O"] + [f"B-{t}" for t in TYPES]
        if prev_type is not None:
            choices.append(f"I-{prev_type}")
        tag = draw(st.sampled_from(choices))
        tags.append(tag)
        prev_type = tag[2:] if tag != "O" else None
    return tags


def _py_iob_to_iobes(tags: list[str]) -> list[str]:
    out = []
    for i, t in enumerate(tags):
        if t == "O":
            out.append(t)
            continue
        typ = t[2:]
        nxt = tags[i + 1] if i + 1 < len(tags) else "O"
        cont = nxt == f"I-{typ}"
        if t.startswith("B-"):
            out.append(f"B-{typ}" if cont else f"S-{typ}")
        else:
            out.append(f"I-{typ}" if cont else f"E-{typ}")
    return out


def _py_spans(tags: list[str]) -> list[tuple[int, int, str]]:
    spans, start = [], None
    for i, t in enumerate(tags):
        if start is not None and not (
            t.startswith("I-") and t[2:] == tags[start][2:]
        ):
            spans.append((start, i, tags[start][2:]))
            start = None
        if t.startswith("B-"):
            start = i
    if start is not None:
        spans.append((start, len(tags), tags[start][2:]))
    return spans


@settings(**SETTINGS)
@given(st.lists(valid_iob_seq(), min_size=8, max_size=40))
def test_iob_iobes_roundtrip_property(spark, seqs):
    from deepee_spark.operators.bio import (
        iob2_valid,
        iob_to_iobes,
        iobes_to_iob,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], ["i", "tags"]
    )
    out = df.select(
        "i",
        iob2_valid("tags").alias("valid"),
        iob_to_iobes("tags").alias("iobes"),
        iobes_to_iob(iob_to_iobes("tags")).alias("round"),
    ).collect()
    by_i = {r["i"]: r for r in out}
    for i, s in enumerate(seqs):
        r = by_i[i]
        assert r["valid"], (s, "generator must only emit valid IOB2")
        assert list(r["iobes"]) == _py_iob_to_iobes(s), s
        assert list(r["round"]) == s, (s, list(r["iobes"]))


@settings(**SETTINGS)
@given(st.lists(valid_iob_seq(), min_size=8, max_size=40))
def test_bio_span_merge_expand_inverse_property(spark, seqs):
    from deepee_spark.operators.bio import bio_merge_spans, spans_to_bio

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)], ["i", "tags"]
    )
    out = df.select(
        "i",
        bio_merge_spans("tags").alias("spans"),
        spans_to_bio(bio_merge_spans("tags"), F.size("tags")).alias("round"),
    ).collect()
    by_i = {r["i"]: r for r in out}
    for i, s in enumerate(seqs):
        r = by_i[i]
        got = [(sp["start"], sp["end"], sp["etype"]) for sp in r["spans"]]
        assert got == _py_spans(s), s
        assert list(r["round"]) == s, s


TEXT_ALPHABET = string.ascii_letters + string.digits + " ,.!-'é中"


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet=TEXT_ALPHABET, min_size=0, max_size=60),
        min_size=8,
        max_size=40,
    )
)
def test_wordpiece_alignment_property(spark, texts):
    """For ANY text: sub_tokens reassemble per-orig-token, and the two
    alignment maps are mutual inverses (orig_to_tok[t2o[j]] <= j and
    t2o[orig_to_tok[i]] == i)."""
    from deepee_spark.functions.wordpiece import (
        basic_tokenize,
        default_vocab,
        full_tokenize,
        tokenize_column,
    )

    vocab = default_vocab()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "text"]
    )
    rows = df.select(
        "i", tokenize_column(F.col("text"), vocab).alias("tk")
    ).collect()
    by_i = {r["i"]: r["tk"] for r in rows}
    for i, text in enumerate(texts):
        tk = by_i[i]
        want = full_tokenize(text, set(vocab))
        assert list(tk["orig_tokens"]) == basic_tokenize(text)
        assert list(tk["sub_tokens"]) == want["sub_tokens"]
        o2t = list(tk["orig_to_tok"])
        t2o = list(tk["tok_to_orig"])
        assert len(t2o) == len(tk["sub_tokens"])
        assert len(o2t) == len(tk["orig_tokens"])
        for oi, tj in enumerate(o2t):
            assert t2o[tj] == oi  # first-subtoken map round-trips
        for tj, oi in enumerate(t2o):
            assert o2t[oi] <= tj  # every subtoken maps into its token's run


@settings(**SETTINGS)
@given(
    st.lists(st.integers(min_value=0, max_value=1), min_size=1, max_size=400),
    st.integers(min_value=1, max_value=7),
)
def test_two_level_prefix_sum_property(spark, bits, bucket_size):
    """The bucketed two-level running sum (S4/F4 scale pattern: per-bucket
    prefix + prefix over bucket totals) must equal the global
    single-window prefix sum for any 0/1 stream and any bucket size."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(bits)], ["line_id", "blank"]
    ).withColumn("bucket", F.floor(F.col("line_id") / bucket_size))
    inner = F.coalesce(
        F.sum("blank").over(
            W.partitionBy("bucket")
            .orderBy("line_id")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    totals = df.groupBy("bucket").agg(F.sum("blank").alias("bt"))
    prefix = totals.select(
        "bucket",
        F.coalesce(
            F.sum("bt").over(
                W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("bp"),
    )
    got = {
        r["line_id"]: r["ps"]
        for r in df.withColumn("ip", inner)
        .join(prefix, "bucket")
        .select("line_id", (F.col("bp") + F.col("ip")).alias("ps"))
        .collect()
    }
    run = 0
    for i, b in enumerate(bits):
        assert got[i] == run, (i, bucket_size)
        run += b


@st.composite
def messy_url(draw):
    """Random URL assembled from canonicalization-relevant noise parts."""
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HttPs"]))
    host = draw(
        st.text(alphabet=string.ascii_letters + string.digits + "-.",
                min_size=1, max_size=12).filter(
            lambda h: h.strip(".-") == h and h != "")
    )
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(
        st.text(alphabet=string.ascii_letters + string.digits + "_%-",
                min_size=1, max_size=6),
        max_size=3))
    path = "".join("/" + s for s in segs)
    slash = draw(st.sampled_from(["", "/"])) if path else ""
    params = draw(st.lists(st.sampled_from(
        ["id=1", "q=x", "utm_source=a", "utm_medium=b", "fbclid=z",
         "ref=tw", "page=2"]), max_size=3))
    query = ("?" + "&".join(params)) if params else ""
    frag = draw(st.sampled_from(["", "#top", "#a/b?c"]))
    return f"{scheme}://{host}{port}{path}{slash}{query}{frag}"


@settings(**SETTINGS)
@given(st.lists(messy_url(), min_size=5, max_size=60))
def test_canonical_url_idempotent_property(spark, urls):
    """canonical(canonical(u)) == canonical(u) for arbitrary messy URLs
    — the invariant that catches rule-interaction bugs (a pass that
    re-exposes noise another pass already handled), and host_of is
    invariant under canonicalization."""
    from deepee_spark.operators.urls import canonical_url, host_of

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    rows = df.select(
        "url",
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
        host_of(F.col("url")).alias("h0"),
        host_of(canonical_url(F.col("url"))).alias("h1"),
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], (r["url"], r["c1"], r["c2"])
        assert r["h0"] == r["h1"], r["url"]
        # canonicalization never reintroduces noise it strips
        assert "#" not in r["c1"]
        assert "utm_" not in r["c1"] and "fbclid" not in r["c1"]
        assert not r["c1"].endswith("?")


@settings(**SETTINGS)
@given(st.lists(
    st.text(alphabet=string.printable, max_size=80), min_size=5,
    max_size=60))
def test_pii_redaction_idempotent_property(spark, texts):
    """Redacting already-redacted text is the identity (placeholder
    tokens contain nothing the detectors match), for arbitrary text."""
    from deepee_spark.operators.pii import redact

    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        redact(F.col("text")).alias("r1"),
        redact(redact(F.col("text"))).alias("r2"),
    ).collect()
    for r in rows:
        assert r["r1"] == r["r2"]


@given(
    st.lists(
        st.integers(min_value=0, max_value=900),
        min_size=1, max_size=120,
    ),
    st.integers(min_value=64, max_value=1024),
)
@settings(**SETTINGS)
def test_pack_sequences_matches_python_oracle(spark, toks, budget):
    """Packing == the pure-python per-shard exclusive-cumsum oracle for
    arbitrary token counts and budgets, and every doc lands in exactly
    one bin."""
    from deepee_spark.operators.dedup import MOD
    from deepee_spark.operators.packing import pack_sequences
    from deepee_spark.operators.sampling import DIFFUSION

    rows = [(i, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    got = {
        r["doc_id"]: (r["shard"], r["bin"])
        for r in pack_sequences(df, budget=budget, n_shards=4).collect()
    }

    def py_hash(s: str) -> int:
        h = 0
        for c in s:
            h = (h * 31 + ord(c)) % MOD
        return h

    shards: dict[int, list[tuple[int, int]]] = {}
    for i, t in rows:
        shards.setdefault(py_hash(str(i)) * DIFFUSION % MOD % 4, []).append((i, t))
    want = {}
    for shard, members in shards.items():
        cum = 0
        for i, t in sorted(members):
            want[i] = (shard, cum // budget)
            cum += t
    assert got == want


@given(
    st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0, max_size=14,
        ),
        min_size=2, max_size=12,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(**SETTINGS)
def test_contamination_matches_python_oracle(spark, docs_toks, n):
    """n-gram contamination == a pure-python set-overlap oracle for
    arbitrary small-vocab docs (doc 0 is the eval set): sub-n docs never
    flag, hit counts are distinct-gram counts."""
    from deepee_spark.operators.contamination import ngram_contamination

    rows = [(i, " ".join(t)) for i, t in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    eval_docs = df.filter("doc_id = 0")
    train = df.filter("doc_id <> 0")
    got = {
        r["doc_id"]: r["n_hits"]
        for r in ngram_contamination(train, eval_docs, n=n).collect()
    }

    def grams(toks):
        return {
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        }

    eval_grams = grams(docs_toks[0])
    want = {}
    for i, toks in enumerate(docs_toks):
        if i == 0:
            continue
        hits = grams(toks) & eval_grams
        if hits:
            want[i] = len(hits)
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(
                    codec="utf-8", exclude_categories=("Cs",)
                ),
                max_size=400,
            ),
            st.sampled_from(["en", "zh", "de", "xx", ""]),
        ),
        min_size=1, max_size=8,
    )
)
@settings(**SETTINGS)
def test_pipeline_prefix_survives_arbitrary_html(spark, docs):
    """Robustness: ANY byte content as html (raw unicode, no structure,
    control chars, RTL, emoji) must flow documents->sentences->arguments
    without crashing, with stable schemas and the extraction invariant
    (extract_text == the distributed column) intact."""
    import datetime

    from deepee_spark.corpus import DOC_SCHEMA
    from deepee_spark.extract import documents_stage, extract_text
    from deepee_spark.functions.featurize import featurize_sentences
    from deepee_spark.plans.pipeline import (
        arguments_from_triggers,
        triggers_from_sentences,
    )
    from deepee_spark.segment import sentences_stage

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (f"https://fuzz/{i}", ts,
         ("<body><p>" + body + "</p></body>").encode("utf-8"), "", lang)
        for i, (body, lang) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    extracted = documents_stage(df)
    got = {r["url"]: r["text"] for r in extracted.collect()}
    for url, _, html, _, _ in rows:
        assert got[url] == extract_text(html)  # byte-identical invariant

    args = arguments_from_triggers(
        triggers_from_sentences(
            featurize_sentences(sentences_stage(extracted))
        )
    )
    # no crash, schema stable, row values well-formed
    out = args.collect()
    assert {"url", "sent_id", "arg_pos", "surface"}.issubset(
        set(args.columns)
    )
    for r in out:
        assert r["url"].startswith("https://fuzz/")


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=60),
        min_size=1,
        max_size=12,
    )
)
def test_substring_dedup_property(spark, texts):
    """Arbitrary tiny-alphabet corpora (maximally collision-prone:
    w-windows repeat constantly) against the pure-python keep-first
    oracle — stats and merged spans both."""
    from deepee_spark.operators.substrings import (
        substring_dup_spans,
        substring_dup_stats,
    )
    from tests.test_substrings import _brute

    w = 3
    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    n_windows, removable = _brute(docs, w)

    per_doc = {}
    for doc_id, _, _ in removable:
        per_doc[doc_id] = per_doc.get(doc_id, 0) + 1
    got_stats = {
        (r.id, r.n_windows, r.n_dup_windows)
        for r in substring_dup_stats(df, "doc_id", "text", w).collect()
    }
    exp_stats = {
        (d, n_windows[d], per_doc.get(d, 0)) for d, _ in docs
    }
    assert got_stats == exp_stats

    poss = {}
    for doc_id, pos, _ in removable:
        poss.setdefault(doc_id, []).append(pos)
    exp_spans = set()
    for doc_id, ps in poss.items():
        ps.sort()
        start, end = ps[0], ps[0] + w - 1
        for p in ps[1:]:
            if p <= end + 1:
                end = p + w - 1
            else:
                exp_spans.add((doc_id, start, end))
                start, end = p, p + w - 1
        exp_spans.add((doc_id, start, end))
    got_spans = {
        (r.id, r.start_pos, r.end_pos)
        for r in substring_dup_spans(df, "doc_id", "text", w).collect()
    }
    assert got_spans == exp_spans


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_sessionize_property(spark, pairs):
    """Arbitrary (key, ts) multisets with heavy ts collisions vs the
    brute-force session splitter."""
    from deepee_spark.operators.temporal import sessionize
    from tests.test_temporal import _brute_sessions

    rows = [(f"k{k}", ts) for k, ts in pairs]
    df = spark.createDataFrame(rows, "user: string, ts: long")
    got = {
        (r.user, r.session_seq, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, ["user"], "ts", gap=5).collect()
    }
    assert got == _brute_sessions(rows, 5)


@settings(**SETTINGS)
@given(
    st.lists(
        st.lists(
            st.sampled_from(
                ["www", "a", "b", "site", "x", "ck", "uk", "co", "io",
                 "gov", "github", "com", "wat"]
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_psl_property(spark, label_lists):
    """apply_psl on arbitrary hosts assembled from rule-colliding labels
    (apex hits, wildcard tails, exception hosts all arise by chance)
    must match the pure-python PSL reference row for row."""
    from deepee_spark.operators.domains import apply_psl
    from tests.test_domains import RULES, _psl_py

    hosts = sorted({".".join(ls) for ls in label_lists})
    df = spark.createDataFrame([(h,) for h in hosts], "host: string")
    rules = spark.createDataFrame([(r,) for r in RULES], "rule: string")
    got = {
        r.host: (r.public_suffix, r.registrable_domain)
        for r in apply_psl(df, rules).collect()
    }
    assert got == {h: _psl_py(h, RULES) for h in hosts}


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_wl_rename_invariance(spark, raw_edges):
    """WL fingerprints are STRUCTURAL: renaming every node (an
    order-scrambling bijection) must map each node's fingerprint to its
    renamed twin's fingerprint."""
    from deepee_spark.operators.graph import wl_fingerprints

    edges = sorted({(a, b) for a, b in raw_edges if a != b})
    if not edges:
        return
    ren = {v: f"z{99 - v}" for v in range(12)}  # reverses sort order
    e1 = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src: string, dst: string"
    )
    e2 = spark.createDataFrame(
        [(ren[a], ren[b]) for a, b in edges], "src: string, dst: string"
    )
    fp1 = {r.node: r.wl for r in wl_fingerprints(e1, iters=2).collect()}
    fp2 = {r.node: r.wl for r in wl_fingerprints(e2, iters=2).collect()}
    nodes = {a for a, _ in edges} | {b for _, b in edges}
    assert all(fp1[f"n{v}"] == fp2[ren[v]] for v in nodes)


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
            st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_bpe_segment_reassembles(spark, words, merges):
    """Applying ANY merge table to ANY corpus must yield pieces that
    reassemble each word exactly (no symbol lost or duplicated by the
    greedy fold), with every piece buildable from the merge table."""
    from deepee_spark.operators.bpe import segment_words

    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    got = {
        r.word: list(r.pieces)
        for r in segment_words(docs, merges).collect()
    }
    assert set(got) == set(words)
    for w, pieces in got.items():
        assert "".join(pieces) == w
