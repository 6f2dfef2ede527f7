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


def test_hash_sample_deterministic_and_unbiased(spark):
    from deepee_spark.operators.sampling import hash_sample, sample_bucket

    df = spark.range(2000).select(F.col("id").alias("doc_id"))
    out1 = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 200).collect())
    out2 = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 200).collect())
    assert out1 == out2                      # reproducible across runs
    assert 0.15 < len(out1) / 2000 < 0.25    # ~20% with diffusion
    # nested rates: a 100-permille sample is a subset of the 200 one
    out_small = {r["doc_id"] for r in hash_sample(df, "doc_id", 100).collect()}
    assert out_small <= set(out1)
    # a pure filter: no Exchange in the plan
    plan = hash_sample(df, "doc_id", 200)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_stratified_sample_rates_and_default(spark):
    from deepee_spark.operators.sampling import stratified_sample

    df = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "zh")
        .otherwise("de")
        .alias("lang"),
    )
    rates = spark.createDataFrame(
        [("en", 500), ("zh", 100)], ["stratum", "permille"]
    )
    out = stratified_sample(df, "doc_id", "lang", rates, default_permille=0)
    got = {lang: 0 for lang in ("en", "zh", "de")}
    for r in out.collect():
        got[r["lang"]] += 1
        assert r["sample_bucket"] < (500 if r["lang"] == "en" else 100)
    assert 0.4 < got["en"] / 1000 < 0.6
    assert 0.05 < got["zh"] / 1000 < 0.15
    assert got["de"] == 0                    # default 0: unlisted dropped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_doc_frequency_idf(spark):
    import math

    from deepee_spark.operators.textstats import doc_frequency

    docs = [
        (0, "alpha beta beta gamma"),
        (1, "alpha gamma"),
        (2, "alpha delta"),
        (3, "epsilon"),
    ]
    out = {
        r["token"]: r
        for r in doc_frequency(
            spark.createDataFrame(docs, ["doc_id", "text"]), min_df=2
        ).collect()
    }
    # beta appears twice in one doc -> df counts docs, not occurrences
    assert set(out) == {"alpha", "gamma"}
    assert out["alpha"]["df"] == 3 and out["gamma"]["df"] == 2
    assert out["alpha"]["idf"] == round(math.log(4 / 3), 6)
    assert out["gamma"]["idf"] == round(math.log(4 / 2), 6)


def test_unigram_logprob_hand_computed(spark):
    import math

    from deepee_spark.operators.textstats import unigram_logprob

    # corpus: 6 tokens total; p(a)=3/6, p(b)=2/6, p(c)=1/6
    docs = [(0, "a a b"), (1, "a b c")]
    out = {
        r["doc_id"]: r
        for r in unigram_logprob(
            spark.createDataFrame(docs, ["doc_id", "text"])
        ).collect()
    }
    lp = {t: math.log(n / 6) for t, n in {"a": 3, "b": 2, "c": 1}.items()}
    assert out[0]["n_tokens"] == 3
    assert out[0]["mean_logp"] == round((2 * lp["a"] + lp["b"]) / 3, 6)
    assert out[1]["mean_logp"] == round((lp["a"] + lp["b"] + lp["c"]) / 3, 6)
    # common-token doc scores higher than rare-token doc
    assert out[0]["mean_logp"] > out[1]["mean_logp"]


def test_curation_funnel_monotone_and_consistent(spark):
    from deepee_spark.plans.curation import curate, curation_funnel

    rows = []
    for i in range(40):
        if i % 4 == 0:
            text = "spam spam spam spam spam spam"        # repetition-reject
        elif i % 4 == 1:
            text = "the quick brown fox jumps over a lazy dog near the river"
        elif i % 4 == 2:
            text = "shared duplicate body of the document with many words in it"
        else:
            text = f"unique document {i} with the usual assortment of words in it"
        rows.append((i, text, "en" if i % 2 == 0 else "de"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    rates = spark.createDataFrame([("en", 800)], ["stratum", "permille"])

    stages = curate(docs, rates, quality_min=0.0, default_permille=500)
    frows = curation_funnel(
        docs, rates, quality_min=0.0, default_permille=500
    ).collect()
    funnel = {r["stage"]: r["n_rows"] for r in frows}
    # stage_idx orders the funnel regardless of union output order
    assert sorted((r["stage_idx"], r["stage"]) for r in frows) == [
        (0, "input"), (1, "quality"), (2, "repetition"),
        (3, "exact_dedup"), (4, "sample"),
    ]
    counts = [funnel[s] for s in ("input", "quality", "repetition",
                                  "exact_dedup", "sample")]
    assert counts[0] == 40
    assert all(a >= b for a, b in zip(counts, counts[1:]))  # monotone
    # funnel counts agree with the stage DataFrames
    for name, df in stages.items():
        assert df.count() == funnel[name], name
    # spam docs die at repetition; the two shared-duplicate groups each
    # collapse to one survivor at exact_dedup
    assert funnel["repetition"] == 30
    reps = {r["doc_id"] for r in stages["repetition"].select("doc_id").collect()}
    assert all(i % 4 != 0 for i in reps)
    assert funnel["exact_dedup"] == 2 + 10  # 1 fox + 1 shared + 10 unique
    # sample is a subset of dedup survivors
    ded = {r["doc_id"] for r in stages["exact_dedup"].select("doc_id").collect()}
    samp = {r["doc_id"] for r in stages["sample"].select("doc_id").collect()}
    assert samp <= ded


def test_loss_reductions_vs_numpy(spark):
    import numpy as np

    from deepee_spark.operators.metrics import loss_reductions

    rng = np.random.default_rng(7)
    logits = rng.normal(size=(200, 5)).round(3)
    labels = rng.integers(0, 5, size=200)
    df = spark.createDataFrame(
        [(row.tolist(), int(l)) for row, l in zip(logits, labels)],
        ["logits", "label"],
    )
    got = loss_reductions(df).collect()[0]
    mx = logits.max(axis=1, keepdims=True)
    ce = (np.log(np.exp(logits - mx).sum(axis=1)) + mx[:, 0]
          - logits[np.arange(200), labels])
    assert got["n_examples"] == 200
    assert got["mean_loss"] == round(float(ce.mean()), 6)
    assert got["sum_loss"] == round(float(ce.sum()), 6)


def test_epoch_shuffle_reproducible_and_seed_sensitive(spark, tmp_path):
    from deepee_spark.operators.shuffle import epoch_shuffle

    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    e1 = epoch_shuffle(docs, "doc_id", seed=7, n_shards=8)
    e1b = epoch_shuffle(docs, "doc_id", seed=7, n_shards=8)
    e2 = epoch_shuffle(docs, "doc_id", seed=8, n_shards=8)
    r1 = {r["doc_id"]: (r["epoch_pos"], r["shard"]) for r in e1.collect()}
    r1b = {r["doc_id"]: (r["epoch_pos"], r["shard"]) for r in e1b.collect()}
    r2 = {r["doc_id"]: (r["epoch_pos"], r["shard"]) for r in e2.collect()}
    assert r1 == r1b                              # reproducible
    assert sum(r1[i] != r2[i] for i in r1) > 450  # seed reshuffles
    assert all(pos % 8 == shard for pos, shard in r1.values())
    # every shard populated, roughly balanced
    from collections import Counter
    c = Counter(s for _, s in r1.values())
    assert len(c) == 8 and max(c.values()) < 3 * min(c.values())
    # the scalable write path: shard files internally sorted, no
    # global sort in the plan
    out = str(tmp_path / "epoch")
    # leading 'shard' satisfies the partitioned write's required
    # ordering, so the writer does NOT insert its own shard-only sort
    # (which would destroy the epoch_pos order inside each shard)
    writer_df = e1.repartition("shard").sortWithinPartitions(
        "shard", "epoch_pos")
    plan = writer_df._jdf.queryExecution().executedPlan().toString()
    sort_lines = [ln for ln in plan.splitlines()
                  if "Sort [" in ln and "epoch_pos" in ln]
    # 'Sort [cols], <global>, 0' — must be a LOCAL sort (global=false)
    assert sort_lines and all("], false, 0" in ln for ln in sort_lines), plan
    writer_df.write.partitionBy("shard").parquet(out)
    one = spark.read.parquet(out + "/shard=0").select("epoch_pos").collect()
    vals = [r["epoch_pos"] for r in one]
    assert vals == sorted(vals)


def test_selector_weights_vs_numpy(spark):
    import numpy as np

    from deepee_spark.operators.selector import selector_weights

    rng = np.random.default_rng(11)
    scores = rng.uniform(0.05, 1.0, size=300).round(4)
    df = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)], ["doc_id", "score"]
    )
    out = {r["doc_id"]: r["weight"]
           for r in selector_weights(df, alpha=2.0).collect()}
    t = scores ** 2.0
    w = np.exp(t - t.max())
    w = w / w.sum()
    for i in range(300):
        assert out[i] == round(float(w[i]), 9), i
    assert abs(sum(out.values()) - 1.0) < 1e-6
    # sharpening: higher score -> strictly higher weight
    hi, lo = int(scores.argmax()), int(scores.argmin())
    assert out[hi] > out[lo]


def test_run_curation_durable_resume(spark, catalog):
    from deepee_spark.plans.curation import curate, run_curation

    rows = [
        (i,
         "spam spam spam spam spam spam" if i % 5 == 0
         else f"document {i} body with the usual words in it and more",
         "en")
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    rates = spark.createDataFrame([("en", 700)], ["stratum", "permille"])

    out1, st1 = run_curation(docs, rates, catalog, "t:50",
                             quality_min=0.0, resume=True)
    assert set(st1.values()) == {"ran"}
    n1 = out1.count()
    # same counts as the non-durable funnel
    plain = curate(docs, rates, quality_min=0.0, default_permille=200)
    assert n1 == plain["sample"].count()

    # second run: every stage current -> all skipped, same output
    out2, st2 = run_curation(docs, rates, catalog, "t:50",
                             quality_min=0.0, resume=True)
    assert set(st2.values()) == {"skipped"}
    assert out2.count() == n1
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())  # noqa: E731
    assert ids(out1) == ids(out2)

    # changed input fingerprint -> stages rerun
    _, st3 = run_curation(docs, rates, catalog, "t:50-v2",
                          quality_min=0.0, resume=True)
    assert set(st3.values()) == {"ran"}


def test_ngram_contamination_flags_shared_grams(spark):
    """A training doc sharing an 8-gram with the eval set is flagged
    with the distinct-overlap count; clean docs and sub-n docs are not."""
    from deepee_spark.operators.contamination import ngram_contamination

    bench = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, "intro text " + bench + " trailing words here"),   # 1 window? no — several
        (2, "The QUICK brown fox jumps over the lazy dog"),    # case-folded hit
        (3, "completely unrelated content with many words that overlap nothing at all"),
        (4, "short doc"),                                      # < n tokens
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    eval_docs = spark.createDataFrame([(99, bench)], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_hits"]
           for r in ngram_contamination(docs, eval_docs).collect()}
    # bench has 10 tokens -> 3 distinct 8-grams; doc 1 contains all of
    # bench so hits all 3; doc 2 contains tokens 1..9 -> grams 1-2
    assert got == {1: 3, 2: 2}


def test_pack_sequences_budget_and_determinism(spark):
    """Bins fill greedily per shard: totals stay under budget + the
    straddling doc, assignment is stable across runs, and docs are
    never split."""
    from deepee_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 150) for i in range(200)],
        ["doc_id", "n_tokens"],
    )
    out = pack_sequences(docs, budget=512, n_shards=4).collect()
    assert len(out) == 200  # every doc assigned exactly once

    by_bin: dict = {}
    for r in out:
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    max_tok = max(r["n_tokens"] for r in out)
    for (shard, b), rows in by_bin.items():
        tot = sum(r["n_tokens"] for r in rows)
        # a bin exceeds the budget only by its straddling last doc
        assert tot < 512 + max_tok
    # bins within a shard are contiguous from 0
    for shard in {r["shard"] for r in out}:
        bins = sorted({r["bin"] for r in out if r["shard"] == shard})
        assert bins == list(range(len(bins)))

    again = pack_sequences(docs, budget=512, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
