"""Deterministic synthetic Common-Crawl-style corpus (BASELINE.json input_hint).

Schema: (url string, warc_ts timestamp, html binary, text string, lang string)
— exactly the input hint. ``text`` is the golden extracted text, produced by
running the canonical ``extract.extract_text`` on the generated html, so the
byte-identical invariant holds by construction and is asserted by tests.

Generation is per-doc pure-functional: ``gen_doc(i, seed)`` uses an RNG
seeded by (seed, i) only, so the corpus is identical regardless of
partitioning or order — the property that lets us generate it *inside*
executors with mapInPandas at any scale (bench uses millions of docs
without driver materialization).

Gold annotations (``gen_gold``) are derived from the same per-doc RNG
stream: event sentences are planted from TRIGGER_LEXICON + ENTITY_GAZETTEER
with roles from ROLE_RULE; the gold triple set is what the pipeline must
re-emit at P/R >= 0.95 (BASELINE.md §2).

Skew: entity mentions are Zipf-distributed — 'washington' and 'smith' are
hubs appearing in ~30% of event sentences (exercises salted joins / AQE).
"""

from __future__ import annotations

import datetime as dt
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .extract import extract_text, full_to_half
from .ontology import ENTITY_GAZETTEER, TRIGGER_LEXICON, role_for

SEED = 20260816

_TRIGGERS = sorted(TRIGGER_LEXICON)
_ENTITIES = sorted(ENTITY_GAZETTEER)
# Zipf-ish mention weights: hub entities dominate (head-entity skew).
_ENTITY_WEIGHTS = [
    30 if e in ("washington", "smith") else (8 if e in ("beijing", "microsoft") else 1)
    for e in _ENTITIES
]
_FILLER = (
    "market report shows steady growth across regional sectors this quarter "
    "analysts expect moderate demand while officials review annual figures "
    "weather remains mild and local events continue without much change"
).split()
_ZH_FILLER = "天气晴朗市场平稳数据显示增长缓慢官员表示关注地区发展情况良好"

DOC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

GOLD_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_id", T.IntegerType(), False),
        T.StructField("trigger_pos", T.IntegerType(), False),
        T.StructField("trigger", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("arg_pos", T.IntegerType(), False),
        T.StructField("arg_text", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("role", T.StringType(), False),
    ]
)


def _event_sentence(rng: random.Random) -> tuple[list[str], int, list[tuple[int, str]]]:
    """Build one event sentence: returns (tokens, trigger_pos, [(pos, entity)])."""
    trig = rng.choice(_TRIGGERS)
    n_ents = rng.randint(1, 3)
    ents = []
    while len(ents) < n_ents:
        e = rng.choices(_ENTITIES, weights=_ENTITY_WEIGHTS, k=1)[0]
        if e not in ents and e != trig:
            ents.append(e)
    toks: list[str] = []
    ent_pos: list[tuple[int, str]] = []
    toks += rng.sample(_FILLER, rng.randint(2, 4))
    ent_pos.append((len(toks), ents[0]))
    toks.append(ents[0])
    toks.append(trig)
    tpos = len(toks) - 1
    for e in ents[1:]:
        toks += rng.sample(_FILLER, rng.randint(1, 3))
        ent_pos.append((len(toks), e))
        toks.append(e)
    toks += rng.sample(_FILLER, rng.randint(1, 3))
    return toks, tpos, ent_pos


def _filler_sentence(rng: random.Random) -> list[str]:
    n = rng.randint(6, 14)
    return [rng.choice(_FILLER) for _ in range(n)]


def _infobox_entities(i: int) -> list[str]:
    return [_ENTITIES[i % len(_ENTITIES)], _ENTITIES[(i * 7 + 3) % len(_ENTITIES)]]


def _infobox_html(i: int) -> str:
    """Deterministic entity-attribute infobox on every 4th page — pure
    in i (rng stream untouched, so event gold is unchanged) and
    INVISIBLE to extract_text (tables are not keep-elements), so the
    byte-identical text invariant is unaffected. Harvested by
    operators/webtables.table_triples; gold twin = gen_table_gold."""
    if i % 4 != 0:
        return ""
    rows = "".join(
        f"<tr><td>{e}</td><td>{ENTITY_GAZETTEER[e][0]}</td><td>{i % 30}</td></tr>"
        for e in _infobox_entities(i)
    )
    return (
        '<table class="infobox"><tr><th>entity</th><th>class</th>'
        f"<th>seen</th></tr>{rows}</table>"
    )


def _jsonld_entity(i: int) -> str:
    return _ENTITIES[(i * 11 + 5) % len(_ENTITIES)]


def _jsonld_html(i: int) -> str:
    """Deterministic schema.org JSON-LD block on every 5th page — pure
    in i (rng stream untouched, event gold unchanged) and INVISIBLE to
    extract_text (<script> subtrees are boilerplate-stripped), so the
    byte-identical text invariant holds. @id carries a gazetteer
    surface so the block rides the SAME linking/canonicalization as
    prose arguments and infobox cells. Harvested by
    operators/structured.jsonld_triples; gold twin = gen_jsonld_gold."""
    if i % 5 != 0:
        return ""
    e = _jsonld_entity(i)
    etype, _eid = ENTITY_GAZETTEER[e]
    return (
        '<script type="application/ld+json">'
        f'{{"@context":"https://schema.org","@id":"{e}",'
        f'"cls":"{etype}","rank":{i % 50}}}'
        "</script>"
    )


def gen_jsonld_gold(i: int, seed: int = SEED) -> list[dict]:
    """Gold JSON-LD triples for gen_doc(i): subj = canonical entity id
    (@id surfaces are gazetteer forms, so linking is exact), pred
    namespaced 'ld:'."""
    if i % 5 != 0:
        return []
    rng = random.Random((seed << 20) ^ i)
    r = rng.random()
    lang = "en" if r < 0.70 else ("zh" if r < 0.85 else "other")
    url = f"https://site{i % 97}.example.com/{lang}/page/{i}"
    e = _jsonld_entity(i)
    etype, eid = ENTITY_GAZETTEER[e]
    return [
        {"url": url, "subj": eid, "pred": "ld:cls", "obj": etype},
        {"url": url, "subj": eid, "pred": "ld:rank", "obj": str(i % 50)},
    ]


def gen_table_gold(i: int, seed: int = SEED) -> list[dict]:
    """Gold web-table triples for gen_doc(i): subj = canonical entity id
    (the infobox surfaces are gazetteer forms, so linking is exact and
    canonical == entity id), pred namespaced 'attr:'."""
    if i % 4 != 0:
        return []
    rng = random.Random((seed << 20) ^ i)
    r = rng.random()
    lang = "en" if r < 0.70 else ("zh" if r < 0.85 else "other")
    url = f"https://site{i % 97}.example.com/{lang}/page/{i}"
    out = set()
    for e in _infobox_entities(i):
        etype, eid = ENTITY_GAZETTEER[e]
        out.add((url, eid, "attr:class", etype))
        out.add((url, eid, "attr:seen", str(i % 30)))
    return [
        {"url": u, "subj": s, "pred": p, "obj": o} for u, s, p, o in sorted(out)
    ]


def gen_doc(i: int, seed: int = SEED) -> dict:
    """Pure per-doc generator. Deterministic in (i, seed)."""
    rng = random.Random((seed << 20) ^ i)
    r = rng.random()
    lang = "en" if r < 0.70 else ("zh" if r < 0.85 else "other")
    url = f"https://site{i % 97}.example.com/{lang}/page/{i}"
    ts = dt.datetime(2026, 7, 1) + dt.timedelta(
        days=rng.randint(0, 29), seconds=rng.randint(0, 86399)
    )
    paragraphs: list[str] = []
    if lang == "zh":
        for _ in range(rng.randint(1, 3)):
            chars = [rng.choice(_ZH_FILLER) for _ in range(rng.randint(8, 20))]
            paragraphs.append("".join(chars) + "。")
    elif lang == "other":
        for _ in range(rng.randint(1, 2)):
            paragraphs.append(" ".join(rng.sample(_FILLER, rng.randint(4, 8))) + ".")
    else:
        n_sent = rng.randint(2, 6)
        sents = []
        for _ in range(n_sent):
            if rng.random() < 0.6:
                toks, _, _ = _event_sentence(rng)
            else:
                toks = _filler_sentence(rng)
            sents.append(" ".join(toks) + ".")
        # group sentences into 1-2 paragraphs
        cut = rng.randint(1, len(sents))
        paragraphs = [" ".join(sents[:cut])]
        if cut < len(sents):
            paragraphs.append(" ".join(sents[cut:]))

    # occasional entity/full-width noise the extractor must normalize (SC5):
    # html carries the raw form; golden text comes from extract_text(html).
    deco = rng.random()
    body_parts = []
    for p in paragraphs:
        shown = p
        if deco < 0.15:
            shown = p.replace(" a", " &#97;", 1)  # html entity round-trip
        elif deco < 0.25 and lang == "zh":
            shown = p + "ＡＢ１２３"  # full-width chars -> half-width in text
        body_parts.append(f"<p>{shown}</p>")
    html = (
        "<html><head><title>synthetic</title>"
        "<style>body{margin:0}</style>" + _jsonld_html(i) + "</head>"
        # deterministic outlinks (pure in i — rng stream untouched so
        # text/gold fixtures are unchanged): one cross-site absolute,
        # one root-relative; nav is boilerplate-stripped by extract_text
        # but harvested by operators/links.extract_outlinks
        f"<nav><a href='/'>home</a> | <a href='/about'>about</a> | "
        f"<a href='https://site{(i * 7 + 1) % 97}.example.com/en/page/{i * 3 + 1}'>ref {i}</a> | "
        f"<a href='/{lang}/page/{i + 1}'>next</a></nav>"
        "<body>"
        f"<h1>doc {i}</h1>" + "".join(body_parts) + _infobox_html(i) + "</body>"
        "<footer>&copy; 2026 synthetic corp</footer></html>"
    ).encode("utf-8")
    text = extract_text(html)
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def gen_gold(i: int, seed: int = SEED) -> list[dict]:
    """Replay gen_doc's RNG stream to emit gold (event, argument) rows.

    MUST mirror gen_doc's draw order exactly. Positions are token offsets
    within the *segmented* sentence (segment.py tokenization: lowercase
    word split — our tokens are already lowercase single words, and the
    leading <h1> heading is a separate element so paragraph sentence ids
    line up with en sentence splitting on '. ' boundaries).
    """
    rng = random.Random((seed << 20) ^ i)
    r = rng.random()
    lang = "en" if r < 0.70 else ("zh" if r < 0.85 else "other")
    url = f"https://site{i % 97}.example.com/{lang}/page/{i}"
    rng.randint(0, 29), rng.randint(0, 86399)
    if lang != "en":
        return []
    out: list[dict] = []
    n_sent = rng.randint(2, 6)
    # sentence ids in the sentences table: heading "doc i" is sentence 0?
    # "doc {i}." — heading has no final '.', so split keeps it glued to the
    # first paragraph sentence? No: heading is its own extracted paragraph
    # line, but sentences_stage splits the whole text on [.!?]\s+ —
    # paragraphs are '\n'-joined, so 'doc 3\npar1sent1.' has no boundary
    # between heading and first sentence; the heading tokens prepend to
    # sentence 0. We account for that in trigger/arg positions? No:
    # positions below are *relative sentence-internal*; the pipeline eval
    # joins on (url, trigger word, event_type, arg, role) tuples, not
    # absolute offsets, so heading-offset drift does not affect triples.
    sid = 0
    for _ in range(n_sent):
        if rng.random() < 0.6:
            toks, tpos, ent_pos = _event_sentence(rng)
            etype = TRIGGER_LEXICON[toks[tpos]]
            for pos, ent in ent_pos:
                ent_type, ent_id = ENTITY_GAZETTEER[ent]
                out.append(
                    {
                        "url": url,
                        "sent_id": sid,
                        "trigger_pos": tpos,
                        "trigger": toks[tpos],
                        "event_type": etype,
                        "arg_pos": pos,
                        "arg_text": ent,
                        "entity_type": ent_type,
                        "entity_id": ent_id,
                        "role": role_for(etype, ent_type),
                    }
                )
        else:
            _filler_sentence(rng)
        sid += 1
    return out


def corpus_df(spark: SparkSession, n_docs: int, seed: int = SEED) -> DataFrame:
    """Distributed corpus generation: spark.range -> mapInPandas(gen_doc)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [gen_doc(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows)

    parts = max(4, min(256, n_docs // 2000 + 1))
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        run, schema=DOC_SCHEMA
    )


def gold_df(spark: SparkSession, n_docs: int, seed: int = SEED) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for i in pdf["id"] for r in gen_gold(int(i), seed)]
            yield pd.DataFrame(rows, columns=[f.name for f in GOLD_EVENT_SCHEMA])

    parts = max(4, min(256, n_docs // 2000 + 1))
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        run, schema=GOLD_EVENT_SCHEMA
    )


GOLD_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
    ]
)


def gold_table_triples_df(
    spark: SparkSession, n_docs: int, seed: int = SEED
) -> DataFrame:
    """Gold web-table (subj, pred, obj) rows (gen_table_gold twin of
    the infobox planted by gen_doc)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for i in pdf["id"] for r in gen_table_gold(int(i), seed)]
            yield pd.DataFrame(rows, columns=[f.name for f in GOLD_TABLE_SCHEMA])

    parts = max(4, min(256, n_docs // 2000 + 1))
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        run, schema=GOLD_TABLE_SCHEMA
    )


def gold_jsonld_triples_df(
    spark: SparkSession, n_docs: int, seed: int = SEED
) -> DataFrame:
    """Gold JSON-LD (subj, pred, obj) rows (gen_jsonld_gold twin of the
    ld+json block planted by gen_doc)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [r for i in pdf["id"] for r in gen_jsonld_gold(int(i), seed)]
            yield pd.DataFrame(rows, columns=[f.name for f in GOLD_TABLE_SCHEMA])

    parts = max(4, min(256, n_docs // 2000 + 1))
    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(
        run, schema=GOLD_TABLE_SCHEMA
    )


def gold_triples_df(spark: SparkSession, n_docs: int, seed: int = SEED) -> DataFrame:
    """Gold (subj, pred, obj) per FIXTURES.md §8: event triples (subj =
    event-instance id, pred = 'EventType:Role', obj = canonical entity
    id) UNION web-table attribute triples (subj = canonical entity id,
    pred = 'attr:<header>') UNION JSON-LD structured-data triples
    (pred 'ld:<key>') — the full set the pipeline must re-emit."""
    g = gold_df(spark, n_docs, seed)
    events = g.select(
        "url",
        F.concat_ws(
            "#", F.col("event_type"), F.col("url"), F.col("sent_id").cast("string")
        ).alias("subj"),
        F.concat_ws(":", "event_type", "role").alias("pred"),
        F.col("entity_id").alias("obj"),
    ).distinct()
    return events.unionByName(
        gold_table_triples_df(spark, n_docs, seed)
    ).unionByName(gold_jsonld_triples_df(spark, n_docs, seed))
