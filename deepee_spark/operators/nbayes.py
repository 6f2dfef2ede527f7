"""Naive-Bayes text classifier — closed-form quality/domain filtering.

The classic web-corpus curation step (the GPT-3 / CCNet line filters
pages with a lightweight classifier trained on 'good' seeds vs crawl
background). Logistic regression / fastText need iterative training;
multinomial Naive Bayes with add-one smoothing is the CLOSED-FORM
member of the family — training is one groupBy over token counts, so
it fits a declarative engine exactly and retrains per crawl drop for
free.

Model (standard multinomial NB, public textbook formulation):
    logp(token | label)  = ln( (cnt(token,label) + 1) / (N_label + V) )
    logp_oov(label)      = ln( 1 / (N_label + V) )          (cnt = 0)
    prior(label)         = ln( docs_label / docs_total )
    score(doc, label)    = prior + Σ_tokens logp(token | label)

Scoring joins the corpus token stream against the broadcast model per
label and coalesces misses to the OOV floor — one shuffle (the
per-doc-per-label sum). ``log_odds`` emits the binary decision value
(score_pos - score_neg): > 0 keeps the page.

Floats: scores are double log-sums; engines may sum in different
orders, so consumers (and the oracle) compare at ROUND(.., 6) — the
documented tolerance everywhere this repo emits float aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    )


def train_nb(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """-> {'tokens': (token, label, logp), 'labels': (label, prior,
    logp_oov)}. One token-count groupBy + one doc-count groupBy; V is
    the training vocabulary size (distinct tokens across labels)."""
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    )
    counts = toks.groupBy("token", "label").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    totals = counts.groupBy("label").agg(F.sum("cnt").alias("n_tok"))
    v = counts.select("token").distinct().count()
    doc_counts = docs.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    n_total = docs.count()
    labels = doc_counts.join(totals, "label").select(
        "label",
        F.log(F.col("n_docs") / F.lit(float(n_total))).alias("prior"),
        F.log(F.lit(1.0) / (F.col("n_tok") + F.lit(v))).alias("logp_oov"),
    )
    tokens = (
        counts.join(totals, "label")
        .select(
            "token",
            "label",
            F.log((F.col("cnt") + 1) / (F.col("n_tok") + F.lit(v))).alias(
                "logp"
            ),
        )
    )
    return {"tokens": tokens, "labels": labels}


def score_nb(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, label, score): per-label NB log-probability for every
    doc. The model tables broadcast (vocab x labels is dimension-
    sized); the only shuffle is the per-(doc, label) sum."""
    toks = _toks(docs, id_col, text_col)
    labeled = toks.crossJoin(
        F.broadcast(model["labels"].select("label", "logp_oov"))
    )
    scored_toks = labeled.join(
        F.broadcast(model["tokens"]), ["token", "label"], "left"
    ).select(
        id_col,
        "label",
        F.coalesce("logp", "logp_oov").alias("lp"),
    )
    sums = scored_toks.groupBy(id_col, "label").agg(
        F.sum("lp").alias("lp_sum")
    )
    return sums.join(F.broadcast(model["labels"]), "label").select(
        id_col, "label", (F.col("lp_sum") + F.col("prior")).alias("score")
    )


def log_odds(
    scores: DataFrame, pos_label: str, neg_label: str, id_col: str = "doc_id"
) -> DataFrame:
    """Binary decision view: (id, log_odds = score_pos - score_neg);
    keep the page when positive."""
    pos = scores.filter(F.col("label") == pos_label).select(
        id_col, F.col("score").alias("_p")
    )
    neg = scores.filter(F.col("label") == neg_label).select(
        id_col, F.col("score").alias("_n")
    )
    return pos.join(neg, id_col).select(
        id_col, (F.col("_p") - F.col("_n")).alias("log_odds")
    )
