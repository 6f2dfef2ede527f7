"""Overlapping passage windows — document chunking for training / RAG.

Downstream consumers of a 100 TB corpus don't eat whole documents:
context-window training and retrieval indexes want fixed-size token
passages with a stride overlap (the standard W/S sliding chunker).
The reference repo's analogue is sentence-level cutting with fixed
max-length truncation (DeepEE DMCNN_Tensorflow/Dataset_CutOut.py
truncates to a max sentence length); this generalizes it to the
corpus-scale chunking op.

Semantics:
  - tokens = whitespace split of the text (the corpus tokenizer's
    whitespace baseline; BPE-ish segmentation is operators/bpe);
  - window starts at 0, S, 2S, ... while start < n_tokens, PLUS the
    guarantee that every token is covered: the last window is clamped
    to start = max(0, n - W) when n > W (so no trailing fragment
    shorter than W exists unless the whole doc is shorter);
  - each row = (doc_id, window_idx, start_tok, n_tok, passage).

Plan shape: one narrow projection + one posexplode — zero shuffles,
embarrassingly parallel over documents; output row count is
sum(ceil(max(n-W,0)/S)+1), linear in corpus tokens for fixed W/S.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def passage_windows(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, window_idx, start_tok, n_tok, passage): W/S sliding
    windows over whitespace tokens, last window clamped to cover the
    tail exactly once."""
    if not 0 < stride <= window:
        raise ValueError("need 0 < stride <= window")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(text_col), r"\s+").alias("toks"),
    ).withColumn("n", F.size("toks"))
    # regular starts strictly below the clamp point, then the clamped
    # tail start (= n-W when n > W, else 0); sequence is inclusive so
    # guard the upper bound to land exactly on the last regular start
    last = F.greatest(F.col("n") - window, F.lit(0))
    starts = F.concat(
        F.when(
            last > 0,
            F.sequence(F.lit(0), (last - 1).cast("int"), F.lit(stride)),
        ).otherwise(F.array().cast("array<int>")),
        F.array(last.cast("int")),
    )
    win = toks.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(starts).alias("window_idx", "start_tok"),
    )
    return win.select(
        "doc_id",
        F.col("window_idx").cast("long").alias("window_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(window), F.col("n") - F.col("start_tok"))
        .cast("long")
        .alias("n_tok"),
        F.array_join(
            F.slice("toks", F.col("start_tok") + 1, window), " "
        ).alias("passage"),
    )


def passage_windows_oracle_sql(
    source_sql: str, window: int = 64, stride: int = 48
) -> str:
    """DuckDB twin: same starts (regular strides below n-W, plus the
    clamped tail), same whitespace tokenization, same joining."""
    return f"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n
  FROM ({source_sql})
),
starts AS (
  SELECT doc_id, toks, n,
         list_append(
           CASE WHEN n - {window} > 0
                THEN list_filter(range(0, n - {window}), s -> s % {stride} = 0)
                ELSE [] END,
           greatest(n - {window}, 0)) AS ss
  FROM t
),
w AS (
  SELECT doc_id, toks, n,
         unnest(ss) AS start_tok,
         unnest(range(0, len(ss))) AS window_idx
  FROM starts
)
SELECT doc_id,
       CAST(window_idx AS BIGINT) AS window_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least({window}, n - start_tok) AS BIGINT) AS n_tok,
       array_to_string(toks[start_tok + 1 : start_tok + {window}], ' ') AS passage
FROM w
"""
