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


# ---------------------------------------------------------------------------
# RCEE QuestionGeneration data prep (the one reference file the SURVEY
# never inventoried — closed in round 4 per the r3 verdict).
# ---------------------------------------------------------------------------

def anchor_windows(
    df: DataFrame,
    before: int = 5,
    after: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_col: str = "anchor_start",
    end_col: str = "anchor_end",
) -> DataFrame:
    """±k-token context windows around an anchor span — RCEE
    QuestionGeneration/data_preparation.py:8-26 generate_context
    semantics: ``' '.join(words[max(0, start-k) : end+k])`` (python
    slice, so an end past the token count clamps to it). The anchor is
    a (start, end) token span (trigger mention position in RCEE; any
    mention span here). Whitespace tokens, same baseline as
    passage_windows.

    -> (doc_id, anchor_start, anchor_end, ctx_start, n_tok, passage);
    ctx_start = max(0, start-before), n_tok = the clamped window
    length. One narrow projection, zero shuffles."""
    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(start_col).cast("long").alias("anchor_start"),
        F.col(end_col).cast("long").alias("anchor_end"),
        F.split(F.trim(text_col), r"\s+").alias("toks"),
    ).withColumn("n", F.size("toks").cast("long"))
    lo = F.greatest(F.col("anchor_start") - before, F.lit(0).cast("long"))
    hi = F.least(F.col("anchor_end") + after, F.col("n"))
    return toks.select(
        "doc_id",
        "anchor_start",
        "anchor_end",
        lo.alias("ctx_start"),
        F.greatest(hi - lo, F.lit(0).cast("long")).alias("n_tok"),
        F.array_join(
            F.slice(
                "toks",
                (lo + 1).cast("int"),
                F.greatest(hi - lo, F.lit(0).cast("long")).cast("int"),
            ),
            " ",
        ).alias("passage"),
    )


def anchor_windows_oracle_sql(
    source_sql: str, before: int = 5, after: int = 5
) -> str:
    """DuckDB twin of anchor_windows over (doc_id, anchor_start,
    anchor_end, text) rows."""
    return f"""
WITH t AS (
  SELECT doc_id, CAST(anchor_start AS BIGINT) AS anchor_start,
         CAST(anchor_end AS BIGINT) AS anchor_end,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n
  FROM ({source_sql})
),
w AS (
  SELECT doc_id, anchor_start, anchor_end, toks, n,
         greatest(anchor_start - {before}, 0) AS lo,
         least(anchor_end + {after}, n) AS hi
  FROM t
)
SELECT doc_id, anchor_start, anchor_end,
       lo AS ctx_start,
       greatest(hi - lo, 0) AS n_tok,
       -- clamp the slice end at 0: DuckDB treats a NEGATIVE bound as
       -- end-relative, which would turn a degenerate window (hi < 0,
       -- e.g. a sentinel anchor_end) into a non-empty passage while
       -- Spark's length-0 slice yields '' — greatest() keeps the two
       -- engines byte-identical on that edge
       array_to_string(toks[lo + 1 : greatest(hi, 0)], ' ') AS passage
FROM w
"""


def question_stems(
    df: DataFrame, id_col: str = "q_id", question_col: str = "question"
) -> DataFrame:
    """Question-to-stem filtering — RCEE QuestionGeneration/
    data_preparation.py:29-48 generate_question rules over a question
    corpus (SQuAD/wiki in the reference; any question table here):

      rule A: tokens[0] in (What, Who) AND tokens[1] in (is, are) AND
              tokens[2] == 'the'  ->  stem = ' '.join(tokens[4:])
              (tokens[3], the head noun, is deliberately skipped —
              the reference wants the post-head remainder)
      rule B: tokens[0] in (Where, When)  ->  stem = ' '.join(tokens[1:])

    Empty stems drop (the reference's ``if temp``); questions matching
    neither rule drop. Whitespace tokens, case-sensitive match like the
    reference. -> (q_id, rule, stem). Pure narrow expressions."""
    toks = F.split(F.trim(F.col(question_col)), r"\s+")
    t0, t1, t2 = F.get(toks, 0), F.get(toks, 1), F.get(toks, 2)
    n = F.size(toks)
    rule_a = (
        t0.isin("What", "Who") & t1.isin("is", "are") & (t2 == F.lit("the"))
    )
    rule_b = t0.isin("Where", "When")
    stem_a = F.array_join(F.slice(toks, 5, F.greatest(n - 4, F.lit(0))), " ")
    stem_b = F.array_join(F.slice(toks, 2, F.greatest(n - 1, F.lit(0))), " ")
    out = df.select(
        F.col(id_col).alias("q_id"),
        F.when(rule_a, F.lit("head_of")).when(rule_b, F.lit("wh_rest")).alias(
            "rule"
        ),
        F.when(rule_a, stem_a).when(rule_b, stem_b).alias("stem"),
    )
    return out.filter(F.col("rule").isNotNull() & (F.col("stem") != ""))


def question_stems_oracle_sql(source_sql: str) -> str:
    """DuckDB twin of question_stems over (q_id, question) rows."""
    return f"""
WITH t AS (
  SELECT q_id, regexp_split_to_array(trim(question), '\\s+') AS toks
  FROM ({source_sql})
),
r AS (
  SELECT q_id, toks,
         CASE
           WHEN toks[1] IN ('What', 'Who') AND toks[2] IN ('is', 'are')
                AND toks[3] = 'the' THEN 'head_of'
           WHEN toks[1] IN ('Where', 'When') THEN 'wh_rest'
         END AS rule
  FROM t
)
SELECT q_id, rule,
       CASE rule WHEN 'head_of'
                 THEN array_to_string(toks[5 : len(toks)], ' ')
                 ELSE array_to_string(toks[2 : len(toks)], ' ')
       END AS stem
FROM r
WHERE rule IS NOT NULL
  AND (CASE rule WHEN 'head_of'
                 THEN array_to_string(toks[5 : len(toks)], ' ')
                 ELSE array_to_string(toks[2 : len(toks)], ' ')
       END) <> ''
"""
