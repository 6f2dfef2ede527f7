"""BPE merge learning — tokenizer training as iterative corpus aggregation.

A training-data pipeline at 100 TB needs to TRAIN its tokenizer over the
corpus, not just apply one: byte-pair encoding (Sennrich et al., ACL
2016) repeatedly merges the most frequent adjacent symbol pair. The
reference repo consumes pre-built vocabs (DeepEE *_utils.py load fixed
BERT/word vocabularies); this operator is the upstream builder.

Scale story (the reason corpus BPE is feasible at all): the corpus is
aggregated ONCE into a (word, count) vocabulary — a single
map-side-combinable shuffle over the documents, after which every merge
iteration runs on the *vocabulary*, whose size is bounded by distinct
word forms (millions, not trillions) regardless of corpus bytes. That
is exactly how fastBPE / SentencePiece structure the computation; here
each iteration is two small Spark jobs:

  1. pair counts: explode adjacent symbol pairs per word, weighted by
     word count, groupBy (left, right) — the winner is chosen with a
     total-order tie-break (n DESC, left ASC, right ASC) so the learned
     table is deterministic;
  2. merge application: the 1-row winner is broadcast-cross-joined onto
     the vocabulary and applied with a pure-Catalyst `aggregate` fold
     (greedy leftmost non-overlapping, the BPE rule). No UDF, no
     collect(): the winner travels as columns, so the whole learn loop
     stays declarative and the driver never materializes data.

Greedy-fold correctness note: a merged token `left||right` is strictly
longer than `left`, so it can never re-match as the left symbol of the
same rule within the iteration — the fold therefore implements exactly
the one-pass leftmost semantics (the `aaaaa` chain case is pinned in
tests against an independent single-process oracle).

The DuckDB oracle (`learn_merges_oracle_sql`) re-derives the same K
iterations with window functions: candidate positions, consecutive-run
grouping (pos - row_number), and the even-offset-in-run rule — the
standard SQL encoding of "greedy take-every-other within overlapping
candidate runs".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_RE = "[a-z]+"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): lowercase [a-z]+ word frequencies — the single
    corpus-wide aggregation everything else iterates on."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_WORD_RE), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _apply_merge(words: DataFrame, winner: DataFrame) -> DataFrame:
    """Apply the broadcast 1-row (l, r) merge rule to every word's
    symbol list: greedy leftmost non-overlapping, pure Catalyst fold."""
    return words.crossJoin(F.broadcast(winner.select("l", "r"))).select(
        "word",
        "cnt",
        F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.col("l"))
                & (x == F.col("r")),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.col("l"), F.col("r"))),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ).alias("syms"),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, n): adjacent-symbol pair frequencies weighted by word
    count. zip_with over the list and its 1-shifted self — narrow."""
    pairs = words.select(
        "cnt",
        F.explode(
            F.zip_with(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("cnt").cast("long").alias("n")
    )


def learn_merges(
    df: DataFrame, steps: int = 3, text_col: str = "text"
) -> DataFrame:
    """(step, left, right, n): the first `steps` BPE merges learned from
    the corpus, in learned order. Deterministic: winner per step is
    max by (n DESC, left ASC, right ASC)."""
    words = word_counts(df, text_col).select(
        "word",
        "cnt",
        F.split("word", "").alias("syms"),
    )
    # the vocabulary is small (bounded by distinct word forms) and every
    # iteration scans it twice — pin it once instead of re-aggregating
    # the corpus per step
    words = words.localCheckpoint(eager=False)
    out = []
    for step in range(1, steps + 1):
        winner = (
            _pair_counts(words)
            .orderBy(F.desc("n"), F.asc("l"), F.asc("r"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        out.append(
            winner.select(
                F.lit(step).alias("step"),
                F.col("l").alias("left"),
                F.col("r").alias("right"),
                "n",
            )
        )
        if step < steps:
            words = _apply_merge(words, winner).localCheckpoint(eager=False)
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def segment_words(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """(word, cnt, pieces): apply an already-learned merge table (in
    learned order) to the corpus vocabulary — the inference half of the
    tokenizer. merges is a small driver-side list (the learned table is
    by construction tiny), each rule applied as one Catalyst fold."""
    words = word_counts(df, text_col).select(
        "word", "cnt", F.split("word", "").alias("syms")
    )
    for l, r in merges:
        rule = words.sparkSession.createDataFrame([(l, r)], "l string, r string")
        words = _apply_merge(words, rule)
    return words.select("word", "cnt", F.col("syms").alias("pieces"))


def _one_iteration_sql(k: int, fixed: tuple[str, str] | None = None) -> str:
    """CTE block computing merge k from words_{k-1} and applying it to
    produce words_k. Greedy application via candidate-run parity.
    With `fixed`, merge k is the given (l, r) rule instead of the
    corpus-derived winner — the application half alone, shared by the
    segment (inference) oracle."""
    i, o = k - 1, k
    if fixed is not None:
        l, r = fixed
        m_cte = (
            f"m{o} AS (SELECT '{l}' AS l, '{r}' AS r,"
            " CAST(0 AS BIGINT) AS n)"
        )
    else:
        m_cte = f"""m{o} AS (
  SELECT l, r, CAST(SUM(cnt) AS BIGINT) AS n FROM pc{o} WHERE r IS NOT NULL
  GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1
)"""
    return f"""
pos{o} AS (
  SELECT word, cnt, unnest(syms) AS sym, unnest(range(1, len(syms)+1)) AS pos
  FROM words{i}
),
pc{o} AS (
  SELECT sym AS l, lead(sym) OVER (PARTITION BY word ORDER BY pos) AS r, cnt
  FROM pos{o}
),
{m_cte},
cand{o} AS (
  SELECT p.word, p.cnt, p.pos, p.sym, m.l, m.r,
         (p.sym = m.l AND lead(p.sym) OVER (PARTITION BY p.word ORDER BY p.pos) = m.r) AS c
  FROM pos{o} p, m{o} m
),
runs{o} AS (
  SELECT *, CASE WHEN c THEN pos - ROW_NUMBER() OVER (PARTITION BY word, c ORDER BY pos) END AS run_id
  FROM cand{o}
),
marked{o} AS (
  SELECT *, c AND ((pos - MIN(pos) OVER (PARTITION BY word, run_id)) % 2 = 0) AS m
  FROM runs{o}
),
keep{o} AS (
  SELECT word, cnt, pos,
         CASE WHEN m THEN sym || lead(sym) OVER (PARTITION BY word ORDER BY pos) ELSE sym END AS osym,
         m, lag(m) OVER (PARTITION BY word ORDER BY pos) AS prev_m
  FROM marked{o}
),
words{o} AS (
  SELECT word, cnt, list(osym ORDER BY pos) AS syms
  FROM keep{o} WHERE prev_m IS NOT TRUE OR m
  GROUP BY word, cnt
)"""


def learn_merges_oracle_sql(steps: int = 3, table: str = "documents") -> str:
    """DuckDB twin of learn_merges: same word extraction, same
    tie-break, same greedy application, `steps` chained CTE blocks."""
    blocks = [
        f"""WITH words0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         list_transform(range(1, length(word)+1), i -> word[i]) AS syms
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS word
        FROM {table})
  GROUP BY word
)"""
    ]
    blocks += [_one_iteration_sql(k) for k in range(1, steps + 1)]
    selects = [
        f'SELECT {k} AS step, l AS "left", r AS "right", n FROM m{k}'
        for k in range(1, steps + 1)
    ]
    return ",\n".join(blocks) + "\n" + "\nUNION ALL\n".join(selects)


def segment_oracle_sql(
    merges: list[tuple[str, str]], table: str = "documents"
) -> str:
    """DuckDB twin of segment_words: the SAME greedy run-parity
    application blocks as the learner's oracle, but with each merge
    FIXED to the supplied table (inference, not training). Output:
    (word, cnt, pieces) with pieces space-joined for canonical
    comparison."""
    blocks = [
        f"""WITH words0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
         list_transform(range(1, length(word)+1), i -> word[i]) AS syms
  FROM (SELECT unnest(regexp_extract_all(lower(text), '{_WORD_RE}')) AS word
        FROM {table})
  GROUP BY word
)"""
    ]
    blocks += [
        _one_iteration_sql(k, fixed=m) for k, m in enumerate(merges, 1)
    ]
    last = len(merges)
    return (
        ",\n".join(blocks)
        + f"\nSELECT word, cnt, array_to_string(syms, ' ') AS pieces"
        f" FROM words{last}"
    )
