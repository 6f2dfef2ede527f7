"""S4: CoNLL-style token-per-line source (EEGCN loader.py:7-27).

Physical format (EEGCN/README.md:46-78): whitespace-separated columns
  token doc_id entity_type entity_subtype event_tag dep_label dep_head_idx
one token per line, BLANK line = sentence boundary. A leading-space token
becomes '$' (loader.py:19-21) and '...' noise tokens are dropped
(loader.py:96).

Spark-first: the grouping key is the running count of blank lines BEFORE
each line, computed as a TWO-LEVEL prefix sum (per-read-partition window
+ a prefix over the tiny per-partition totals — no single task ever sees
the whole stream), then one groupBy rebuilds sentence rows with arrays
ordered by line position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

COLS = ["token", "doc_id", "entity_type", "entity_subtype", "event_tag",
        "dep_label", "dep_head"]


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """-> (sent_id long, n_tokens int, tokens, doc_id string,
           entity_types, entity_subtypes, event_tags, dep_labels,
           dep_heads array<int>)."""
    lines = (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("line_id"),
            F.col("value").alias("line"),
        )
    )
    # leading-space token -> '$' (loader.py:19-21)
    fixed = lines.withColumn(
        "line",
        F.when(F.col("line").startswith(" "), F.concat(F.lit("$"), F.col("line")))
        .otherwise(F.col("line")),
    )
    # Two-level prefix sum: monotonically_increasing_id is partitionId<<33
    # | local offset, so the high bits bucket the stream by read partition
    # and (bucket, line_id) order == line_id order. Level 1 runs parallel
    # per bucket; level 2 is a window over one row per read partition.
    blank = F.when(F.trim("line") == "", 1).otherwise(0)
    fixed = fixed.withColumn("bucket", F.shiftright("line_id", 33))
    inner = F.coalesce(
        F.sum(blank).over(
            W.partitionBy("bucket")
            .orderBy("line_id")
            .rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    prefix = (
        fixed.groupBy("bucket")
        .agg(F.sum(blank).alias("bucket_blanks"))
        .select(
            "bucket",
            F.coalesce(
                F.sum("bucket_blanks").over(
                    W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("bucket_prefix"),
        )
    )
    keyed = (
        fixed.withColumn("inner_prefix", inner)
        .join(prefix, "bucket")
        .withColumn("sent_id", F.col("bucket_prefix") + F.col("inner_prefix"))
        .filter(F.trim("line") != "")
        .withColumn("parts", F.split(F.trim("line"), r"\s+"))
        .filter(F.element_at("parts", 1) != "...")  # noise filter F8
    )
    # try_element_at: a malformed short line degrades to nulls in the
    # missing columns instead of aborting the whole read under ANSI mode
    # (the reference loader tolerates short lines the same way)
    cols = [F.try_element_at("parts", F.lit(i + 1)).alias(c) for i, c in enumerate(COLS)]
    tok = keyed.select("sent_id", "line_id", *cols)
    def _pick(cname):
        # closure factory: a default-arg lambda would have arity 2 and be
        # mis-detected by F.transform as an (element, index) lambda
        return lambda s: s[cname]

    agg = tok.groupBy("sent_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.min("doc_id").alias("doc_id"),
        *[
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_id", c))), _pick(c)
            ).alias(c + "s")
            for c in COLS
            if c != "doc_id"
        ],
    )
    return agg.select(
        "sent_id",
        "n_tokens",
        "doc_id",
        F.col("tokens"),
        F.col("entity_types"),
        F.col("entity_subtypes"),
        F.col("event_tags"),
        F.col("dep_labels"),
        F.transform("dep_heads", lambda h: h.cast("int")).alias("dep_heads"),
    )


def write_conll_results(
    df: DataFrame,
    path: str,
    tokens_col: str = "tokens",
    gold_col: str = "gold_tags",
    pred_col: str = "pred_tags",
    sort_col: str = "sent_id",
) -> None:
    """K2: prediction sink in conlleval's input format — one
    `token gold pred` line per token, blank line between sentences
    (EEGCN main.py:105-113 result files). One output row per sentence
    becomes one text block; files are sorted by sort_col WITHIN each
    partition (a global order would serialize the write; conlleval's
    chunk metrics are order-insensitive across sentences)."""
    body = F.array_join(
        F.zip_with(
            F.zip_with(
                F.col(tokens_col),
                F.col(gold_col),
                lambda t, g: F.concat_ws(" ", t, g),
            ),
            F.col(pred_col),
            lambda x, p: F.concat_ws(" ", x, p),
        ),
        "\n",
    )
    (
        df.sortWithinPartitions(sort_col)
        .select(F.concat(body, F.lit("\n")).alias("value"))
        .write.mode("overwrite")
        .text(path)
    )
