"""A1 — vocabulary build with the reference's exact tie-break.

EEGCN data_utils.py:51-56 sorts ``(-count, token)`` so equal-count tokens
get ids in lexicographic order; id stability across partitions is the
SURVEY.md §7 "A1 id stability" risk — row_number over a total order is
deterministic, ``monotonically_increasing_id`` is not. Specials are
prepended at fixed ids (loader.py:50-51 puts <PAD>=0, <UNK>=1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SPECIALS = ["<PAD>", "<UNK>"]


def rank_count_token(counts: DataFrame) -> DataFrame:
    """Add ``rk`` = ``row_number() OVER (ORDER BY cnt DESC, token ASC)``
    to a (token, cnt) frame WITHOUT a single-partition global window.

    Two-level scheme (the s4/f4 prefix pattern): (1) row_number inside
    (cnt, 2-codepoint token prefix) buckets — parallel, and consistent
    with the total order because a shorter shared prefix implies the
    same bucket and differing prefixes order exactly like the tokens
    (UTF-8 binary order equals code-point order); (2) a prefix sum over
    the per-bucket counts, a table bounded by |distinct cnt| x |distinct
    2-codepoint prefixes| — small enough to broadcast back even when the
    token space has hundreds of millions of entries. The hapax bucket
    (cnt=1 holds ~half a web vocabulary) is what the prefix split
    breaks up; widen to 3 codepoints if a prefix still skews.
    """
    b = counts.withColumn("_pfx", F.substring("token", 1, 2))
    totals = b.groupBy("cnt", "_pfx").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = Window.orderBy(F.desc("cnt"), F.asc("_pfx")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off = totals.select(
        "cnt",
        "_pfx",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off"),
    )
    w_in = Window.partitionBy("cnt", "_pfx").orderBy("token")
    return (
        b.join(F.broadcast(off), ["cnt", "_pfx"])
        .withColumn(
            "rk", (F.col("_off") + F.row_number().over(w_in)).cast("long")
        )
        .drop("_pfx", "_off")
    )


def build_vocab(
    df: DataFrame, tokens_col: str = "tokens", specials: list[str] | None = None
) -> DataFrame:
    """-> (token, cnt, id); specials get ids 0..len-1, corpus tokens follow
    ranked by (-cnt, token)."""
    specials = SPECIALS if specials is None else specials
    counts = (
        df.select(F.explode(tokens_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = rank_count_token(counts).withColumn(
        "id", (F.col("rk") + len(specials) - 1).cast("long")
    )
    spark = df.sparkSession
    sp = spark.createDataFrame(
        [(s, 0, i) for i, s in enumerate(specials)], ["token", "cnt", "id"]
    ).select("token", F.col("cnt").cast("long"), F.col("id").cast("long"))
    return sp.unionByName(
        ranked.select("token", F.col("cnt").cast("long"), "id")
    )
