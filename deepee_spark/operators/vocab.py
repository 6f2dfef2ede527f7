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
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    ranked = counts.withColumn(
        "id", (F.row_number().over(w) + len(specials) - 1).cast("long")
    )
    spark = df.sparkSession
    sp = spark.createDataFrame(
        [(s, 0, i) for i, s in enumerate(specials)], ["token", "cnt", "id"]
    ).select("token", F.col("cnt").cast("long"), F.col("id").cast("long"))
    return sp.unionByName(
        ranked.select("token", F.col("cnt").cast("long"), "id")
    )
