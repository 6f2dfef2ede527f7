"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin).

MinHash-LSH (operators/dedup.py) finds near-duplicate pairs
probabilistically; this is its EXACT counterpart from the public
AllPairs / PPJoin line of work (Bayardo et al. WWW'07, Xiao et al.
WWW'08): every pair with Jaccard >= t is found, none missed, without
the all-pairs product. The filter: order every record's tokens by one
global rarity order (ascending document frequency, token as
tie-break); two sets with Jaccard >= t MUST share a token within each
other's first |x| - ceil(t*|x|) + 1 tokens (the prefix), so candidate
pairs only meet inside per-prefix-token buckets — rare tokens make
tiny buckets, and the hottest (most common) tokens appear in the
FEWEST prefixes, which is what keeps the bucket volume subquadratic.

Scale shape: document frequency is one partial-agged shuffle; the
per-record token sort is row-local (sort_array over struct(df,
token)); candidate generation is a self-join keyed on prefix token
(explicitly repartitioned so AQE cannot serialize the bucket
explosion — the dedup.py:253 guard); verification is array_intersect /
array_union on the two token arrays — exact, lambda-free, one pass
per candidate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def jaccard_similarity_join(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    threshold_permille: int,
    block_cols: list[str] | None = None,
) -> DataFrame:
    """-> (a, b, n_common, n_union, jaccard_e6): every unordered pair
    of records (a < b by id) whose DISTINCT-token Jaccard similarity
    reaches threshold_permille/1000. Exact — the prefix filter admits
    no false negatives; verification removes the false positives.
    Records with empty token sets never pair.

    `block_cols` restricts pairing to records sharing those columns
    (same discipline as ngram_jaccard_pairs: on a corpus that is
    GENUINELY pairwise-similar the OUTPUT is quadratic no matter the
    algorithm — measured 8.9M qualifying pairs from 5k synthetic docs
    at t=0.5 — so production runs block by lang/source/length bucket
    and the prefix filter prunes within blocks). Document frequencies
    stay corpus-global: the prefix bound only needs ONE consistent
    total order, not a per-block one.
    """
    if not 0 < threshold_permille <= 1000:
        raise ValueError("threshold_permille must be in (0, 1000]")
    block_cols = list(block_cols or [])
    toks = df.select(
        F.col(id_col).alias("id"),
        *block_cols,
        F.array_distinct(F.col(tokens_col)).alias("toks"),
    ).filter(F.size("toks") > 0)

    dfreq = (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    # global rarity order realized WITHOUT a global rank table: each
    # record sorts its own tokens by (df, token) — same total order
    # everywhere, computed row-locally after one dimension join.
    ranked = (
        toks.select("id", *block_cols, F.explode("toks").alias("token"))
        .join(dfreq, "token")
        .groupBy("id", *block_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("df", "token"))
            ).alias("ordered")
        )
        .select(
            "id",
            *block_cols,
            F.transform(F.col("ordered"), lambda s: s["token"]).alias(
                "toks"
            ),
        )
    )
    # prefix length |x| - ceil(t*|x|) + 1 (AllPairs bound for Jaccard)
    n = F.size("toks")
    plen = n - F.ceil(n * threshold_permille / 1000).cast("int") + 1
    prefixes = ranked.select(
        "id",
        *block_cols,
        "toks",
        F.explode(F.slice("toks", 1, plen)).alias("ptoken"),
    )
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    join_keys = ["ptoken", *block_cols]
    a = prefixes.select(
        F.col("id").alias("a"), F.col("toks").alias("toks_a"),
        *join_keys,
    ).repartition(n_parts, *join_keys)
    b = prefixes.select(
        F.col("id").alias("b"), F.col("toks").alias("toks_b"),
        *join_keys,
    )
    cand = (
        a.join(b, join_keys)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "toks_a", "toks_b")
        .distinct()
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        cand.select(
            "a",
            "b",
            inter.cast("long").alias("n_common"),
            union.cast("long").alias("n_union"),
            F.expr(
                "CAST(1000000 * size(array_intersect(toks_a, toks_b))"
                " DIV size(array_union(toks_a, toks_b)) AS BIGINT)"
            ).alias("jaccard_e6"),
        )
        .filter(F.col("jaccard_e6") >= threshold_permille * 1000)
    )
