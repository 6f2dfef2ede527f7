"""Deduplication operators for training-data pipelines.

All DataFrame-native (no Python UDFs); each returns a DataFrame so the
caller composes them into the DAG. Web-scale notes per operator:

  exact_duplicates      one shuffle on md5(text); partial agg upstream
  minhash_signatures    explode(tokens) -> K min-aggregations; the explode
                        is narrow, the groupBy is the only shuffle
  minhash_dup_pairs     banded LSH: candidates meet only inside
                        (band, band_key) buckets -> no quadratic join
  simhash               same shape as minhash (explode + sum aggs)
  ngram_jaccard_pairs   bounded by a blocking key (lang, length bucket) —
                        never run unblocked at scale
  embedding_dup_pairs   cosine pairs; DEFAULT blocking is hyperplane-LSH
                        buckets with 1-bit multi-probe (bucket-local join
                        at any scale); value blocking available opt-in

The rolling string hash matches the engine-wide deterministic fold
(functions in __spark_entry__ use the same formula for oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOD = 1_000_000_007
MINHASH_K = 16
_MH = [
    ((1103515245 * k + 12345) % MOD, (12345 * k + 1103515245) % MOD)
    for k in range(MINHASH_K)
]
SIMHASH_BITS = 16


def str_hash(col):
    """Ordered left-fold rolling hash (acc*31 + ascii) % MOD."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % F.lit(MOD),
    )


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """-> (text_md5, n_docs, keep_id): hash-groupBy exact dedup; keep_id is
    the deterministic survivor (min id)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_md5")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min(id_col).alias("keep_id"),
    )


def minhash_signatures(
    df: DataFrame, id_col: str, tokens_col: str, k: int = MINHASH_K
) -> DataFrame:
    """-> (id, sig0..sig{k-1}) MinHash over distinct tokens."""
    toks = df.select(
        id_col, F.explode(F.array_distinct(F.col(tokens_col))).alias("token")
    )
    h = str_hash(F.col("token"))
    hashed = toks.select(
        id_col,
        *[
            ((F.lit(a) * h + F.lit(b)) % F.lit(MOD)).alias(f"m{i}")
            for i, (a, b) in enumerate(_MH[:k])
        ],
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(f"m{i}").alias(f"sig{i}") for i in range(k)]
    )


def minhash_dup_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    bands: int = 8,
    min_jaccard: float = 0.5,
) -> DataFrame:
    """Banded-LSH near-duplicate pairs verified by exact token Jaccard.

    -> (id_a, id_b, jaccard) with id_a < id_b.
    """
    k = MINHASH_K
    rows = k // bands
    sigs = minhash_signatures(df, id_col, tokens_col, k)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"sig{b * rows + r}") for r in range(rows)]).alias(
                    "band_key"
                ),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(id_col, F.explode(band_structs).alias("bk")).select(
        F.col(id_col).alias("bid"), "bk.band", "bk.band_key"
    )
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.bid") < F.col("y.bid")),
        )
        .select(F.col("x.bid").alias("id_a"), F.col("y.bid").alias("id_b"))
        .distinct()
    )
    sets = df.select(
        F.col(id_col).alias("sid"),
        F.array_distinct(F.col(tokens_col)).alias("tok_set"),
    )
    verified = (
        cand.join(sets.withColumnRenamed("sid", "id_a"), "id_a")
        .withColumnRenamed("tok_set", "set_a")
        .join(sets.withColumnRenamed("sid", "id_b"), "id_b")
        .withColumnRenamed("tok_set", "set_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("set_a", "set_b"))
            / F.size(F.array_union("set_a", "set_b")),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )
    return verified.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def simhash(df: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """-> (id, simhash): 16-bit SimHash over token rolling hashes."""
    toks = df.select(id_col, F.explode(F.col(tokens_col)).alias("token"))
    h = str_hash(F.col("token"))
    bits = toks.select(
        id_col,
        *[
            (F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ],
    )
    agg = bits.groupBy(id_col).agg(
        *[F.sum(f"b{j}").alias(f"s{j}") for j in range(SIMHASH_BITS)]
    )
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(id_col, sim.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    block_cols: list[str],
    n: int = 3,
    min_jaccard: float = 0.1,
) -> DataFrame:
    """Token-n-gram Jaccard over pairs sharing the blocking key."""
    toks = F.col(tokens_col)
    # n shifted slices zipped together: references `toks` O(n) per ROW.
    # (A per-position element_at lambda gets re-inlined by projection
    # collapse — O(L*n) references — which is catastrophic when callers
    # pass a derived tokenization expression rather than a stored column.)
    width = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    acc = F.slice(toks, 1, width)
    for j in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, j + 1, width),
            lambda a, b: F.concat_ws("_", a, b),
        )
    d = df.select(
        F.col(id_col).alias("pid"),
        *block_cols,
        F.array_distinct(acc).alias("shingles"),
    ).filter(F.size("shingles") >= n)
    a, b = d.alias("a"), d.alias("b")
    cond = F.col("a.pid") < F.col("b.pid")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    jac = F.size(F.array_intersect("a.shingles", "b.shingles")) / F.size(
        F.array_union("a.shingles", "b.shingles")
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.pid").alias("id_a"),
            F.col("b.pid").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= min_jaccard)
    )


def embedding_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    min_cosine: float = 0.95,
    block_col: str | None = None,
    planes: int = 8,
) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs.

    DEFAULT blocking (block_col=None) is hyperplane-LSH with 1-bit
    multi-probe: a pair is a candidate iff the two sign-buckets are
    within Hamming distance 1 (left side explodes to its bucket + the
    `planes` one-bit flips; join on right.bucket). Candidates therefore
    only ever meet inside a hash bucket — the join stays bucket-local at
    any corpus size, unlike value blocking where one skewed block (e.g.
    one language = 60% of the corpus) turns quadratic.

    Passing block_col keeps caller-supplied value blocking for the cases
    where the caller can bound block sizes."""
    def dot(x, y):
        prods = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.element_at(x, i).cast("double")
            * F.element_at(y, i).cast("double"),
        )
        return F.aggregate(prods, F.lit(0.0), lambda a_, v: a_ + v)

    # norms are computed ONCE PER ROW before the join: the join output is
    # quadratic in bucket size, so evaluating self-dots per PAIR would
    # triple the dominant cost (measured 24s -> 9s at 2k vectors).
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    if block_col is not None:
        d = df.select(
            F.col(id_col).alias("pid"),
            F.col(block_col).alias("blk"),
            F.col(vec_col).alias("v"),
        ).withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
        # explicit key repartition: pair GENERATION is quadratic per
        # block, so task sizing must follow keys, not input bytes (AQE
        # would coalesce a sub-MB scan into one task and serialize the
        # whole pairwise stage through it)
        a = d.repartition(n_parts, "blk").alias("a")
        b = d.alias("b")
        pairs = a.join(
            b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.pid") < F.col("b.pid"))
        )
    else:
        from .similarity import hyperplane_bucket

        d = (
            df.select(F.col(id_col).alias("pid"), F.col(vec_col).alias("v"))
            .withColumn("bucket", hyperplane_bucket(F.col("v"), dim, planes))
            .withColumn("norm", F.sqrt(dot(F.col("v"), F.col("v"))))
        )
        # each (a, b) with Hamming <= 1 matches on exactly one probe value,
        # so no post-join distinct is needed
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("long")
                for p in range(planes)
            ],
        )
        a = (
            d.withColumn("probe", F.explode(probes))
            .select(F.col("pid"), F.col("v"), F.col("norm"), F.col("probe"))
            .repartition(n_parts, "probe")
            .alias("a")
        )
        b = d.select("pid", "v", "norm", "bucket").alias("b")
        pairs = a.join(
            b,
            (F.col("a.probe") == F.col("b.bucket"))
            & (F.col("a.pid") < F.col("b.pid")),
        )
    cos = dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    return pairs.select(
        F.col("a.pid").alias("id_a"),
        F.col("b.pid").alias("id_b"),
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= min_cosine)
