"""Deterministic hash-based sampling for corpus curation.

Training-data pipelines need samples that are (a) reproducible across
runs and engines — no RNG state, no partition-order dependence — and
(b) consistent under re-execution of any subset of partitions (a task
retry must sample the same rows). Both fall out of keying the decision
on a content hash instead of a random draw: a row is sampled iff

    rolling_hash(key) % 1000 < rate_permille

using the same ordered left-fold hash the dedup family exposes
(operators/dedup.str_hash — replicable in any engine, which is what
makes the sample auditable by an external oracle).

Shapes:
  * hash_sample — a pure filter: NO shuffle, survives any scale the
    scan survives, and pushes the sampled fraction into every
    downstream stage for free.
  * stratified_sample — per-stratum rates come in as a tiny dimension
    (lang -> permille), broadcast so the crawl side still never
    shuffles; rows in no listed stratum get ``default_permille``.

The hash is over a *string* key. Use a stable identifier (url, doc_id)
— not free text — so near-duplicate documents don't correlate their
sampling decisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import MOD, str_hash

# Knuth multiplicative constant: the rolling hash is affine in the key's
# characters and has NO avalanche — for short decimal keys (doc ids) its
# low-order bits cluster, so `hash % 1000` is badly biased (measured: ids
# 0-499 put only ids 0-9 under bucket 200). One multiplicative diffusion
# step spreads high bits into the bucket range; measured uniform
# (buckets 0-999 all hit, frac<200 = 0.20 +- 0.03) for id ranges from
# 500 to 10000.
DIFFUSION = 2654435761


def sample_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 1000) from the diffused rolling hash
    of key. str_hash < 1e9+7 and DIFFUSION ~ 2.7e9, so the product
    stays under 2^63 — no overflow in any engine's BIGINT."""
    h = str_hash(key.cast("string"))
    return (h * F.lit(DIFFUSION) % F.lit(MOD) % 1000).cast("long")


def hash_sample(df: DataFrame, key_col: str,
                rate_permille: int) -> DataFrame:
    """Keep rows whose hash bucket falls below rate_permille (0-1000)."""
    return df.withColumn(
        "sample_bucket", sample_bucket(F.col(key_col))
    ).filter(F.col("sample_bucket") < rate_permille)


def stratified_sample(df: DataFrame, key_col: str, stratum_col: str,
                      rates: DataFrame,
                      default_permille: int = 0) -> DataFrame:
    """Per-stratum deterministic sampling.

    ``rates`` is a (stratum, permille) dimension, tiny by construction
    (one row per language/source/quality band), so it is broadcast and
    the fact side stays shuffle-free.

    The join is NULL-SAFE: mixture_rates emits a rate row for the NULL
    stratum when the corpus has one (groupBy keeps NULL groups), and a
    plain equality would silently drop that whole stratum to
    ``default_permille`` — undershooting the budget by every
    NULL-stratum row with no error.
    """
    r = F.broadcast(
        rates.select(
            F.col("stratum").alias("_stratum"),
            F.col("permille").cast("long").alias("_permille"),
        )
    )
    joined = df.join(
        r, F.col(stratum_col).eqNullSafe(F.col("_stratum")), "left"
    ).withColumn(
        "sample_bucket", sample_bucket(F.col(key_col))
    )
    return (
        joined.filter(
            F.col("sample_bucket")
            < F.coalesce(F.col("_permille"), F.lit(default_permille))
        )
        .drop("_stratum", "_permille")
    )


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    score_col: str,
    budget_rows: int,
) -> DataFrame:
    """Corpus mixture allocation (the DoReMi/data-mixture line of work,
    reduced to its deterministic core): split a row budget across
    strata proportional to each stratum's QUALITY MASS (sum of an
    integer per-row score), and express the result as the
    (stratum, permille) rates dimension stratified_sample consumes.

        target_s   = budget_rows * mass_s // total_mass
        permille_s = min(1000, 1000 * target_s // n_s)

    All-integer, so the rates — and every downstream sampling decision
    — are engine-reproducible. Shape: ONE stratum agg (tiny output) +
    a scalar total broadcast; the corpus itself is touched once.
    Realized sample size undershoots the budget slightly (two floor
    divisions + the hash's granularity) — never overshoots except for
    the permille cap on strata whose fair share exceeds their size.
    """
    if budget_rows < 0:
        raise ValueError("budget_rows must be >= 0")
    per = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        # coalesce: a stratum whose scores are all NULL sums to NULL,
        # which must read as zero mass, not poison the total
        F.coalesce(F.sum(F.col(score_col)), F.lit(0)).cast("long").alias("mass"),
    )
    total = per.agg(F.sum("mass").alias("_total"))
    # Exact integer division throughout — float division would silently
    # lose exactness once budget * mass passes 2^53 (real at corpus
    # scale). The product itself is computed in DECIMAL(38,0): at the
    # 10^12-row scale this module targets, budget_rows * mass passes
    # 2^63 too (4e9 rows x 5e13 total chars = 2e23), where a BIGINT
    # product would wrap negative under non-ANSI Spark and empty the
    # stratum; decimal DIV stays exact to 1e38 and returns BIGINT (the
    # DuckDB twin uses HUGEINT for the same step). Zero total mass (an
    # all-zero-score slice) allocates nothing: the DIV would raise
    # DIVIDE_BY_ZERO under ANSI mode, and with ANSI off the NULL would
    # slip through least(1000, NULL) as 1000 — sampling EVERYTHING on
    # a zero budget.
    return (
        per.crossJoin(F.broadcast(total))
        .withColumn(
            "_target",
            F.when(
                F.col("_total") > 0,
                F.expr(
                    f"(CAST({budget_rows} AS DECIMAL(38,0)) * mass)"
                    " DIV _total"
                ),
            ).otherwise(F.lit(0)),
        )
        .select(
            F.col(stratum_col).alias("stratum"),
            "n_rows",
            "mass",
            F.least(
                F.lit(1000).cast("long"),
                F.expr("(1000 * _target) DIV n_rows"),
            ).alias("permille"),
        )
    )


def weighted_bottom_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    strata_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling without replacement: keep the k
    rows with the smallest priority = (1e9 * hash(key)) div weight —
    the integer formulation of bottom-k / priority sampling (Cohen &
    Kaplan; Duffield, Lund & Thorup, JACM'07 — public), where doubling
    a row's weight halves its expected priority, so inclusion odds
    scale with weight. The curation use: sample a training subset
    biased toward high quality-score documents, reproducibly — the
    same engine-replicable hash discipline as hash_sample, so task
    retries, reruns, AND the DuckDB oracle pick the identical set.

    Weights are POSITIVE BIGINTs (caller scales floats to integer
    units first) and should stay below ~1e12: the hash spans ~1e9
    values and the numerator scale is 1e9 (the largest that keeps
    1e9 * hash under 2^63 in every engine), so a weight of w leaves
    ~1e18/w distinct priorities — at w ~ 1e12 discrimination is down
    to ~1e6 levels and beyond that selection degenerates toward the
    key tie-break rather than weight-proportional sampling. Rows with
    weight <= 0 are dropped, matching the probability-proportional-
    to-size reading where weight 0 means "never sample". Ties (same
    priority) break on the key for a total order. With `strata_cols`, the bottom-k runs per stratum (k docs
    per language, per source, ...) in one partitioned window.

    Scale shape: priority is a narrow per-row expression computed in
    the scan. Stratified, the only shuffle is the strata-partitioned
    window. Unstratified, the global bottom-k deliberately does NOT
    use an empty-partition window (the single-task scale-killer class
    this repo bans): it plans as sort+limit, which Spark executes as
    TakeOrderedAndProject — each task keeps its local k smallest, the
    driver merges partials — then ranks the k survivors (a k-row
    window is free). Adds (priority, sample_rank) to the input row.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window as W

    h = (str_hash(F.col(key_col)) * F.lit(DIFFUSION)) % F.lit(MOD)
    pos = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("_h", h)
        .withColumn(
            "priority",
            F.expr(f"(1000000000 * _h) DIV {weight_col}").cast("long"),
        )
        .drop("_h")
    )
    if strata_cols:
        w = W.partitionBy(*strata_cols).orderBy("priority", key_col)
        return (
            pos.withColumn(
                "sample_rank", F.row_number().over(w).cast("long")
            )
            .filter(F.col("sample_rank") <= k)
        )
    kept = pos.orderBy("priority", key_col).limit(k)
    w = W.partitionBy().orderBy("priority", key_col)
    return kept.withColumn(
        "sample_rank", F.row_number().over(w).cast("long")
    )
