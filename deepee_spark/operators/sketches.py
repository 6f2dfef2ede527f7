"""KMV (k-minimum-values) distinct-count sketch.

The 100 TB operational question "how many distinct entities does each
predicate touch" cannot afford an exact count-distinct per group at
full scale. The standard sketch answers (HyperLogLog via Spark's
approx_count_distinct) are engine-specific — no cross-engine oracle can
check them. KMV (Bar-Yossef et al., "Counting distinct elements in a
data stream", RANDOM'02 — public) is the sketch that CAN be checked
bit-for-bit: the sketch state is literally the k smallest hash values
of the distinct elements, and with a shared deterministic hash both
engines compute the identical sketch AND the identical integer
estimate (k-1)*M div h_(k).

Plan shape at scale: one distinct shuffle on (key, hash) — partial
aggregation collapses duplicates map-side — then one partitioned
window ordered by hash (parallel across keys; within a key the window
only has to surface k rows). No collect, no per-group state larger
than k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .dedup import MOD, str_hash
from .sampling import DIFFUSION

KMV_K = 64


def kmv_hash(col):
    """Diffused rolling hash, uniform on [0, MOD) — str_hash is an
    ordered fold (prefix-correlated), the multiply spreads it."""
    return (str_hash(col) * F.lit(DIFFUSION)) % F.lit(MOD)


def kmv_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per key: the KMV sketch summary and integer distinct estimate.

    Returns (key..., n_kept, kth_hash, distinct_est) where
      n_kept       = min(k, observed distinct hashes)
      kth_hash     = the largest retained hash (the sketch threshold)
      distinct_est = n_kept if n_kept < k (sketch is exact below k),
                     else (k-1) * MOD div kth_hash — all BIGINT, so the
                     DuckDB twin hash-matches exactly.
    """
    hashed = df.select(
        *key_cols, kmv_hash(F.col(value_col)).alias("h")
    ).distinct()
    rn = F.row_number().over(W.partitionBy(*key_cols).orderBy("h"))
    kept = hashed.withColumn("rn", rn).filter(F.col("rn") <= k)
    return kept.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("kth_hash"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1))
        )
        .otherwise(
            F.expr(f"({k - 1} * CAST({MOD} AS BIGINT)) div max(h)")
        )
        .cast("long")
        .alias("distinct_est"),
    )


def kmv_oracle_sql(
    source_sql: str, key_cols: list[str], k: int = KMV_K
) -> str:
    """DuckDB twin over `source_sql`, a SELECT yielding the key columns
    plus a column `h` computed with the shared hash formula."""
    keys = ", ".join(key_cols)
    return f"""
WITH hashed AS (SELECT DISTINCT {keys}, h FROM ({source_sql})),
ranked AS (
  SELECT {keys}, h,
         ROW_NUMBER() OVER (PARTITION BY {keys} ORDER BY h) AS rn
  FROM hashed)
SELECT {keys},
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MAX(h) AS BIGINT) AS kth_hash,
       CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                 ELSE ({k - 1} * CAST({MOD} AS BIGINT)) // MAX(h)
            END AS BIGINT) AS distinct_est
FROM ranked WHERE rn <= {k}
GROUP BY {keys}
"""


def kmv_sketch_parts(
    df: DataFrame,
    key_cols: list[str],
    part_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """-> (key..., part, n_kept, hashes): one KMV sketch per (key,
    part) — e.g. per (predicate, crawl day). `hashes` is the sorted
    array of the <= k smallest distinct value hashes: the ENTIRE
    sketch state, so parts are mergeable downstream without touching
    the raw data again (the property that makes sketches worth
    storing: day parts roll up to month estimates for free)."""
    hashed = df.select(
        *key_cols, F.col(part_col).alias("part"),
        kmv_hash(F.col(value_col)).alias("h"),
    ).distinct()
    rn = F.row_number().over(
        W.partitionBy(*key_cols, "part").orderBy("h")
    )
    kept = hashed.withColumn("rn", rn).filter(F.col("rn") <= k)
    return kept.groupBy(*key_cols, "part").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sort_array(F.collect_list("h")).alias("hashes"),
    )


def kmv_merge(
    parts: DataFrame,
    key_cols: list[str],
    k: int = KMV_K,
) -> DataFrame:
    """Merge per-part sketches from kmv_sketch_parts into one estimate
    per key: union the retained hashes, keep the k smallest, re-apply
    the (k-1)*MOD div h_(k) estimator. EXACTLY equals the direct
    sketch of the unioned data (the KMV merge identity: the k smallest
    of a union are a subset of the union of each part's k smallest) —
    pytest asserts that identity, so rolling up stored day sketches is
    lossless vs rescanning the month."""
    exploded = parts.select(
        *key_cols, F.explode("hashes").alias("h")
    ).distinct()
    rn = F.row_number().over(W.partitionBy(*key_cols).orderBy("h"))
    kept = exploded.withColumn("rn", rn).filter(F.col("rn") <= k)
    return kept.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").cast("long").alias("kth_hash"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1))
        )
        .otherwise(
            F.expr(f"({k - 1} * CAST({MOD} AS BIGINT)) div max(h)")
        )
        .cast("long")
        .alias("distinct_est"),
    )


# ---------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005 —
# public): approximate per-key frequencies in O(width * depth) space.
# Completes the engine-checkable sketch triad — KMV (cardinality,
# above), Bloom (membership, operators/bloom.py), CMS (frequency) —
# all three built from the same md5 arithmetic, so a DuckDB twin
# reproduces the exact sketch state and every estimate. Estimates
# NEVER undercount (min over depth rows of colliding sums); the
# overestimate is bounded by 2*N/width with prob 1-(1/2)^depth.

CMS_WIDTH = 1 << 14
CMS_DEPTH = 4


def _cms_col(col, d: int, width: int):
    from .negatives import md5_long48

    return md5_long48(
        F.concat(col.cast("string"), F.lit(f"|cms{d}"))
    ) % F.lit(width)


def cms_build(
    df: DataFrame,
    value_col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Occurrences of `value_col` -> the (row, col, cnt) CMS state.
    One explode (depth rows per occurrence) + ONE (row, col) agg with
    map-side partials; state is width*depth cells max — broadcastable.
    Sketches merge by summing cnt on (row, col) (counters are
    additive), the same contract as kmv_merge/merge_accumulate."""
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("row"),
                        _cms_col(F.col(value_col), d, width).alias("col"),
                    )
                    for d in range(1, depth + 1)
                ]
            )
        ).alias("c")
    )
    return (
        cells.select("c.row", "c.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    value_col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """-> (value_col, est): min over the depth rows of the probed
    cells — the CMS point estimate, >= the true count always. The
    sketch side broadcasts; absent cells count 0 (a key with any
    absent cell was never inserted)."""
    p = probes.select(F.col(value_col)).distinct()
    pos = p.select(
        value_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("long").alias("row"),
                        _cms_col(F.col(value_col), d, width).alias("col"),
                    )
                    for d in range(1, depth + 1)
                ]
            )
        ).alias("c"),
    ).select(value_col, "c.row", "c.col")
    joined = pos.join(F.broadcast(cms), ["row", "col"], "left")
    return (
        joined.select(
            value_col,
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
        )
        .groupBy(value_col)
        .agg(F.min("cnt").alias("est"))
    )


def cms_estimate_oracle_sql(
    values_sql: str,
    probes_sql: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> str:
    """DuckDB twin of cms_build + cms_estimate; both inputs yield a
    column v; output (v, est)."""
    from .negatives import md5_long48_sql

    def col_sql(d: int) -> str:
        h = md5_long48_sql(f"CAST(v AS VARCHAR) || '|cms{d}'")
        return f"(({h}) % {width})"

    build_rows = " UNION ALL ".join(
        f"SELECT {d} AS row, {col_sql(d)} AS col FROM cms_vals"
        for d in range(1, depth + 1)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT v, {d} AS row, {col_sql(d)} AS col FROM cms_probes"
        for d in range(1, depth + 1)
    )
    return f"""
WITH cms_vals AS (SELECT v FROM ({values_sql})),
cms AS (
  SELECT row, col, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ({build_rows}) GROUP BY row, col),
cms_probes AS (SELECT DISTINCT v FROM ({probes_sql})),
pp AS ({probe_rows})
SELECT pp.v, CAST(MIN(COALESCE(cms.cnt, 0)) AS BIGINT) AS est
FROM pp LEFT JOIN cms ON cms.row = pp.row AND cms.col = pp.col
GROUP BY pp.v
"""


# ---------------------------------------------------------------------
# HyperLogLog with an integer-exact estimator (Flajolet, Fusy,
# Gandouet, Meunier, AofA 2007 — public). The module docstring above
# says stock HLL has no cross-engine oracle; that is true of the
# FLOATING-POINT formulation (registers from engine-specific hashes,
# a float harmonic mean whose summation order is engine-dependent).
# This variant removes both obstacles while keeping the algorithm:
#
#   * the hash is the shared 48-bit md5 (negatives.md5_long48 — real
#     avalanche, so no structure-breaking second diffusion is needed,
#     and byte-identical in any engine with md5). 48 bits matter at
#     the cardinality this sketch exists for: the earlier 30-bit
#     rolling-hash variant saturated at MOD ~ 2^30 distinct hash
#     values, undercounting 21% at 5e8 and plateauing near 1e9 — the
#     exact regime HLL is the scale path FOR. A 48-bit space resolves
#     to ~2.8e14 distincts;
#   * standard bit split: bucket = h % m (low 6 bits), rank from the
#     remaining 42-bit word w = h div m: rho = 43 - bitlength(w) =
#     43 - LENGTH(bin(w)) — `bin` is minimal-length integer-exact in
#     both Spark and DuckDB; w == 0 (probability 2^-42 per value)
#     maps to the max rank 43;
#   * the harmonic mean sum(2^-M_j) is carried as the INTEGER
#     S = sum_j 2^(43 - M_j)  (so sum(2^-M_j) = S / 2^43), and the
#     estimate alpha_64 * m^2 / sum(2^-M_j) becomes ONE integer
#     division  (709 * m^2 * 2^40) div (125 * S)  using Flajolet's
#     exact published alpha_64 = 0.709 (numerator and denominator of
#     (709 m^2 2^43)/(1000 S) both divided by 8 to stay BIGINT-safe).
#     Peak magnitudes: numerator 3.20e18, denominator <= 7.1e16 —
#     exact 64-bit in both engines.
#
# No small-range (LinearCounting) correction: it needs ln(). Below
# ~2.5m distincts use kmv_distinct, which is EXACT there; HLL's niche
# is the huge-cardinality end where KMV's k values stop resolving.
# Registers merge by max — lossless, same contract as kmv_merge.

HLL_M = 64  # 6-bit bucket index; alpha_64 = 0.709 exactly (paper)
_HLL_RANK_MAX = 43  # rank word is 48 - 6 = 42 bits; w == 0 -> 43
_HLL_NUM = 709 * HLL_M * HLL_M * (1 << 40)  # 3193248257552220160
_HLL_DEN = 125  # 1000 / 8, matching the 2^43 -> 2^40 reduction


def _hll_rho(col):
    """Rank of the 42-bit word w = h div m: leading zeros + 1, exactly
    43 - bitlength(w); w == 0 maps to the max rank 43."""
    w = F.shiftright(col.cast("long"), 6)  # div 64: bucket bits off
    return F.when(w == 0, F.lit(_HLL_RANK_MAX)).otherwise(
        F.lit(_HLL_RANK_MAX) - F.length(F.bin(w))
    ).cast("long")


def hll_registers(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """-> (key..., bucket, reg): the nonzero HLL registers per key.
    ONE agg with map-side partials (max is algebraic); at most m rows
    per key survive, so the register table is broadcastable state no
    matter how large the input — the property that makes HLL the
    scale path for 10^12-row cardinality questions."""
    from .negatives import md5_long48

    h = md5_long48(F.col(value_col))
    return (
        df.select(
            *key_cols,
            (h % F.lit(HLL_M)).cast("long").alias("bucket"),
            _hll_rho(h).alias("rho"),
        )
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").cast("long").alias("reg"))
    )


def hll_estimate(
    registers: DataFrame, key_cols: list[str]
) -> DataFrame:
    """Fold registers into (key..., n_buckets, reg_sum, distinct_est),
    all BIGINT. reg_sum is S = sum_j 2^(43 - M_j) over ALL m buckets
    (absent buckets contribute 2^43 each); distinct_est is the raw
    HLL estimate NUM div (125 * S). Bit-identical in any engine with
    exact 64-bit integers."""
    per_key = registers.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RANK_MAX} - reg)")
        )
        .cast("long")
        .alias("_s_present"),
    )
    s = (
        F.col("_s_present")
        + (F.lit(HLL_M) - F.col("n_buckets"))
        * F.lit(1 << _HLL_RANK_MAX)
    ).cast("long")
    return per_key.select(
        *key_cols,
        "n_buckets",
        s.alias("reg_sum"),
        F.expr(
            f"CAST({_HLL_NUM} AS BIGINT) div ({_HLL_DEN} * "
            f"(_s_present + ({HLL_M} - n_buckets)"
            f" * CAST({1 << _HLL_RANK_MAX} AS BIGINT)))"
        ).cast("long").alias("distinct_est"),
    )


def hll_distinct(
    df: DataFrame, key_cols: list[str], value_col: str
) -> DataFrame:
    """Per key: the HLL register summary and integer cardinality
    estimate — kmv_distinct's scale-path sibling (see block comment)."""
    return hll_estimate(hll_registers(df, key_cols, value_col), key_cols)


def hll_merge(parts: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge per-part register tables (key..., part, bucket, reg) into
    one estimate per key: registers merge by MAX — exactly the direct
    sketch of the unioned data (pytest asserts the identity)."""
    merged = parts.groupBy(*key_cols, "bucket").agg(
        F.max("reg").cast("long").alias("reg")
    )
    return hll_estimate(merged, key_cols)


def hll_oracle_sql(source_sql: str, key_cols: list[str]) -> str:
    """DuckDB twin of hll_distinct over `source_sql`, a SELECT yielding
    the key columns plus `h` computed with the shared 48-bit md5 hash
    (negatives.md5_long48_sql)."""
    keys = ", ".join(key_cols)
    r = _HLL_RANK_MAX
    return f"""
WITH hll_src AS (SELECT {keys}, h FROM ({source_sql})),
hll_regs AS (
  SELECT {keys}, h % {HLL_M} AS bucket,
         MAX(CASE WHEN h // {HLL_M} = 0 THEN {r}
                  ELSE {r} - LENGTH(bin(h // {HLL_M}))
             END) AS reg
  FROM hll_src GROUP BY {keys}, h % {HLL_M})
SELECT {keys},
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(1::BIGINT << ({r} - reg))
            + ({HLL_M} - COUNT(*)) * {1 << r}::BIGINT AS BIGINT)
         AS reg_sum,
       CAST({_HLL_NUM}::BIGINT // ({_HLL_DEN} * (SUM(1::BIGINT << ({r} - reg))
            + ({HLL_M} - COUNT(*)) * {1 << r}::BIGINT)) AS BIGINT)
         AS distinct_est
FROM hll_regs
GROUP BY {keys}
"""


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """EXACT heavy hitters ("every value occurring >= threshold times")
    via the sketch-verify composition — the way the query survives a
    keyspace too large to exact-count wholesale:

      pass 1  build the CMS (one partial-agged shuffle whose key space
              is at most width*depth cells, not |distinct values|);
      pass 2  probe every ROW against the broadcast sketch — `depth`
              broadcast joins, one per sketch row, NO shuffle — and
              keep rows whose min-cell estimate clears the threshold.
              CMS estimates only over-count, so no true heavy hitter
              is ever dropped here;
      pass 3  exact-count ONLY the survivors: the one value-keyed
              shuffle runs over candidate rows, whose key count is
              bounded by the sketch's false-positive set, not the
              corpus's distinct count. The final HAVING removes the
              false positives.

    Result is therefore EXACT (the DuckDB oracle is the naive
    GROUP BY/HAVING definition), while the expensive aggregation never
    touches the long tail. Returns (value_col, n)."""
    cms = cms_build(df, value_col, width, depth)
    out = df.select(value_col)
    ests = []
    for d in range(1, depth + 1):
        cd = cms.filter(F.col("row") == d).select(
            F.col("col").alias(f"_c{d}"), F.col("cnt").alias(f"_n{d}")
        )
        out = out.withColumn(
            f"_c{d}", _cms_col(F.col(value_col), d, width)
        ).join(F.broadcast(cd), f"_c{d}", "left")
        ests.append(F.coalesce(F.col(f"_n{d}"), F.lit(0)))
    cand = out.filter(F.least(*ests) >= threshold)
    return (
        cand.groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= threshold)
    )
