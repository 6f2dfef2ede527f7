"""Deterministic Bloom-filter seen-set — the crawl-frontier gate.

"Have we already crawled this URL" at 10^12-page scale cannot afford an
anti-join against the full history table per drop: the standard gate is
a Bloom filter (Bloom, CACM 1970 — public) over the seen keys, shipped
to the frontier as a compact bitmap. Engine-builtin Bloom joins are
opaque runtime state; this one is an ordinary DataFrame whose bits are
pure md5 arithmetic, so a DuckDB twin builds the IDENTICAL bitmap and
the membership verdicts hash-match cross-engine (the same property that
makes the KMV sketch checkable, operators/sketches.py).

Representation: (word_idx, word) sparse 32-bit words of an m-bit array.
Bit positions are md5_long48(value|i) % m for i in 1..k — k independent
unrolled-md5 expressions, zero lambda higher-order functions
(operators/negatives.py documents the pyspark 4.1.2 HOF hazard).
32-bit words inside BIGINT arithmetic keep every shift/OR exactly
representable in both engines (no signed-overflow edge at bit 63).

Scale shape: build = one explode (k rows per key) + ONE groupBy(word_idx)
with map-side partial bit_or — the bitmap for m = 2^20 bits is 32k rows
(~a broadcast). Probe = the probes' k positions hash-joined against the
broadcastable bitmap + one all-bits-set agg per probe. Merging drops is
bit_or by word_idx (additive, same contract as the KMV part rollup).

Guarantees: a key that was built in ALWAYS probes possibly_seen = true
(no false negatives — safe to use as a skip gate); false-positive rate
is the textbook (1 - e^(-k*n/m))^k — for n = 100k keys in m = 2^20 bits
with k = 4: ~1.2%. Choose m ~ 10 bits/key for ~1% at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .negatives import md5_long48, md5_long48_sql

BLOOM_M = 1 << 20  # bits
BLOOM_K = 4


def _positions(col, k: int, m_bits: int) -> list:
    return [
        md5_long48(F.concat(col.cast("string"), F.lit(f"|{i}")))
        % F.lit(m_bits)
        for i in range(1, k + 1)
    ]


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Values of `value_col` -> the (word_idx, word) sparse bitmap of
    their Bloom filter. No distinct needed: bit_or is idempotent, so
    duplicate keys cost explode rows but never change the bitmap."""
    pos = df.select(
        F.explode(
            F.array(*_positions(F.col(value_col), k, m_bits))
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / 32).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_probe(
    bitmap: DataFrame,
    probes: DataFrame,
    value_col: str,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """-> (value_col, possibly_seen): true iff ALL k bits are set.
    min(hit) rather than count(hit) = k so two hash functions landing
    on the same bit (legal) cannot produce a false negative."""
    p = probes.select(F.col(value_col)).distinct()
    pos = p.select(
        value_col,
        F.explode(
            F.array(*_positions(F.col(value_col), k, m_bits))
        ).alias("pos"),
    ).select(
        value_col,
        (F.col("pos") / 32).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
            "bit"
        ),
    )
    joined = pos.join(F.broadcast(bitmap), "word_idx", "left")
    hit = F.when(
        F.col("word").isNotNull(),
        (F.col("word").bitwiseAND(F.col("bit")) != 0),
    ).otherwise(F.lit(False))
    return (
        joined.select(value_col, hit.alias("hit"))
        .groupBy(value_col)
        .agg(F.min("hit").alias("possibly_seen"))
    )


def admit_unseen(
    keyed: DataFrame,
    bitmap: DataFrame | None,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
    key_col: str = "_cu",
) -> DataFrame:
    """Frontier admission verdict, shared by the batch gate
    (plans.Pipeline.frontier_gate) and the streaming gate
    (streaming.ingest.stream_frontier_gate) so the two stay
    semantically identical: keep the rows of ``keyed`` whose
    ``key_col`` (canonical url) probes NOT-possibly-seen against the
    Bloom ``bitmap``; ``bitmap=None`` means an empty seen-set (first
    drop) — everything is admitted. ``key_col`` is dropped from the
    result either way."""
    if bitmap is None:
        return keyed.drop(key_col)
    probes = keyed.select(F.col(key_col).alias("v"))
    verdicts = bloom_probe(bitmap, probes, "v", m_bits, k)
    return keyed.join(
        verdicts.filter(~F.col("possibly_seen")).select(
            F.col("v").alias(key_col)
        ),
        key_col,
        "left_semi",
    ).drop(key_col)


def bloom_build_oracle_sql(
    values_sql: str, m_bits: int = BLOOM_M, k: int = BLOOM_K
) -> str:
    """DuckDB twin of bloom_build; `values_sql` must yield column v."""
    pos_terms = " UNION ALL ".join(
        f"SELECT (({md5_long48_sql(f'CAST(v AS VARCHAR) || ' + repr('|' + str(i)))}) % {m_bits}) AS pos"
        f" FROM vals"
        for i in range(1, k + 1)
    )
    return f"""
WITH vals AS (SELECT v FROM ({values_sql})),
pos AS ({pos_terms})
SELECT CAST(pos // 32 AS BIGINT) AS word_idx,
       bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS word
FROM pos GROUP BY 1
"""


def bloom_probe_oracle_sql(
    values_sql: str,
    probes_sql: str,
    m_bits: int = BLOOM_M,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin of bloom_build + bloom_probe; probes_sql yields
    column v; output (v, possibly_seen)."""
    build = bloom_build_oracle_sql(values_sql, m_bits, k)
    probe_pos = " UNION ALL ".join(
        f"SELECT v, (({md5_long48_sql(f'CAST(v AS VARCHAR) || ' + repr('|' + str(i)))}) % {m_bits}) AS pos"
        f" FROM probes"
        for i in range(1, k + 1)
    )
    return f"""
WITH bitmap AS ({build}),
probes AS (SELECT DISTINCT v FROM ({probes_sql})),
ppos AS ({probe_pos}),
pbits AS (
  SELECT v, CAST(pos // 32 AS BIGINT) AS word_idx,
         CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER) AS bit
  FROM ppos)
SELECT p.v, bool_and(
         COALESCE((b.word & p.bit) <> 0, FALSE)) AS possibly_seen
FROM pbits p LEFT JOIN bitmap b USING (word_idx)
GROUP BY p.v
"""
