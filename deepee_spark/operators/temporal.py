"""Temporal fact operators over the (subj, pred, obj, ts) triple stream.

A KG built from rolling web crawls is bitemporal in practice: every fact
carries the crawl timestamp that asserted it, re-crawls re-assert or
contradict earlier facts, and downstream consumers ask two canonical
questions the latest-wins merge (__spark_entry__.kg_fact_latest) cannot
answer:

- "What did the KG believe about X at time t?"  -> asof_join
- "Over which time ranges did each fact hold?"  -> fact_validity_intervals

The reference stops at per-document extraction (its eval joins are
timeless set intersections, MOGANED utils.py:39-47); these operators are
the temporal algebra its KG consumers run off-engine, built Spark-first:

- asof_join: union-and-carry-forward formulation. Facts and probes are
  tagged, unioned, and scanned ONCE per key ordered by (ts, tag) with a
  last-non-null window — one shuffle on the key, no range join, no
  per-probe scan. The naive theta-join (probe.ts >= fact.ts + argmax)
  is O(facts x probes) per key and dies at web scale; this formulation
  is linear in (facts + probes) after the shuffle and survives 10^12
  rows. Its driver oracle is DuckDB's NATIVE ASOF JOIN — a genuinely
  different algorithm (per-key binary search), so agreement is a hard
  cross-engine check, not the same plan twice.
- fact_validity_intervals: gaps-and-islands change-point compression.
  Consecutive re-assertions of the same obj collapse into one interval;
  an interval closes when the obj changes ([valid_from, valid_to),
  valid_to NULL = still current). Three windows over ONE partitioning
  of the same key prefix — a single shuffle end to end.

Both require the caller to feed at most one fact per (key, ts): ties at
identical timestamps have no defined order. Resolve upstream with the
latest-wins tie-break (kg_fact_latest's (ts, url) rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

_TAG = "_is_probe"


def asof_join(
    facts: DataFrame,
    probes: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """For every probe row, attach the `value_cols` of the most recent
    fact with the same `keys` and fact.ts <= probe.ts (inclusive).
    Probes with no prior fact keep NULL values (left-asof semantics).

    Whole-ROW semantics: the latest fact's values are attached as one
    unit (a struct carried by the window), exactly like a native ASOF
    join attaches the matched row. Carrying each value column
    independently with last(ignorenulls) would (a) resurrect an older
    non-NULL value when the latest fact's value is genuinely NULL and
    (b) stitch columns from DIFFERENT facts when one fact has a NULL
    field — rows that never existed, and a divergence from the DuckDB
    native-ASOF oracle.

    Probe columns other than keys/ts pass through unchanged; they must
    not collide with `value_cols`. One shuffle (the window partition);
    at same-ts ties the fact sorts before the probe, so a fact is
    visible to probes at its own timestamp — matching DuckDB's
    `ASOF JOIN ON probe.ts >= fact.ts`.
    """
    overlap = set(value_cols) & set(probes.columns)
    if overlap:
        raise ValueError(f"probe columns collide with value_cols: {overlap}")
    probe_extra = [
        c for c in probes.columns if c not in keys and c != ts_col
    ]
    probe_types = {f.name: f.dataType for f in probes.schema.fields}

    vstruct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    vtype = facts.select(vstruct.alias("_v")).schema[0].dataType
    f_side = facts.select(
        *keys,
        ts_col,
        # non-NULL struct per fact row, even when every field is NULL —
        # that is what makes last(ignorenulls) pick the latest FACT
        # rather than the latest non-NULL value per column
        vstruct.alias("_vals"),
        *[
            F.lit(None).cast(probe_types[c]).alias(c)
            for c in probe_extra
        ],
        F.lit(0).alias(_TAG),
    )
    p_side = probes.select(
        *keys,
        ts_col,
        F.lit(None).cast(vtype).alias("_vals"),
        *probe_extra,
        F.lit(1).alias(_TAG),
    )
    w = (
        W.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col(_TAG).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = f_side.unionByName(p_side).withColumn(
        "_vals", F.last("_vals", ignorenulls=True).over(w)
    )
    return out.filter(F.col(_TAG) == 1).select(
        *keys,
        ts_col,
        *[F.col(f"_vals.{c}").alias(c) for c in value_cols],
        *probe_extra,
    )


def fact_validity_intervals(
    facts: DataFrame,
    keys: list[str],
    ts_col: str,
    obj_col: str,
) -> DataFrame:
    """Compress each key's assertion history into validity intervals.

    Input: one fact per (keys, ts). Output one row per maximal run of
    consecutive assertions of the same `obj_col`:
      (keys..., obj, valid_from, valid_to, n_assertions)
    valid_from = first assertion ts of the run; valid_to = the ts at
    which a DIFFERENT obj was next asserted (NULL while still current);
    n_assertions = how many times the run re-asserted the value.

    Standard gaps-and-islands: lag-based change flag -> running-sum
    segment id -> group -> lead for the closing bound. All three
    windows share the key partitioning, so Catalyst plans ONE exchange.
    """
    w_ord = W.partitionBy(*keys).orderBy(ts_col)
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    seg = (
        facts.withColumn(
            "_chg",
            F.when(
                F.lag(obj_col).over(w_ord).eqNullSafe(F.col(obj_col)),
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        .withColumn("_seg", F.sum("_chg").over(w_run))
    )
    grouped = seg.groupBy(*keys, "_seg").agg(
        F.min(obj_col).alias(obj_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_assertions"),
    )
    w_next = W.partitionBy(*keys).orderBy("valid_from")
    return grouped.withColumn(
        "valid_to", F.lead("valid_from").over(w_next)
    ).drop("_seg")


def fact_diff(
    facts: DataFrame,
    keys: list[str],
    ts_col: str,
    obj_col: str,
    t_old: int,
    t_new: int,
) -> DataFrame:
    """KG diff between two crawl times: for every key, the value in
    effect at t_old vs at t_new ("what changed between these two
    snapshots?"). Returns only changed keys, with change kind:
      (keys..., obj_old, obj_new, change in {'added', 'changed'})

    One pass, ONE shuffle: both as-of values come from a single groupBy
    with FILTERed max_by aggregates — no window, no self-join, no two
    as-of evaluations. obj_old NULL = the fact did not exist yet at
    t_old ('added' by t_new). There is no 'removed': facts never expire
    in this model, they are superseded, so a key with obj_new NULL has
    obj_old NULL too (t_old < t_new) and is filtered out as unchanged.
    A NULL obj is NOT an assertion — such rows are dropped before the
    aggregate (otherwise a NULL asserted between t_old and t_new would
    surface as change='changed' with obj_new NULL, violating the
    invariant above). Same at-most-one-fact-per-(key, ts) requirement
    as asof_join (resolve ties upstream, kg_fact_latest's rule).
    """
    if not t_old < t_new:
        raise ValueError("t_old must be < t_new")
    out = facts.filter(F.col(obj_col).isNotNull()).groupBy(*keys).agg(
        F.expr(
            f"max_by({obj_col}, {ts_col})"
            f" FILTER (WHERE {ts_col} <= {t_old})"
        ).alias("obj_old"),
        F.expr(
            f"max_by({obj_col}, {ts_col})"
            f" FILTER (WHERE {ts_col} <= {t_new})"
        ).alias("obj_new"),
    )
    return out.filter(
        ~F.col("obj_old").eqNullSafe(F.col("obj_new"))
    ).withColumn(
        "change",
        F.when(F.col("obj_old").isNull(), F.lit("added")).otherwise(
            F.lit("changed")
        ),
    )


def activity_bursts(
    events: DataFrame,
    keys: list[str],
    day_col: str,
    trailing: int = 7,
) -> DataFrame:
    """Trending/burst detection: per (keys, day) activity vs the
    trailing `trailing`-day baseline, as an exact integer ratio.

    -> (keys..., day, n_events, trailing_sum, burst_ratio_e6) where
    burst_ratio_e6 = (1e6 * n_events * trailing) div max(trailing_sum,
    1): the multiple of the trailing DAILY AVERAGE this day represents
    (absent days count as zero activity — the average divides by
    `trailing`, not by days present). Day 1 of a key has trailing_sum
    0, so its ratio is 1e6 * n_events * trailing — new entities surface
    as maximal bursts, the behavior a trending feed wants.

    Scale shape: ONE shuffle total. The daily rollup groupBy's on
    (keys, day); the trailing window shares that exact partitioning
    (partitionBy keys, orderBy day) so Catalyst plans a single
    Exchange. Crucially the baseline is a RANGE window over the
    integer day — gaps contribute zero WITHOUT densifying key x day
    (the cross-join densification a naive rows-window needs is
    keys*days rows: 3.6e11 at 1e9 entities x 1 year — dead on
    arrival). `day_col` must be integer-ordered (epoch day).
    """
    if trailing < 1:
        raise ValueError("trailing must be >= 1")
    # Two exchanges BY DESIGN: pre-partitioning on keys alone would
    # collapse the plan to one exchange (subset rule), but that ships
    # every RAW event over the wire; this shape map-side-combines the
    # daily counts first, so exchange #1 carries partial counts and
    # exchange #2 only the (keys, day) rollup — orders of magnitude
    # less network at web scale. Plan-gated in tests/test_plans.py.
    daily = events.groupBy(*keys, day_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    w = (
        W.partitionBy(*keys)
        .orderBy(day_col)
        .rangeBetween(-trailing, -1)
    )
    return daily.withColumn(
        "trailing_sum",
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("long"),
    ).withColumn(
        "burst_ratio_e6",
        F.expr(
            f"(1000000 * n_events * {trailing})"
            " div greatest(trailing_sum, 1)"
        ).cast("long"),
    )


def sessionize(
    events: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: int,
) -> DataFrame:
    """Gap-based sessionization: consecutive events of a key belong to
    one session while the inter-event gap is <= `gap` (same ts units,
    integer epoch seconds); a larger gap opens a new session.

    -> (keys..., session_seq, session_start, session_end, n_events)
    with session_seq the per-key 1-based session index — deterministic,
    so (keys..., session_seq) is a stable session id across engines.

    Scale shape: the canonical gaps-and-islands pair of windows over
    ONE partitioning (lag flag -> running count), then a groupBy on the
    same key prefix — Catalyst plans a single Exchange for all three.
    Equal timestamps tie-break by ordering on ts alone (same session:
    gap 0 <= gap), so duplicate-ts rows never split a session and the
    result is order-independent.
    """
    if gap < 0:
        raise ValueError("gap must be >= 0")
    w_ord = W.partitionBy(*keys).orderBy(ts_col)
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = events.withColumn(
        "_new",
        F.when(
            F.col(ts_col) - F.lag(ts_col).over(w_ord) > gap, 1
        ).otherwise(0),
    ).withColumn(
        "session_seq",
        (F.sum("_new").over(w_run) + 1).cast("long"),
    )
    return flagged.groupBy(*keys, "session_seq").agg(
        F.min(ts_col).cast("long").alias("session_start"),
        F.max(ts_col).cast("long").alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def funnel(
    events: DataFrame,
    keys: list[str],
    pred_col: str,
    ts_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered-funnel analysis: for each key, the earliest time it
    completed step 1, then the earliest step-2 event STRICTLY after
    that, and so on — "clicked, then purchased, then reviewed" with
    enforced order. -> (keys..., t_1..t_n, steps_completed); t_i is
    NULL (and stays NULL downstream) once a step is unmet. Every key
    with at least one step-1 event appears.

    Scale shape: one filtered min-agg for step 1, then per later step
    ONE join of the (key, t_prev) frame against that step's events
    plus a conditional min-agg — no window over the event stream, no
    per-key event collection; each step's shuffle is keyed the same
    way so AQE reuses exchanges. The earliest-completion semantics
    (greedy) is the standard funnel definition and is deterministic.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        *keys, F.col(pred_col).alias("_p"), F.col(ts_col).alias("_ts")
    )
    cur = (
        ev.filter(F.col("_p") == steps[0])
        .groupBy(*keys)
        .agg(F.min("_ts").alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.filter(F.col("_p") == step)
        prev_t = f"t_{i - 1}"
        cur = (
            cur.join(nxt, keys, "left")
            .groupBy(*keys, *[f"t_{j}" for j in range(1, i)])
            .agg(
                F.min(
                    F.when(
                        F.col("_ts") > F.col(prev_t), F.col("_ts")
                    )
                ).alias(f"t_{i}")
            )
        )
    done = sum(
        F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return cur.withColumn("steps_completed", done.cast("long"))
