"""Temporal fact operators: brute-force oracles on random histories,
plus a DuckDB NATIVE ASOF JOIN cross-check — the same hard cross-engine
property the driver contract relies on (two different algorithms, one
answer)."""

from __future__ import annotations

import random

import duckdb
import pytest

from deepee_spark.operators.temporal import asof_join, fact_validity_intervals


@pytest.fixture(scope="module")
def history(spark):
    rng = random.Random(42)
    facts = [
        (k, t, f"v{k}_{t}")
        for k in range(8)
        for t in sorted(rng.sample(range(100), 12))
    ]
    # probes deliberately cover: keys with no facts (k=8,9), ts before
    # any fact, ts at exactly a fact's ts (inclusive boundary)
    probes = [
        (rng.randrange(10), rng.randrange(110), i) for i in range(200)
    ]
    fdf = spark.createDataFrame(facts, "k: long, ts: long, val: string")
    pdf = spark.createDataFrame(
        probes, "k: long, ts: long, probe_id: long"
    )
    return facts, probes, fdf, pdf


def test_asof_join_bruteforce(spark, history):
    facts, probes, fdf, pdf = history
    got = {
        (r.k, r.ts, r.probe_id): r.val
        for r in asof_join(fdf, pdf, ["k"], "ts", ["val"]).collect()
    }
    fmap: dict[int, list[tuple[int, str]]] = {}
    for k, t, v in facts:
        fmap.setdefault(k, []).append((t, v))
    want = {}
    for k, t, pid in probes:
        cand = [(ft, v) for ft, v in fmap.get(k, []) if ft <= t]
        want[(k, t, pid)] = max(cand)[1] if cand else None
    assert got == want


def test_asof_join_matches_duckdb_native_asof(spark, history):
    facts, probes, fdf, pdf = history
    got = {
        (r.k, r.ts, r.probe_id): r.val
        for r in asof_join(fdf, pdf, ["k"], "ts", ["val"]).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE f(k BIGINT, ts BIGINT, val VARCHAR)")
    con.executemany("INSERT INTO f VALUES (?,?,?)", facts)
    con.execute("CREATE TABLE p(k BIGINT, ts BIGINT, probe_id BIGINT)")
    con.executemany("INSERT INTO p VALUES (?,?,?)", probes)
    duck = {
        (r[0], r[1], r[2]): r[3]
        for r in con.execute(
            "SELECT p.k, p.ts, p.probe_id, f.val FROM p"
            " ASOF LEFT JOIN f ON p.k = f.k AND p.ts >= f.ts"
        ).fetchall()
    }
    assert got == duck


def test_asof_join_rejects_value_collision(spark, history):
    _, _, fdf, pdf = history
    with pytest.raises(ValueError, match="collide"):
        asof_join(fdf, pdf.withColumnRenamed("probe_id", "val"),
                  ["k"], "ts", ["val"])


def test_fact_validity_intervals_bruteforce(spark):
    rng = random.Random(7)
    # t // 25 buckets the value so consecutive assertions repeat -> runs
    facts = [
        (k, t, f"v{t // 25}")
        for k in range(4)
        for t in sorted(rng.sample(range(100), 15))
    ]
    fdf = spark.createDataFrame(facts, "k: long, ts: long, val: string")
    rows = fact_validity_intervals(fdf, ["k"], "ts", "val").collect()
    bymap: dict[int, list[tuple[int, str]]] = {}
    for k, t, v in facts:
        bymap.setdefault(k, []).append((t, v))
    want = []
    for k, seq in bymap.items():
        seq.sort()
        runs: list[list] = []
        for t, v in seq:
            if runs and runs[-1][0] == v:
                runs[-1][2] += 1
            else:
                runs.append([v, t, 1])
        for i, (v, t0, n) in enumerate(runs):
            t1 = runs[i + 1][1] if i + 1 < len(runs) else None
            want.append((k, v, t0, t1, n))
    got = sorted(
        (r.k, r.val, r.valid_from, r.valid_to, r.n_assertions)
        for r in rows
    )
    assert got == sorted(want)
    # open intervals: exactly one per key (the current value)
    assert sum(1 for *_rest, t1, _n in got if t1 is None) == 4


def test_fact_validity_intervals_single_run(spark):
    fdf = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "a"), (1, 30, "a")],
        "k: long, ts: long, val: string",
    )
    rows = fact_validity_intervals(fdf, ["k"], "ts", "val").collect()
    assert [(r.val, r.valid_from, r.valid_to, r.n_assertions)
            for r in rows] == [("a", 10, None, 3)]


def test_fact_diff_bruteforce(spark, history):
    from deepee_spark.operators.temporal import fact_diff

    facts, _, fdf, _ = history
    t_old, t_new = 30, 70
    # key 99 first appears between the snapshots -> the 'added' case
    late = [(99, 55, "late_a"), (99, 60, "late_b")]
    facts = facts + late
    fdf = fdf.unionByName(
        fdf.sparkSession.createDataFrame(
            late, "k: long, ts: long, val: string"
        )
    )
    fmap: dict[int, list[tuple[int, str]]] = {}
    for k, t, v in facts:
        fmap.setdefault(k, []).append((t, v))
    want = {}
    for k, hist in fmap.items():
        old = max(((t, v) for t, v in hist if t <= t_old), default=None)
        new = max(((t, v) for t, v in hist if t <= t_new), default=None)
        vo = old[1] if old else None
        vn = new[1] if new else None
        if vo != vn:
            want[k] = (vo, vn, "added" if vo is None else "changed")
    got = {
        r.k: (r.obj_old, r.obj_new, r.change)
        for r in fact_diff(fdf, ["k"], "ts", "val", t_old, t_new).collect()
    }
    assert got == want
    assert any(c == "added" for *_v, c in want.values())


def test_fact_diff_rejects_bad_order(spark, history):
    from deepee_spark.operators.temporal import fact_diff

    _, _, fdf, _ = history
    with pytest.raises(ValueError, match="t_old"):
        fact_diff(fdf, ["k"], "ts", "val", 70, 30)


# ---------------------------------------------------------------------------
# activity_bursts


def _brute_bursts(rows, trailing):
    """rows: (key, day) one per event."""
    from collections import Counter

    daily = Counter(rows)
    out = set()
    for (key, day), n in daily.items():
        tsum = sum(
            daily.get((key, d), 0)
            for d in range(day - trailing, day)
        )
        ratio = (1_000_000 * n * trailing) // max(tsum, 1)
        out.add((key, day, n, tsum, ratio))
    return out


def test_activity_bursts_bruteforce(spark):
    import random

    from deepee_spark.operators.temporal import activity_bursts

    rng = random.Random(11)
    rows = [
        (f"u{rng.randrange(6)}", rng.randrange(1, 30))
        for _ in range(400)
    ]
    # a planted burst: u9 silent for 20 days then 50 events on day 25
    rows += [("u9", 2)] * 3 + [("u9", 25)] * 50
    df = spark.createDataFrame(rows, "user: string, day: long")
    got = {
        (r.user, r.day, r.n_events, r.trailing_sum, r.burst_ratio_e6)
        for r in activity_bursts(df, ["user"], "day", trailing=7).collect()
    }
    assert got == _brute_bursts(rows, 7)
    # the planted burst: zero trailing -> ratio = 1e6 * 50 * 7
    assert ("u9", 25, 50, 0, 1_000_000 * 50 * 7) in got


def test_activity_bursts_gap_days_count_as_zero(spark):
    from deepee_spark.operators.temporal import activity_bursts

    # 7 events on day 1, then one on day 5: trailing covers days -2..4,
    # so trailing_sum = 7 (the gap days 2-4 contribute zero, NOT
    # an average over present rows only)
    rows = [("k", 1)] * 7 + [("k", 5)]
    df = spark.createDataFrame(rows, "k: string, day: long")
    by_day = {
        r.day: (r.trailing_sum, r.burst_ratio_e6)
        for r in activity_bursts(df, ["k"], "day", trailing=7).collect()
    }
    assert by_day[1] == (0, 7_000_000 * 7)
    # day 5: 1 event vs trailing avg 7/7=1 -> ratio 1.0
    assert by_day[5] == (7, 1_000_000)


def test_activity_bursts_rejects_bad_trailing(spark):
    import pytest

    from deepee_spark.operators.temporal import activity_bursts

    df = spark.createDataFrame([("k", 1)], "k: string, day: long")
    with pytest.raises(ValueError):
        activity_bursts(df, ["k"], "day", trailing=0)


# ---------------------------------------------------------------------------
# sessionize


def _brute_sessions(rows, gap):
    """rows: (key, ts)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, ts in rows:
        by_key[k].append(ts)
    out = set()
    for k, tss in by_key.items():
        tss.sort()
        seq, start, prev, n = 1, tss[0], tss[0], 0
        for ts in tss:
            if ts - prev > gap:
                out.add((k, seq, start, prev, n))
                seq, start, n = seq + 1, ts, 0
            n += 1
            prev = ts
        out.add((k, seq, start, prev, n))
    return out


def test_sessionize_bruteforce(spark):
    import random

    from deepee_spark.operators.temporal import sessionize

    rng = random.Random(3)
    rows = [
        (f"u{rng.randrange(5)}", rng.randrange(0, 5000))
        for _ in range(300)
    ]
    # duplicate timestamps must never split a session
    rows += [("u7", 100), ("u7", 100), ("u7", 100), ("u7", 2000)]
    df = spark.createDataFrame(rows, "user: string, ts: long")
    got = {
        (r.user, r.session_seq, r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, ["user"], "ts", gap=600).collect()
    }
    assert got == _brute_sessions(rows, 600)
    assert ("u7", 1, 100, 100, 3) in got
    assert ("u7", 2, 2000, 2000, 1) in got


def test_sessionize_one_exchange_rejects_bad_gap(spark):
    import pytest

    from deepee_spark.operators.temporal import sessionize
    from tests.test_plans import formatted_plan

    df = spark.createDataFrame(
        [("u", i * 100) for i in range(50)], "user: string, ts: long"
    )
    plan = formatted_plan(sessionize(df, ["user"], "ts", gap=250))
    assert "SinglePartition" not in plan, plan
    assert plan.count("Exchange (") == 1, plan
    with pytest.raises(ValueError):
        sessionize(df, ["user"], "ts", gap=-1)


# ---------------------------------------------------------------------------
# funnel


def _brute_funnel(rows, steps):
    """rows: (key, pred, ts). Greedy earliest-completion funnel."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, p, ts in rows:
        by_key[k].append((p, ts))
    out = {}
    for k, evs in by_key.items():
        ts1 = [t for p, t in evs if p == steps[0]]
        if not ts1:
            continue
        times = [min(ts1)]
        for step in steps[1:]:
            if times[-1] is None:
                times.append(None)
                continue
            cands = [t for p, t in evs if p == step and t > times[-1]]
            times.append(min(cands) if cands else None)
        out[k] = tuple(times) + (sum(t is not None for t in times),)
    return out


def test_funnel_bruteforce(spark):
    import random

    from deepee_spark.operators.temporal import funnel

    rng = random.Random(21)
    preds = ["view", "click", "purchase"]
    rows = [
        (f"u{rng.randrange(12)}", rng.choice(preds), rng.randrange(1000))
        for _ in range(400)
    ]
    # a user who purchases BEFORE clicking: step 3 must stay unmet
    rows += [("ux", "view", 10), ("ux", "purchase", 5), ("ux", "click", 20)]
    df = spark.createDataFrame(rows, "user: string, pred: string, ts: long")
    steps = ["view", "click", "purchase"]
    exp = _brute_funnel(rows, steps)
    got = {
        r.user: (r.t_1, r.t_2, r.t_3, r.steps_completed)
        for r in funnel(df, ["user"], "pred", "ts", steps).collect()
    }
    assert got == exp
    assert got["ux"][:3] == (10, 20, None) and got["ux"][3] == 2


def test_funnel_rejects_empty_steps(spark):
    import pytest

    from deepee_spark.operators.temporal import funnel

    df = spark.createDataFrame([("u", "a", 1)], "user: string, pred: string, ts: long")
    with pytest.raises(ValueError):
        funnel(df, ["user"], "pred", "ts", [])
