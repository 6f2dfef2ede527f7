"""Change-rate refresh scheduling (operators/refresh) vs a
single-process estimator and the DuckDB twin."""

from __future__ import annotations

import datetime as dt

import duckdb

from deepee_spark.operators.refresh import (
    SMOOTH_S,
    refresh_priorities,
    refresh_priorities_oracle_sql,
)

T_REF = "2026-08-01 00:00:00"

_OBS = [
    # volatile page: changes on every fetch
    ("u/hot", "2026-07-01 00:00:00", "h1", 1),
    ("u/hot", "2026-07-02 00:00:00", "h2", 2),
    ("u/hot", "2026-07-03 00:00:00", "h3", 3),
    # static page, many fetches, no change
    ("u/static", "2026-07-01 00:00:00", "s", 4),
    ("u/static", "2026-07-10 00:00:00", "s", 5),
    ("u/static", "2026-07-20 00:00:00", "s", 6),
    # single fetch
    ("u/once", "2026-07-15 12:00:00", "x", 7),
    # change then revert (2 changes: s->t, t->s)
    ("u/flap", "2026-07-01 00:00:00", "s", 8),
    ("u/flap", "2026-07-02 00:00:00", "t", 9),
    ("u/flap", "2026-07-03 00:00:00", "s", 10),
    # same-timestamp pair, tie-broken by obs_id
    ("u/tie", "2026-07-05 00:00:00", "a", 11),
    ("u/tie", "2026-07-05 00:00:00", "b", 12),
]


def _ref():
    by_url: dict[str, list] = {}
    for u, ts, h, i in _OBS:
        by_url.setdefault(u, []).append(
            (dt.datetime.fromisoformat(ts), i, h)
        )
    t_ref = dt.datetime.fromisoformat(T_REF)
    out = {}
    for u, rows in by_url.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        hashes = [h for _, _, h in rows]
        changes = sum(1 for a, b in zip(hashes, hashes[1:]) if a != b)
        span = int((rows[-1][0] - rows[0][0]).total_seconds())
        stale = int((t_ref - rows[-1][0]).total_seconds())
        rate = (changes + 1) / (span + SMOOTH_S)
        out[u] = (
            len(rows),
            changes,
            round(rate, 9),
            stale,
            round(rate * stale, 6),
        )
    return out


def _df(spark):
    return spark.createDataFrame(
        [(u, dt.datetime.fromisoformat(ts), h, i) for u, ts, h, i in _OBS],
        "url string, fetch_ts timestamp, content_hash string, obs_id long",
    )


def test_vs_reference(spark):
    got = {
        r.url: (r.n_fetches, r.n_changes, r.rate, r.staleness_s, r.priority)
        for r in refresh_priorities(_df(spark), T_REF).collect()
    }
    assert got == _ref()
    # semantic ordering: hot page outranks static page
    assert got["u/hot"][4] > got["u/static"][4]
    # single fetch: zero changes, finite smoothed rate
    assert got["u/once"][1] == 0 and got["u/once"][2] > 0
    assert got["u/flap"][1] == 2
    assert got["u/tie"][1] == 1


def test_duckdb_twin(spark):
    con = duckdb.connect()
    src = "SELECT * FROM (VALUES " + ",".join(
        f"($${u}$$, TIMESTAMP '{ts}', $${h}$$, {i})" for u, ts, h, i in _OBS
    ) + ") t(url, fetch_ts, content_hash, obs_id)"
    oracle = {
        r[0]: tuple(r[1:])
        for r in con.execute(
            refresh_priorities_oracle_sql(src, T_REF)
        ).fetchall()
    }
    got = {
        r.url: (r.n_fetches, r.n_changes, r.rate, r.staleness_s, r.priority)
        for r in refresh_priorities(_df(spark), T_REF).collect()
    }
    assert got == oracle


def test_window_is_url_partitioned(spark):
    plan = (
        refresh_priorities(_df(spark), T_REF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.split("\n"):
        if "lag(" in line:
            assert "windowspecdefinition(url" in line, line
