"""Graph analytics: brute-force oracles on small random graphs, plus a
DuckDB check that the unrolled-CTE oracle generators reproduce the Spark
results bit-for-bit (the property the driver contract relies on)."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import duckdb
import pytest

from deepee_spark.operators.graph import (
    PR_SCALE,
    bfs_distances,
    bfs_oracle_sql,
    co_neighbors,
    pagerank_int,
    pagerank_oracle_sql,
    triangle_count,
)


def _rand_edges(n_nodes: int, n_edges: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    out = set()
    while len(out) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            out.add((a, b))
    return sorted(out)


@pytest.fixture(scope="module")
def edges(spark):
    rows = _rand_edges(40, 160, seed=7)
    return spark.createDataFrame(rows, "src: long, dst: long").cache()


def test_co_neighbors_bruteforce(spark, edges):
    rows = {(r.src, r.dst) for r in edges.collect()}
    by_dst = defaultdict(set)
    for s, d in rows:
        by_dst[d].add(s)
    want = defaultdict(int)
    for srcs in by_dst.values():
        ss = sorted(srcs)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                want[(a, b)] += 1
    got = {(r.a, r.b): r.n_shared for r in co_neighbors(edges).collect()}
    assert got == dict(want)


def test_co_neighbors_fanout_cap(spark, edges):
    # with the cap at 1 no dst is shared, so no pairs survive
    assert co_neighbors(edges, max_fanout=1).count() == 0
    capped = co_neighbors(edges, max_fanout=3)
    full = co_neighbors(edges)
    assert capped.count() < full.count()


def test_triangle_count_bruteforce(spark, edges):
    und = set()
    for r in edges.collect():
        a, b = sorted((r.src, r.dst))
        und.add((a, b))
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want = defaultdict(int)
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # each triangle once: a < b < c
                for v in (a, b, c):
                    want[v] += 1
    got = {r.node: r.n_triangles for r in triangle_count(edges).collect()}
    assert got == dict(want)
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def _pagerank_py(rows, iters=3, damping_pct=85):
    e = sorted(set(rows))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    n = len(nodes)
    r0 = PR_SCALE // n
    tp = ((100 - damping_pct) * r0) // 100
    outdeg = defaultdict(int)
    for a, _ in e:
        outdeg[a] += 1
    rank = {v: r0 for v in nodes}
    for _ in range(iters):
        s = defaultdict(int)
        for a, b in e:
            s[b] += rank[a] // outdeg[a]
        rank = {v: tp + (damping_pct * s[v]) // 100 for v in nodes}
    return rank


def test_pagerank_exact_integer(spark, edges):
    rows = [(r.src, r.dst) for r in edges.collect()]
    want = _pagerank_py(rows)
    got = {r.node: r.rank for r in pagerank_int(edges, iters=3).collect()}
    assert got == want  # EXACT, not approx: integer arithmetic end to end
    # mass sanity: total rank stays within a teleport-rounding band
    assert 0 < sum(got.values()) <= PR_SCALE


def test_pagerank_duckdb_oracle_matches(spark, edges):
    got = {r.node: r.rank for r in pagerank_int(edges, iters=3).collect()}
    pdf = edges.toPandas()
    con = duckdb.connect()
    con.register("edges_tbl", pdf)
    sql = pagerank_oracle_sql("SELECT src, dst FROM edges_tbl", iters=3)
    want = dict(con.execute(sql).fetchall())
    assert got == want


def _bfs_py(rows, seeds, max_hops=3):
    adj = defaultdict(set)
    for a, b in rows:
        adj[a].add(b)
        adj[b].add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] == max_hops:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_bruteforce_and_oracle(spark, edges):
    rows = [(r.src, r.dst) for r in edges.collect()]
    seeds = [0, 1]
    want = _bfs_py(rows, seeds, max_hops=3)
    seeds_df = spark.createDataFrame([(s,) for s in seeds], "node: long")
    got = {
        r.node: r.dist
        for r in bfs_distances(edges, seeds_df, max_hops=3).collect()
    }
    assert got == want
    con = duckdb.connect()
    con.register("edges_tbl", edges.toPandas())
    sql = bfs_oracle_sql(
        "SELECT src, dst FROM edges_tbl",
        "SELECT UNNEST([0, 1]) AS node",
        max_hops=3,
    )
    assert dict(con.execute(sql).fetchall()) == want


def test_bfs_early_exhaustion(spark):
    # a 2-node path exhausts at hop 1; hops 2..5 must not loop or crash
    e = spark.createDataFrame([(1, 2)], "src: long, dst: long")
    seeds = spark.createDataFrame([(1,)], "node: long")
    got = {r.node: r.dist for r in bfs_distances(e, seeds, max_hops=5).collect()}
    assert got == {1: 0, 2: 1}


def test_neighbor_jaccard_bruteforce(spark, edges):
    from deepee_spark.operators.graph import neighbor_jaccard

    rows = {(r.src, r.dst) for r in edges.collect()}
    nbrs = defaultdict(set)
    for s, d in rows:
        nbrs[s].add(d)
    srcs = sorted(nbrs)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(nbrs[a] & nbrs[b])
            if inter:
                union = len(nbrs[a] | nbrs[b])
                want[(a, b)] = (
                    inter,
                    len(nbrs[a]),
                    len(nbrs[b]),
                    (1_000_000 * inter) // union,
                )
    got = {
        (r.a, r.b): (r.n_shared, r.deg_a, r.deg_b, r.jaccard_e6)
        for r in neighbor_jaccard(edges).collect()
    }
    assert got == want


def test_pagerank_dangling_selfloop_singleton(spark):
    """Edge cases the random graph misses: a dangling node (outdeg 0 —
    its mass is dropped, both engines agree), a self-loop (feeds
    itself), and a single-edge graph."""
    cases = [
        [(1, 2), (2, 1), (3, 1)],        # 3 is a source, 1 has indeg 2
        [(1, 2)],                        # 2 is dangling
        [(1, 2), (2, 3), (4, 4)],        # self-loop at 4; 3 dangling
    ]
    for rows in cases:
        e = spark.createDataFrame(rows, "src: long, dst: long")
        got = {r.node: r.rank for r in pagerank_int(e, iters=3).collect()}
        assert got == _pagerank_py(rows), rows
        con = duckdb.connect()
        con.register("edges_tbl", e.toPandas())
        sql = pagerank_oracle_sql("SELECT src, dst FROM edges_tbl", iters=3)
        assert dict(con.execute(sql).fetchall()) == got, rows


def test_bfs_disconnected_component_unreached(spark):
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src: long, dst: long"
    )
    seeds = spark.createDataFrame([(1,)], "node: long")
    got = {r.node: r.dist for r in bfs_distances(e, seeds, max_hops=5).collect()}
    assert got == {1: 0, 2: 1, 3: 2}  # the 10-11 island stays unreached


def test_pagerank_weighted_exact(spark):
    from deepee_spark.operators.graph import (
        pagerank_int_weighted,
        pagerank_weighted_oracle_sql,
    )

    rng = random.Random(11)
    rows = [
        (a, b, rng.randrange(1, 9))
        for a, b in _rand_edges(30, 100, seed=11)
    ]
    e = spark.createDataFrame(rows, "src: long, dst: long, weight: long")

    # pure-python twin of the weighted recurrence
    w = {}
    for a, b, x in rows:
        w[(a, b)] = w.get((a, b), 0) + x
    nodes = sorted({a for a, _ in w} | {b for _, b in w})
    r0 = PR_SCALE // len(nodes)
    tp = (15 * r0) // 100
    outw = defaultdict(int)
    for (a, _), x in w.items():
        outw[a] += x
    rank = {v: r0 for v in nodes}
    for _ in range(3):
        s = defaultdict(int)
        for (a, b), x in w.items():
            s[b] += (rank[a] * x) // outw[a]
        rank = {v: tp + (85 * s[v]) // 100 for v in nodes}

    got = {
        r.node: r.rank for r in pagerank_int_weighted(e, iters=3).collect()
    }
    assert got == rank

    con = duckdb.connect()
    con.register("edges_tbl", e.toPandas())
    sql = pagerank_weighted_oracle_sql(
        "SELECT src, dst, weight FROM edges_tbl", iters=3
    )
    assert dict(con.execute(sql).fetchall()) == rank


def _peel(edge_list: list[tuple[int, int]], k: int):
    und = {tuple(sorted(e)) for e in edge_list}
    alive: set[int] = set()
    for a, b in und:
        alive |= {a, b}
    while True:
        deg = {n: 0 for n in alive}
        for a, b in und:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        nxt = {n for n in alive if deg[n] >= k}
        if nxt == alive:
            return {(n, deg[n]) for n in alive}
        alive = nxt


@pytest.fixture(scope="module")
def sparse_edges(spark):
    # sparse enough that k=2 genuinely peels and k=3 peels to empty
    rows = _rand_edges(60, 90, seed=11)
    return rows, spark.createDataFrame(rows, "src: long, dst: long").cache()


def test_kcore_bruteforce(spark, sparse_edges):
    from deepee_spark.operators.graph import kcore

    rows, edf = sparse_edges
    for k in (2, 3):
        got = {(r.node, r.deg) for r in kcore(edf, k).collect()}
        assert got == _peel(rows, k), f"k={k}"


def test_kcore_duckdb_oracle_matches(spark, sparse_edges):
    from deepee_spark.operators.graph import kcore, kcore_oracle_sql

    rows, edf = sparse_edges
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    for k in (2, 3):
        got = {(r.node, r.deg) for r in kcore(edf, k).collect()}
        oracle = {
            (r[0], r[1])
            for r in con.execute(
                kcore_oracle_sql("SELECT src, dst FROM e", k, rounds=12)
            ).fetchall()
        }
        assert got == oracle, f"k={k}"


def test_kcore_rejects_nonpositive_rounds(spark, sparse_edges):
    from deepee_spark.operators.graph import kcore

    _, edf = sparse_edges
    with pytest.raises(ValueError):
        kcore(edf, 2, max_rounds=0)


def test_kcore_dense_graph(spark, edges):
    # the dense fixture barely peels at k=4: the converged core must
    # still match the reference peel exactly
    from deepee_spark.operators.graph import kcore

    rows = [(r.src, r.dst) for r in edges.collect()]
    got = {(r.node, r.deg) for r in kcore(edges, 4).collect()}
    assert got == _peel(rows, 4)


def test_pagerank_seeded_exact(spark, edges):
    from deepee_spark.operators.graph import (
        pagerank_int_seeded,
        pagerank_seeded_oracle_sql,
    )

    dedges = sorted({(r.src, r.dst) for r in edges.collect()})
    # every 7th id as seed, some outside the graph's node set
    seeds = [(n,) for n in range(0, 50, 7)]
    sdf = spark.createDataFrame(seeds, "node: long")
    nodes = sorted({x for e in dedges for x in e})
    outdeg: dict[int, int] = {}
    for s, _ in dedges:
        outdeg[s] = outdeg.get(s, 0) + 1
    sset = {s for (s,) in seeds if s in nodes}
    r0 = PR_SCALE // len(sset)
    tp = {n: ((100 - 85) * r0) // 100 if n in sset else 0 for n in nodes}
    rank = {n: r0 if n in sset else 0 for n in nodes}
    for _ in range(3):
        agg = {n: 0 for n in nodes}
        for s, d in dedges:
            agg[d] += rank[s] // outdeg[s]
        rank = {n: tp[n] + (85 * agg[n]) // 100 for n in nodes}
    got = {
        r.node: r.rank
        for r in pagerank_int_seeded(edges, sdf, iters=3).collect()
    }
    assert got == rank

    con = duckdb.connect()
    con.execute("CREATE TABLE et(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO et VALUES (?,?)", dedges)
    con.execute("CREATE TABLE sdt(node BIGINT)")
    con.executemany("INSERT INTO sdt VALUES (?)", seeds)
    sql = pagerank_seeded_oracle_sql(
        "SELECT src, dst FROM et", "SELECT node FROM sdt", iters=3
    )
    assert dict(con.execute(sql).fetchall()) == rank


def test_resource_allocation_bruteforce(spark, edges):
    from deepee_spark.operators.graph import resource_allocation

    dedges = sorted({(r.src, r.dst) for r in edges.collect()})
    by_dst = defaultdict(set)
    for s, d in dedges:
        by_dst[d].add(s)
    want: dict[tuple[int, int], tuple[int, int]] = {}
    for d, ss in by_dst.items():
        w = PR_SCALE // len(ss)
        srt = sorted(ss)
        for i, a in enumerate(srt):
            for b in srt[i + 1 :]:
                ra, n = want.get((a, b), (0, 0))
                want[(a, b)] = (ra + w, n + 1)
    got = {
        (r.a, r.b): (r.ra_e9, r.n_shared)
        for r in resource_allocation(edges).collect()
    }
    assert got == want
    # capped scores are a lower bound of the uncapped ones
    capped = {
        (r.a, r.b): r.ra_e9
        for r in resource_allocation(edges, max_fanout=4).collect()
    }
    assert all(capped[k] <= want[k][0] for k in capped)


def _lpa_brute(rows, rounds):
    from collections import Counter

    und = {tuple(sorted(e)) for e in rows}
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        lbl = {
            n: max(
                Counter(lbl[m] for m in adj[n]).items(),
                key=lambda kv: (kv[1], -kv[0]),
            )[0]
            for n in adj
        }
    return lbl


@pytest.fixture(scope="module")
def planted_edges(spark):
    # two dense planted communities bridged by a few random edges
    rng = random.Random(3)
    rows = set()
    for lo, hi in ((0, 25), (25, 50)):
        while sum(1 for a, b in rows if lo <= a < hi) < 90:
            a, b = rng.randrange(lo, hi), rng.randrange(lo, hi)
            if a != b:
                rows.add((a, b))
    for _ in range(10):
        rows.add((rng.randrange(0, 25), rng.randrange(25, 50)))
    rows = sorted(rows)
    return rows, spark.createDataFrame(rows, "src: long, dst: long").cache()


def test_label_propagation_bruteforce(spark, planted_edges):
    from deepee_spark.operators.graph import label_propagation

    rows, edf = planted_edges
    for rounds in (1, 4):
        got = {
            r.node: r.lbl
            for r in label_propagation(edf, rounds=rounds).collect()
        }
        assert got == _lpa_brute(rows, rounds), f"rounds={rounds}"
    # 4 rounds on the planted graph finds few communities (near 2)
    assert len(set(got.values())) <= 6


def test_label_propagation_oracle_matches(spark, planted_edges):
    from deepee_spark.operators.graph import (
        label_propagation,
        label_propagation_oracle_sql,
    )

    rows, edf = planted_edges
    con = duckdb.connect()
    con.execute("CREATE TABLE et(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO et VALUES (?,?)", rows)
    got = {
        r.node: r.lbl for r in label_propagation(edf, rounds=4).collect()
    }
    oracle = dict(
        con.execute(
            label_propagation_oracle_sql("SELECT src, dst FROM et", 4)
        ).fetchall()
    )
    assert got == oracle


# ---------------------------------------------------------------------------
# k-truss


def _truss_peel(edge_list: list[tuple[int, int]], k: int):
    """Brute-force k-truss: iterate support recomputation + filter."""
    edges = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    while True:
        adj = defaultdict(set)
        for lo, hi in edges:
            adj[lo].add(hi)
            adj[hi].add(lo)
        sup = {}
        for lo, hi in edges:
            sup[(lo, hi)] = len(adj[lo] & adj[hi])
        kept = {e for e in edges if sup[e] >= k - 2}
        if kept == edges:
            return {(lo, hi, sup[(lo, hi)]) for lo, hi in kept}
        if not kept:
            # ktruss returns the (possibly empty) filtered frame with
            # supports from the last computed round
            return set()
        edges = kept


def test_ktruss_bruteforce(spark, edges):
    from deepee_spark.operators.graph import ktruss

    rows = [(r.src, r.dst) for r in edges.collect()]
    for k in (3, 4, 5):
        got = {
            (r.lo, r.hi, r.support) for r in ktruss(edges, k).collect()
        }
        assert got == _truss_peel(rows, k), f"k={k}"


def test_ktruss_duckdb_oracle_matches(spark, edges):
    from deepee_spark.operators.graph import ktruss, ktruss_oracle_sql

    rows = [(r.src, r.dst) for r in edges.collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    for k in (3, 5):
        got = {
            (r.lo, r.hi, r.support)
            for r in ktruss(edges, k, max_rounds=8).collect()
        }
        oracle = {
            tuple(r)
            for r in con.execute(
                ktruss_oracle_sql("SELECT src, dst FROM e", k, rounds=8)
            ).fetchall()
        }
        assert got == oracle, f"k={k}"


def test_ktruss_triangle_free_graph_empties(spark):
    from deepee_spark.operators.graph import ktruss

    # a path graph has no triangles: 3-truss removes every edge
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src: long, dst: long"
    )
    assert ktruss(path, 3).count() == 0


def test_ktruss_rejects_bad_params(spark, edges):
    from deepee_spark.operators.graph import ktruss

    with pytest.raises(ValueError):
        ktruss(edges, 2)
    with pytest.raises(ValueError):
        ktruss(edges, 3, max_rounds=0)


def test_edge_support_matches_brute(spark, edges):
    from deepee_spark.operators.graph import edge_support, undirect

    rows = [(r.src, r.dst) for r in edges.collect()]
    und = {(min(a, b), max(a, b)) for a, b in rows if a != b}
    adj = defaultdict(set)
    for lo, hi in und:
        adj[lo].add(hi)
        adj[hi].add(lo)
    exp = {
        (lo, hi, len(adj[lo] & adj[hi]))
        for lo, hi in und
        if len(adj[lo] & adj[hi]) > 0
    }
    got = {
        (r.lo, r.hi, r.support)
        for r in edge_support(undirect(edges)).collect()
    }
    assert got == exp


def test_co_occurrence_pmi_bruteforce(spark):
    import math
    from collections import defaultdict

    from deepee_spark.operators.graph import co_occurrence_pmi

    rows = [
        (f"i{i % 6}", f"u{(i * 7 + j) % 9}")
        for i in range(18)
        for j in range(3)
    ]
    df = spark.createDataFrame(rows, "src: string, dst: string")
    e = set(rows)
    occ = defaultdict(set)
    for s, d in e:
        occ[s].add(d)
    n = len({d for _, d in e})
    exp = set()
    items = sorted(occ)
    for i, a in enumerate(items):
        for b in items[i + 1:]:
            shared = len(occ[a] & occ[b])
            if shared:
                exp.add(
                    (a, b, shared, len(occ[a]), len(occ[b]),
                     round(math.log(n * shared / (len(occ[a]) * len(occ[b]))), 6))
                )
    got = {
        (r.a, r.b, r.n_shared, r.n_a, r.n_b, r.pmi)
        for r in co_occurrence_pmi(df).collect()
    }
    assert got == exp


def test_harmonic_centrality_bruteforce(spark, edges):
    from deepee_spark.operators.graph import (
        harmonic_centrality,
        harmonic_oracle_sql,
    )

    rows = [(r.src, r.dst) for r in edges.collect()]
    adj = defaultdict(set)
    for a, b in rows:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    seed_ids = [0, 7, 21]
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "node: long")

    def bfs(s, max_hops):
        dist = {s: 0}
        frontier = [s]
        for h in range(1, max_hops + 1):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = h
                        nxt.append(v)
            frontier = nxt
        return dist

    exp = defaultdict(lambda: [0, 0])
    for s in seed_ids:
        for node, d in bfs(s, 3).items():
            if d > 0:
                exp[node][0] += 1
                exp[node][1] += 1_000_000 // d
    got = {
        (r.node, r.n_seeds_reaching, r.harmonic_e6)
        for r in harmonic_centrality(edges, seeds, max_hops=3).collect()
    }
    assert got == {(n, c, h) for n, (c, h) in exp.items()}

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    con.execute("CREATE TABLE s(node BIGINT)")
    con.executemany("INSERT INTO s VALUES (?)", [(s,) for s in seed_ids])
    oracle = {
        tuple(r)
        for r in con.execute(
            harmonic_oracle_sql(
                "SELECT src, dst FROM e", "SELECT node FROM s", 3
            )
        ).fetchall()
    }
    assert got == oracle


def test_random_walks_bruteforce_and_oracle(spark):
    import hashlib

    from deepee_spark.operators.negatives import md5_long48_sql
    from deepee_spark.operators.walks import (
        random_walks,
        random_walks_oracle_sql,
    )

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    rows = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("c", "d"),  # d is a dead end
        ("e", "a"),
    ]
    df = spark.createDataFrame(rows, ["src", "dst"])
    adj = {}
    for s, d in sorted(set(rows)):
        adj.setdefault(s, []).append(d)
    exp = set()
    for start in adj:
        for walk in range(2):
            node = start
            exp.add((start, walk, 0, node))
            for step in range(1, 4):
                nbrs = adj.get(node)
                if not nbrs:
                    break
                node = nbrs[h48(f"{start}|{walk}|{step}|{node}") % len(nbrs)]
                exp.add((start, walk, step, node))
    got = {
        (r.start, r.walk, r.step, r.node)
        for r in random_walks(df, walks_per_node=2, length=3).collect()
    }
    assert got == exp
    # dead end: walks reaching d stop there (no step after a d row
    # except when the walk had more steps before reaching d)
    assert ("c", 0, 0, "c") in got

    con = duckdb.connect()
    con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?,?)", rows)
    oracle = {
        tuple(r)
        for r in con.execute(
            random_walks_oracle_sql(
                "SELECT src, dst FROM e", md5_long48_sql,
                walks_per_node=2, length=3,
            )
        ).fetchall()
    }
    assert got == oracle


def test_predicate_implications_bruteforce(spark):
    from collections import defaultdict

    from deepee_spark.operators.graph import predicate_implications

    rows = [
        ("u1", "buy", "i1"), ("u1", "click", "i1"), ("u1", "view", "i1"),
        ("u2", "buy", "i1"), ("u2", "click", "i1"),
        ("u3", "click", "i2"), ("u3", "view", "i2"),
        ("u4", "buy", "i3"),
        ("u1", "buy", "i1"),  # duplicate assertion: counted once
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    t = set(rows)
    by_pair = defaultdict(set)
    n_p = defaultdict(int)
    for s, p, o in t:
        by_pair[(s, o)].add(p)
        n_p[p] += 1
    exp = set()
    joint = defaultdict(int)
    for preds in by_pair.values():
        for p in preds:
            for r in preds:
                if p != r:
                    joint[(p, r)] += 1
    for (p, r), sup in joint.items():
        exp.add((p, r, n_p[p], sup, 1_000_000 * sup // n_p[p]))
    got = {
        (r.p, r.r, r.n_p, r.support, r.confidence_e6)
        for r in predicate_implications(df).collect()
    }
    assert got == exp
    # buy => click holds 2/3 times
    assert ("buy", "click", 3, 2, 666666) in got


def _closure_py(
    rows: list[tuple[int, int]], max_depth: int
) -> dict[tuple[int, int], int]:
    adj = defaultdict(set)
    for s, d in rows:
        if s != d:
            adj[s].add(d)
    want = {}
    for start in sorted(adj):
        dist = {start: 0}
        q = deque([start])
        while q:
            u = q.popleft()
            if dist[u] == max_depth:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if v != start:
                want[(start, v)] = d
    return want


def test_transitive_closure_bruteforce_and_oracle(spark, edges):
    from deepee_spark.operators.graph import (
        closure_oracle_sql,
        transitive_closure,
    )

    rows = [(r.src, r.dst) for r in edges.collect()]
    for cap in (2, 16):  # pre-convergence cap AND converged closure
        want = _closure_py(rows, cap)
        got = {
            (r.src, r.dst): r.dist
            for r in transitive_closure(edges, max_depth=cap).collect()
        }
        assert got == want, f"cap={cap}"
        con = duckdb.connect()
        con.register("edges_tbl", edges.toPandas())
        sql = closure_oracle_sql("SELECT src, dst FROM edges_tbl", cap)
        assert {
            (s, d): dist for s, d, dist in con.execute(sql).fetchall()
        } == want, f"cap={cap}"


def test_transitive_closure_chain_and_guards(spark):
    from deepee_spark.operators.graph import transitive_closure

    # 5-node chain: closure is all ordered pairs with exact distances,
    # reached in ceil(log2(4)) = 2 doubling rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src: long, dst: long"
    )
    got = {
        (r.src, r.dst): r.dist
        for r in transitive_closure(chain, max_depth=16).collect()
    }
    assert got == {
        (i, j): j - i for i in range(5) for j in range(i + 1, 5)
    }
    # self-loops are dropped, not propagated
    loopy = spark.createDataFrame(
        [(1, 1), (1, 2)], "src: long, dst: long"
    )
    got = {
        (r.src, r.dst): r.dist
        for r in transitive_closure(loopy, max_depth=4).collect()
    }
    assert got == {(1, 2): 1}
    with pytest.raises(ValueError):
        transitive_closure(chain, max_depth=0)


def test_skipgram_pairs_bruteforce_and_oracle(spark):
    from deepee_spark.operators.walks import (
        skipgram_pairs,
        skipgram_pairs_oracle_sql,
    )

    # hand corpus incl. a revisiting walk (a appears twice) and a
    # short walk (dead end after one hop)
    rows = [
        ("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "a"),
        ("a", 0, 3, "c"),
        ("b", 0, 0, "b"), ("b", 0, 1, "d"),
        ("b", 1, 0, "b"),  # walk of length 0
    ]
    df = spark.createDataFrame(rows, ["start", "walk", "step", "node"])
    for window in (1, 2, 5):  # window > walk length must not crash
        want = defaultdict(int)
        for s1, w1, i, u in rows:
            for s2, w2, j, v in rows:
                if s1 == s2 and w1 == w2 and 0 < abs(i - j) <= window:
                    want[(u, v)] += 1
        got = {
            (r.center, r.context): r.n
            for r in skipgram_pairs(df, window=window).collect()
        }
        assert got == dict(want), f"window={window}"
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE w(start VARCHAR, walk BIGINT,"
            " step BIGINT, node VARCHAR)"
        )
        con.executemany("INSERT INTO w VALUES (?,?,?,?)", rows)
        oracle = {
            (c, x): n
            for c, x, n in con.execute(
                skipgram_pairs_oracle_sql(
                    "SELECT * FROM w", window=window
                )
            ).fetchall()
        }
        assert got == oracle, f"window={window}"
    # symmetric corpus => symmetric counts; revisit pair exists
    out = {
        (r.center, r.context): r.n
        for r in skipgram_pairs(df, window=2).collect()
    }
    assert out[("a", "a")] == 2  # step0<->step2 both directions
    with pytest.raises(ValueError):
        skipgram_pairs(df, window=0)


def test_embedding_dedup_multitable_amplifies_recall(spark):
    """tables=4 must (a) return ONLY pairs the brute all-pairs path
    returns, with identical cosines, and (b) recall at least every
    single-table pair — recall amplification, never correctness loss."""
    import random as _random

    from deepee_spark.operators.dedup import embedding_dup_pairs

    rng = _random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    kw = dict(id_col="vec_id", vec_col="embedding", dim=16, min_cosine=0.2)
    brute = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs(
            df.withColumn("blk", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(1)),
            block_col="blk", **kw,
        ).collect()
    }
    t1 = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs(df, planes=8, tables=1, **kw).collect()
    }
    t4 = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_dup_pairs(df, planes=8, tables=4, **kw).collect()
    }
    assert set(t1) <= set(t4) <= set(brute)
    assert all(t4[p] == brute[p] for p in t4)
    assert len(t4) > len(t1)  # amplification must actually bite here


def _scc_py(rows):
    adj = defaultdict(set)
    nodes = set()
    for s, d in rows:
        if s != d:
            adj[s].add(d)
            nodes |= {s, d}
    reach = {}
    for n in nodes:
        seen, stack = set(), [n]
        while stack:
            for v in adj[stack.pop()]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        reach[n] = seen
    return {
        n: min(
            [n]
            + [m for m in nodes if m in reach[n] and n in reach[m]]
        )
        for n in nodes
    }


def test_scc_bruteforce_and_oracle(spark, edges):
    from deepee_spark.operators.graph import scc, scc_oracle_sql

    rows = [(r.src, r.dst) for r in edges.collect()]
    want = _scc_py(rows)
    got = {r.node: r.scc_id for r in scc(edges).collect()}
    assert got == want
    con = duckdb.connect()
    con.register("edges_tbl", edges.toPandas())
    sql = scc_oracle_sql("SELECT src, dst FROM edges_tbl")
    assert {n: c for n, c in con.execute(sql).fetchall()} == want


def test_scc_multi_round_peel_and_guards(spark):
    """Adversarial SCC-DAG chain where the cycle {5,6} has its ancestor
    minimum (0) and descendant minimum (1) OUTSIDE the cycle — settling
    it takes three peel rounds (0 first, then 1, then {5,6}). Also:
    self-loops drop, empty input returns empty, bad params raise."""
    from deepee_spark.operators.graph import scc

    g = spark.createDataFrame(
        [(0, 5), (5, 6), (6, 5), (6, 1), (7, 7)], "src: long, dst: long"
    )
    got = {r.node: r.scc_id for r in scc(g).collect()}
    assert got == {0: 0, 1: 1, 5: 5, 6: 5}  # 7 had only a self-loop
    with pytest.raises(RuntimeError):
        scc(g, max_rounds=2)  # needs 3 peel rounds
    with pytest.raises(ValueError):
        scc(g, max_rounds=0)
    empty = spark.createDataFrame([], "src: long, dst: long")
    assert scc(empty).count() == 0


def _sssp_py(rows, seeds, hops):
    dist = {s: 0 for s in seeds}
    for _ in range(hops):
        nxt = dict(dist)
        for s, d, w in rows:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_sssp_bruteforce_and_oracle(spark):
    """Hop-bounded weighted SSSP vs a literal Bellman-Ford fold and the
    recursive-CTE twin, at a pre-convergence cap AND a converged one;
    a longer-hop cheaper path must win once the cap admits it."""
    import random

    from deepee_spark.operators.graph import sssp_hops, sssp_oracle_sql

    rng = random.Random(17)
    rows = sorted(
        {
            (rng.randrange(30), rng.randrange(30))
            for _ in range(90)
        }
    )
    rows = [(s, d, 1 + (s * 7 + d) % 5) for s, d in rows if s != d]
    # plus a guaranteed detour: 0->1 direct cost 9, 0->2->1 cost 2
    rows += [(0, 1, 9), (0, 2, 1), (2, 1, 1)]
    df = spark.createDataFrame(rows, "src: long, dst: long, w: long")
    seeds = spark.createDataFrame([(0,), (5,)], "node: long")
    con = duckdb.connect()
    con.register("edges_tbl", df.toPandas())
    for cap in (1, 6):
        want = _sssp_py(rows, [0, 5], cap)
        got = {
            r.node: r.dist for r in sssp_hops(df, seeds, hops=cap).collect()
        }
        assert got == want, f"cap={cap}"
        sql = sssp_oracle_sql(
            "SELECT src, dst, w FROM edges_tbl",
            "SELECT 0 AS node UNION ALL SELECT 5",
            hops=cap,
        )
        assert dict(con.execute(sql).fetchall()) == want, f"cap={cap}"
    with pytest.raises(ValueError):
        sssp_hops(df, seeds, hops=0)


def _hits_py(rows, iters=3):
    from deepee_spark.operators.graph import HITS_SCALE as S

    e = sorted(set(rows))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    h = {v: S for v in nodes}
    a = {}
    for _ in range(iters):
        raw_a = {v: 0 for v in nodes}
        for u, v in e:
            raw_a[v] += h[u]
        m = max(raw_a.values())
        a = {v: (S * raw_a[v]) // m for v in nodes}
        raw_h = {v: 0 for v in nodes}
        for u, v in e:
            raw_h[u] += a[v]
        m = max(raw_h.values())
        h = {v: (S * raw_h[v]) // m for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def test_hits_exact_integer(spark, edges):
    from deepee_spark.operators.graph import HITS_SCALE, hits_int

    rows = [(r.src, r.dst) for r in edges.collect()]
    want = _hits_py(rows)
    got = {
        r.node: (r.hub, r.authority)
        for r in hits_int(edges, iters=3).collect()
    }
    assert got == want  # EXACT: integer recurrence end to end
    # max-normalization: the best hub and best authority sit at SCALE
    assert max(v[0] for v in got.values()) == HITS_SCALE
    assert max(v[1] for v in got.values()) == HITS_SCALE


def test_hits_duckdb_oracle_matches(spark, edges):
    from deepee_spark.operators.graph import hits_int, hits_oracle_sql

    got = {
        r.node: (r.hub, r.authority)
        for r in hits_int(edges, iters=3).collect()
    }
    con = duckdb.connect()
    con.register("edges_tbl", edges.toPandas())
    sql = hits_oracle_sql("SELECT src, dst FROM edges_tbl", iters=3)
    want = {n: (hb, au) for n, hb, au in con.execute(sql).fetchall()}
    assert got == want


def test_hits_star_graph(spark):
    """u1..u4 all point at c: c is the sole authority (SCALE), the
    spokes are equal maximal hubs (SCALE), c's hub and the spokes'
    authorities are 0 (dangling conventions)."""
    from deepee_spark.operators.graph import HITS_SCALE as S
    from deepee_spark.operators.graph import hits_int

    e = spark.createDataFrame(
        [(f"u{i}", "c") for i in range(1, 5)], "src: string, dst: string"
    )
    got = {
        r.node: (r.hub, r.authority) for r in hits_int(e, iters=2).collect()
    }
    assert got["c"] == (0, S)
    for i in range(1, 5):
        assert got[f"u{i}"] == (S, 0)


def _wl_py(rows, iters=2):
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    e = sorted(set(rows))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    outs = defaultdict(list)
    ins = defaultdict(list)
    for a, b in e:
        outs[a].append(b)
        ins[b].append(a)
    lbl = {
        v: md5(f"{len(outs[v])}/{len(ins[v])}") for v in nodes
    }
    for _ in range(iters):
        lbl = {
            v: md5(
                lbl[v]
                + ">"
                + ",".join(sorted(lbl[u] for u in outs[v]))
                + "<"
                + ",".join(sorted(lbl[u] for u in ins[v]))
            )
            for v in nodes
        }
    return lbl


def test_wl_matches_reference(spark, edges):
    from deepee_spark.operators.graph import wl_fingerprints

    rows = [(r.src, r.dst) for r in edges.collect()]
    got = {r.node: r.wl for r in wl_fingerprints(edges, iters=2).collect()}
    assert got == _wl_py(rows)


def test_wl_duckdb_oracle_matches(spark, edges):
    from deepee_spark.operators.graph import wl_fingerprints, wl_oracle_sql

    got = {r.node: r.wl for r in wl_fingerprints(edges, iters=2).collect()}
    con = duckdb.connect()
    con.register("edges_tbl", edges.toPandas())
    want = dict(
        con.execute(
            wl_oracle_sql("SELECT src, dst FROM edges_tbl", iters=2)
        ).fetchall()
    )
    assert got == want


def test_wl_structural_twins(spark):
    """Two disjoint copies of the same directed subgraph must yield
    identical fingerprints position-for-position; breaking one copy's
    structure must break the match."""
    from deepee_spark.operators.graph import wl_fingerprints

    base = [("a1", "a2"), ("a2", "a3"), ("a1", "a3")]
    twin = [("b1", "b2"), ("b2", "b3"), ("b1", "b3")]
    e = spark.createDataFrame(base + twin, "src: string, dst: string")
    fp = {r.node: r.wl for r in wl_fingerprints(e, iters=2).collect()}
    assert fp["a1"] == fp["b1"]
    assert fp["a2"] == fp["b2"]
    assert fp["a3"] == fp["b3"]
    e2 = spark.createDataFrame(
        base + twin + [("b3", "b1")], "src: string, dst: string"
    )
    fp2 = {r.node: r.wl for r in wl_fingerprints(e2, iters=2).collect()}
    assert fp2["a1"] != fp2["b1"]


def _hyperball_py(rows, radius=3):
    import hashlib

    HLL_M, RMAX = 64, 43
    NUM, DEN = 709 * 64 * 64 * (1 << 40), 125

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    e = sorted(set(rows))
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    out_adj = defaultdict(set)
    for a, b in e:
        out_adj[a].add(b)

    def regs_of(ball):
        regs = {}
        for v in ball:
            h = h48(str(v))
            b, w = h % HLL_M, h // HLL_M
            rho = RMAX if w == 0 else RMAX - len(bin(w)) - (-2)  # len(bin)-2
            rho = RMAX if w == 0 else RMAX - (len(bin(w)) - 2)
            regs[b] = max(regs.get(b, 0), rho)
        return regs

    def est(regs):
        s = sum(1 << (RMAX - r) for r in regs.values())
        s += (HLL_M - len(regs)) * (1 << RMAX)
        return NUM // (DEN * s)

    balls = {v: {v} for v in nodes}
    prev = {v: est(regs_of(balls[v])) for v in nodes}
    harm = {v: 0 for v in nodes}
    final = prev
    for t in range(1, radius + 1):
        balls = {
            v: balls[v] | set().union(*(balls[u] for u in out_adj[v]))
            if out_adj[v]
            else balls[v]
            for v in nodes
        }
        cur = {v: est(regs_of(balls[v])) for v in nodes}
        for v in nodes:
            harm[v] += ((cur[v] - prev[v]) * 1_000_000) // t
        prev = cur
        final = cur
    return {v: (final[v], harm[v]) for v in nodes}


def test_hyperball_matches_reference(spark, edges):
    from deepee_spark.operators.graph import hyperball_harmonic

    rows = [(r.src, r.dst) for r in edges.collect()]
    got = {
        r.node: (r.ball_r, r.harmonic_e6)
        for r in hyperball_harmonic(edges, radius=3).collect()
    }
    assert got == _hyperball_py(rows, 3)


def test_hyperball_duckdb_oracle_matches(spark, edges):
    from deepee_spark.operators.graph import (
        hyperball_harmonic,
        hyperball_oracle_sql,
    )

    got = {
        r.node: (r.ball_r, r.harmonic_e6)
        for r in hyperball_harmonic(edges, radius=3).collect()
    }
    con = duckdb.connect()
    con.register("edges_tbl", edges.toPandas())
    want = {
        n: (b, h)
        for n, b, h in con.execute(
            hyperball_oracle_sql("SELECT src, dst FROM edges_tbl", 3)
        ).fetchall()
    }
    assert got == want


def test_hyperball_chain_monotone(spark):
    """On the chain a->b->c->d with reversed edges, balls grow along
    the chain and harmonic increments weight closer nodes more."""
    from deepee_spark.operators.graph import hyperball_harmonic

    e = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c")], "src: string, dst: string"
    )  # reversed: ball(x) = nodes that reach x in the original chain
    got = {
        r.node: (r.ball_r, r.harmonic_e6)
        for r in hyperball_harmonic(e, radius=3).collect()
    }
    # nobody reaches a in the original chain (its reversed ball never
    # grows) -> harmonic 0; everyone else collects something
    assert got["a"][1] == 0
    assert got["b"][1] > 0 and got["c"][1] > 0 and got["d"][1] > 0
    # balls are nested subsets along the chain, and the HLL estimate is
    # monotone under register-set growth (the exact harmonic VALUES at
    # 4-node cardinalities carry HLL small-range bias — pinned instead
    # by the brute-force parity test above)
    assert (
        got["d"][0] >= got["c"][0] >= got["b"][0] >= got["a"][0]
    )


def test_hyperball_neighborhood(spark, edges):
    """N(t) must equal the per-node reference ests summed, and be
    nondecreasing in t (balls only grow)."""
    from deepee_spark.operators.graph import (
        hyperball_neighborhood,
        hyperball_neighborhood_oracle_sql,
    )

    rows = [(r.src, r.dst) for r in edges.collect()]
    got = {
        r.t: r.reach_sum
        for r in hyperball_neighborhood(edges, radius=3).collect()
    }
    assert sorted(got) == [0, 1, 2, 3]
    assert got[0] <= got[1] <= got[2] <= got[3]
    con = duckdb.connect()
    con.register("edges_tbl", edges.toPandas())
    want = dict(
        con.execute(
            hyperball_neighborhood_oracle_sql(
                "SELECT src, dst FROM edges_tbl", 3
            )
        ).fetchall()
    )
    assert got == want


def test_node2vec_walks_bruteforce_oracle_and_degeneracy(spark):
    """node2vec biased walks: (1) python brute-force replica of the
    integer interval selection agrees; (2) DuckDB oracle agrees;
    (3) p=q=1 reduces bit-exactly to random_walks."""
    import hashlib

    from deepee_spark.operators.negatives import md5_long48_sql
    from deepee_spark.operators.walks import (
        node2vec_walks,
        node2vec_walks_oracle_sql,
        random_walks,
    )

    def h48(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

    # triangle a-b-c (directed both ways) + spur c->d + e->a feeder:
    # gives return, triangle, and outward candidates at step >= 2
    base = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"),
            ("e", "a"), ("b", "a"), ("c", "b")]
    df = spark.createDataFrame(base, ["src", "dst"])
    eset = set(base)
    adj = {}
    for s, d in sorted(eset):
        adj.setdefault(s, []).append(d)

    def brute(p, q, walks_per_node, length):
        exp = set()
        for start in adj:
            for walk in range(walks_per_node):
                node, prev = start, None
                exp.add((start, walk, 0, node))
                for step in range(1, length + 1):
                    nbrs = adj.get(node)
                    if not nbrs:
                        break
                    if prev is None:
                        nxt = nbrs[h48(f"{start}|{walk}|{step}|{node}")
                                   % len(nbrs)]
                    else:
                        wgts = [
                            q if d == prev
                            else (p * q if (prev, d) in eset else p)
                            for d in nbrs
                        ]
                        r = h48(f"{start}|{walk}|{step}|{node}") % sum(wgts)
                        cum = 0
                        for d, w in zip(nbrs, wgts):
                            cum += w
                            if r < cum:
                                nxt = d
                                break
                    prev, node = node, nxt
                    exp.add((start, walk, step, node))
        return exp

    for p, q in [(1, 4), (4, 1), (2, 3)]:
        got = {
            (r.start, r.walk, r.step, r.node)
            for r in node2vec_walks(
                df, p=p, q=q, walks_per_node=2, length=4
            ).collect()
        }
        assert got == brute(p, q, 2, 4), (p, q)
        con = duckdb.connect()
        con.execute("CREATE TABLE e(src VARCHAR, dst VARCHAR)")
        con.executemany("INSERT INTO e VALUES (?,?)", base)
        oracle = {
            tuple(r)
            for r in con.execute(
                node2vec_walks_oracle_sql(
                    "SELECT src, dst FROM e", md5_long48_sql,
                    p=p, q=q, walks_per_node=2, length=4,
                )
            ).fetchall()
        }
        assert got == oracle, (p, q)
        con.close()

    # degeneracy: p=q=1 == first-order walks, bit-exact
    n2v = {
        (r.start, r.walk, r.step, r.node)
        for r in node2vec_walks(df, p=1, q=1, walks_per_node=2,
                                length=4).collect()
    }
    rw = {
        (r.start, r.walk, r.step, r.node)
        for r in random_walks(df, walks_per_node=2, length=4).collect()
    }
    assert n2v == rw


def test_node2vec_rejects_non_integer_bias(spark):
    # ADVICE r3: float p/q would silently truncate through cast('long')
    import pytest as _pytest
    from deepee_spark.operators.walks import node2vec_walks

    df = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    for kwargs in (
        {"p": 1.5, "q": 1}, {"p": 1, "q": 2.0}, {"p": 0, "q": 1},
        {"p": 1, "q": 1, "walks_per_node": 1.0},
        {"p": 1, "q": 1, "length": 2.5},
        # ADVICE r4: bool must not pass as 1
        {"p": True, "q": 1}, {"p": 1, "q": 1, "length": True},
    ):
        with _pytest.raises(ValueError):
            node2vec_walks(df, **kwargs)
    # ADVICE r4: numpy integer scalars (config/meta arithmetic) are
    # integral and MUST be accepted — operator.index coerces them
    import numpy as _np

    out = node2vec_walks(
        df, p=_np.int64(1), q=_np.int32(2),
        walks_per_node=_np.int64(1), length=_np.int64(2),
    )
    assert out.count() > 0


def test_pagerank_warm_start_band_equivalent_and_faster(spark):
    # r3 verdict task 8: warm-starting from the previous snapshot\'s
    # scores must land in the SAME tolerance band as a cold start on
    # the updated graph, in fewer rounds. Exact-integer equality is
    # deliberately NOT asserted — the truncating recurrence orbits a
    # small limit cycle, so different starts agree to O(tol_units)
    # (see the operator docstring; constants cross-checked against a
    # single-process integer simulation of the same recurrence).
    from deepee_spark.operators.graph import pagerank_int_converged

    base = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(120)]
    base += [(f"n{i}", "hub") for i in range(0, 40, 5)]
    base += [("hub", "n0"), ("hub", "n13")]
    delta = [("new_a", "n2"), ("n3", "new_a"), ("n11", "n28")]
    df_a = spark.createDataFrame(base, "src string, dst string")
    df_b = spark.createDataFrame(base + delta, "src string, dst string")

    ranks_a, rounds_a, conv_a = pagerank_int_converged(df_a)
    assert conv_a and 0 < rounds_a < 100  # actually converged
    cold, rounds_cold, conv_c = pagerank_int_converged(df_b)
    warm, rounds_warm, conv_w = pagerank_int_converged(df_b, seed_ranks=ranks_a)
    assert conv_c and conv_w
    # same tolerance band: per-node gap bounded by tol_units (the
    # simulation shows ~34 here; 100 is the certified band)
    import pyspark.sql.functions as F

    gap = (
        cold.join(warm.select("node", F.col("rank").alias("w")), "node")
        .agg(F.max(F.abs(F.col("rank") - F.col("w"))).alias("d"))
        .collect()[0]["d"]
    )
    assert gap <= 100, gap
    # node sets identical (new node present, nothing dropped)
    assert cold.count() == warm.count() == 122
    # warm start saves rounds on a drop-sized delta
    assert rounds_warm < rounds_cold, (rounds_warm, rounds_cold)
