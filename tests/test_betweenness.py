"""Betweenness centrality (graph.betweenness_centrality): pure-Python
Brandes agreement on cyclic graphs, closed forms, directed mode."""

from __future__ import annotations

from collections import deque

from i2o_transform_spark.operators.graph import betweenness_centrality

E = "src long, dst long"


def brandes_py(edge_list, directed=False):
    """Reference Brandes (2001), adjacency dict, exact."""
    adj: dict = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set())
        if not directed:
            adj[v].add(u)
            adj.setdefault(u, set())
    bc = {v: 0.0 for v in adj}
    for s in adj:
        stack, pred = [], {v: [] for v in adj}
        sigma = {v: 0.0 for v in adj}
        dist = {v: -1 for v in adj}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    pred[w].append(v)
        delta = {v: 0.0 for v in adj}
        while stack:
            w = stack.pop()
            for v in pred[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    if not directed:
        bc = {v: x / 2 for v, x in bc.items()}
    return bc


def got_bc(spark, edge_list, **kw):
    df = spark.createDataFrame(edge_list, E)
    return {r["node"]: r["bc"]
            for r in betweenness_centrality(df, **kw).collect()}


def test_matches_python_brandes_cyclic(spark):
    # cycles, a bridge, multiple equal shortest paths (sigma > 1)
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
             (1, 6), (6, 2)]
    got = got_bc(spark, edges)
    want = brandes_py(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_directed_matches(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 1)]
    got = got_bc(spark, edges, directed=True)
    want = brandes_py(edges, directed=True)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_bridged_stars_closed_form(spark):
    # star A: center 100, leaves 0..4; star B: center 200, leaves 10..12
    k, m = 5, 3
    edges = [(100, i) for i in range(k)]
    edges += [(200, 10 + i) for i in range(m)]
    edges += [(100, 200)]
    got = got_bc(spark, edges)
    assert got[100] == k * (k - 1) / 2 + k + k * m
    assert got[200] == m * (m - 1) / 2 + m + k * m
    for leaf in list(range(k)) + [10 + i for i in range(m)]:
        assert got[leaf] == 0.0


def test_path_graph_closed_form(spark):
    n = 6
    edges = [(i, i + 1) for i in range(n - 1)]
    got = got_bc(spark, edges)
    for i in range(n):
        assert got[i] == i * (n - 1 - i), i


def test_max_depth_truncation(spark):
    n = 6
    edges = [(i, i + 1) for i in range(n - 1)]
    # depth 1: only adjacent pairs reachable -> no intermediates -> all 0
    got = got_bc(spark, edges, max_depth=1)
    assert all(v == 0.0 for v in got.values())
