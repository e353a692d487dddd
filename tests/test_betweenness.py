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


def test_sampled_full_fraction_is_exact(spark):
    """k >= |V| degrades to the exact path bit-for-bit (scale 1.0)."""
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (1, 4)]
    exact = got_bc(spark, edges)
    assert got_bc(spark, edges, sample_sources=1.0) == exact
    assert got_bc(spark, edges, sample_sources=10 ** 6) == exact


def brandes_py_pivots(edge_list, pivots, n_nodes, directed=False):
    """Pure-Python Brandes-Pich: restrict sources to ``pivots``, scale
    by n/k — the estimator the Spark path must reproduce exactly for a
    GIVEN pivot set."""
    adj: dict = {}
    for u, v in edge_list:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set())
        if not directed:
            adj[v].add(u)
    bc = {v: 0.0 for v in adj}
    for s in pivots:
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
    scale = (0.5 if not directed else 1.0) * n_nodes / len(pivots)
    return {v: x * scale for v, x in bc.items()}


def test_sampled_matches_python_estimator_on_same_pivots(spark):
    """For the deterministically-elected pivot set, the Spark estimator
    equals pure-Python Brandes-Pich to float precision — i.e. sampling
    changes WHICH sources run, never the per-source arithmetic."""
    from pyspark.sql import functions as F

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3),
             (1, 6), (6, 2), (6, 4), (0, 7), (7, 5)]
    df = spark.createDataFrame(edges, E)
    n_nodes = 8
    k = 3
    # reproduce the operator's pivot election: k smallest xxhash64(node)
    nodes = (
        df.select(F.col("src").alias("node"))
        .unionByName(df.select(F.col("dst").alias("node")))
        .distinct()
    )
    pivots = [
        r["node"]
        for r in nodes.orderBy(
            F.xxhash64("node").asc(), F.col("node").asc()
        ).limit(k).collect()
    ]
    got = got_bc(spark, edges, sample_sources=k)
    want = brandes_py_pivots(edges, pivots, n_nodes)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_sampled_hub_error_within_bound(spark):
    """On a random graph the k-pivot estimate of the TOP hub stays within
    the Hoeffding-style band used operationally (relative error < 50% at
    k = n/2 on a 24-node graph — loose, but a real regression trips it),
    and the estimator ranks the planted bridge first."""
    import random

    rng = random.Random(7)
    n = 24
    # two 12-cliques joined by a single bridge through node 0 <-> 12
    edges = [(i, j) for i in range(12) for j in range(i + 1, 12)
             if rng.random() < 0.6]
    edges += [(i, j) for i in range(12, 24) for j in range(i + 1, 24)
              if rng.random() < 0.6]
    edges += [(0, 12)]
    exact = brandes_py(edges)
    got = got_bc(spark, edges, sample_sources=n // 2)
    top_exact = max(exact, key=exact.get)
    top_got = max(got, key=got.get)
    assert top_got in (0, 12) and top_exact in (0, 12)
    assert abs(got[top_exact] - exact[top_exact]) / exact[top_exact] < 0.5
