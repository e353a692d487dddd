"""HITS hubs/authorities (graph.hits): numpy fixpoint agreement,
normalization, role separation, degenerate graphs."""

from __future__ import annotations

import numpy as np

from i2o_transform_spark.operators.graph import hits

E = "src long, dst long"


def scores_of(df):
    return {r.node: (r.hub, r.auth) for r in df.collect()}


def numpy_hits(edge_list, n, iters=200):
    A = np.zeros((n, n))
    for s, t in edge_list:
        A[s, t] = 1.0
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    return h, a


def test_hits_matches_numpy(spark):
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (4, 0),
                 (4, 2)]
    edges = spark.createDataFrame(edge_list, E)
    got, iters = hits(edges, tol=1e-12, max_iterations=300)
    h, a = numpy_hits(edge_list, 5)
    s = scores_of(got)
    assert 0 < iters <= 300
    for i in range(5):
        assert abs(s[i][0] - h[i]) < 1e-8, ("hub", i)
        assert abs(s[i][1] - a[i]) < 1e-8, ("auth", i)
    assert abs(sum(v[0] for v in s.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in s.values()) - 1.0) < 1e-9


def test_role_separation_bipartite(spark):
    # pure directory->destination graph: sources are pure hubs (auth 0),
    # sinks pure authorities (hub 0)
    edge_list = [(0, 10), (0, 11), (1, 10), (1, 11), (1, 12)]
    edges = spark.createDataFrame(edge_list, E)
    got, _ = hits(edges, tol=1e-10)
    s = scores_of(got)
    for hub_node in (0, 1):
        assert s[hub_node][1] == 0.0
    for auth_node in (10, 11, 12):
        assert s[auth_node][0] == 0.0
    # node 1 links to more/better authorities than node 0
    assert s[1][0] > s[0][0]
    # node 10 and 11 (linked by both hubs) beat 12 (one hub)
    assert s[10][1] == s[11][1] > s[12][1]


def test_empty_graph(spark):
    got, iters = hits(spark.createDataFrame([], E))
    assert got.count() == 0 and iters == 0


def test_single_edge(spark):
    got, _ = hits(spark.createDataFrame([(0, 1)], E), tol=1e-10)
    s = scores_of(got)
    assert s[0] == (1.0, 0.0) and s[1] == (0.0, 1.0)
