"""Incremental (warm-start) PageRank (graph.pagerank_converged):
fixpoint start-independence, round savings, tolerance semantics."""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.graph import pagerank, pagerank_converged

E = "src long, dst long"
BASE = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (4, 0), (4, 3),
        (5, 2), (5, 0), (3, 5)]


def ranks_of(df):
    return {r.node: r.rank for r in df.collect()}


def test_converged_matches_fixed_iteration(spark):
    edges = spark.createDataFrame(BASE, E)
    got, iters = pagerank_converged(edges, tol=1e-11, max_iterations=200)
    ref = ranks_of(pagerank(edges, iterations=60))
    assert 0 < iters <= 200
    for n, r in ranks_of(got).items():
        assert abs(r - ref[n]) < 1e-9
    assert abs(sum(ranks_of(got).values()) - 1.0) < 1e-9


def test_warm_start_same_fixpoint_no_more_rounds(spark):
    old_edges = spark.createDataFrame(BASE, E)
    full = spark.createDataFrame(BASE + [(1, 5), (6, 2)], E)
    r_old, _ = pagerank_converged(old_edges, tol=1e-8, max_iterations=200)
    warm, wi = pagerank_converged(
        full, tol=1e-8, max_iterations=200, init_ranks=r_old
    )
    cold, ci = pagerank_converged(full, tol=1e-8, max_iterations=200)
    w, c = ranks_of(warm), ranks_of(cold)
    assert set(w) == set(c)
    for n in w:
        assert abs(w[n] - c[n]) < 1e-6
    # warm may tie cold on tiny fast-mixing graphs (a head start worth
    # < 1 round), but must never be slower...
    assert wi <= ci
    # ...and the head start is real: the projected old vector is strictly
    # closer (L1) to the new fixpoint than the uniform cold start
    old = ranks_of(r_old)
    n = len(c)
    proj = {v: old.get(v, 1.0 / n) for v in c}
    tot = sum(proj.values())
    proj = {v: r / tot for v, r in proj.items()}
    d_warm = sum(abs(proj[v] - c[v]) for v in c)
    d_cold = sum(abs(1.0 / n - c[v]) for v in c)
    assert d_warm < d_cold
    # new node 6 present with unit total mass
    assert 6 in w and abs(sum(w.values()) - 1.0) < 1e-9


def test_loose_tolerance_stops_early(spark):
    edges = spark.createDataFrame(BASE, E)
    _, hi = pagerank_converged(edges, tol=1e-2, max_iterations=200)
    _, lo = pagerank_converged(edges, tol=1e-8, max_iterations=200)
    assert hi < lo


def test_empty_graph(spark):
    edges = spark.createDataFrame([], E)
    got, iters = pagerank_converged(edges)
    assert got.count() == 0 and iters == 0


def test_warm_start_ignores_departed_nodes(spark):
    # init vector mentions a node absent from the new graph: projection
    # drops it and renormalizes — mass still sums to 1
    old_edges = spark.createDataFrame(BASE + [(9, 0)], E)
    new_edges = spark.createDataFrame(BASE, E)
    r_old, _ = pagerank_converged(old_edges, tol=1e-6, max_iterations=200)
    warm, _ = pagerank_converged(
        new_edges, tol=1e-8, max_iterations=200, init_ranks=r_old
    )
    w = ranks_of(warm)
    assert 9 not in w
    assert abs(sum(w.values()) - 1.0) < 1e-9
