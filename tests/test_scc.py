"""Strongly connected components: trim + forward-backward coloring.

Brute-force reference: Python Floyd-Warshall reachability on small planted
and seeded-random graphs — scc_id(v) = min{u : v ->* u and u ->* v} ∪ {v}.
"""

from __future__ import annotations

import random

import pytest

from i2o_transform_spark.operators.graph import strongly_connected_components


def _brute_scc(nodes, edges):
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    reach = [[False] * n for _ in range(n)]
    for i in range(n):
        reach[i][i] = True
    for a, b in edges:
        reach[idx[a]][idx[b]] = True
    for k in range(n):
        rk = reach[k]
        for i in range(n):
            if reach[i][k]:
                ri = reach[i]
                for j in range(n):
                    if rk[j]:
                        ri[j] = True
    out = {}
    for v in nodes:
        i = idx[v]
        out[v] = min(
            u for u in nodes if reach[i][idx[u]] and reach[idx[u]][i]
        )
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(df).collect()
    }
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    assert set(got) == set(nodes)
    return got, _brute_scc(nodes, edges)


def test_scc_planted_mixed(spark):
    # two 3-cycles bridged one-way (stay separate), a 2-cycle merged into
    # the first by mutual bridge edges, a DAG tail, and a self-loop.
    edges = [
        (1, 2), (2, 3), (3, 1),          # cycle A = {1,2,3}
        (10, 11), (11, 12), (12, 10),    # cycle B = {10,11,12}
        (3, 10),                         # one-way bridge: A and B separate
        (20, 21), (21, 20),              # 2-cycle C
        (1, 20), (20, 1),                # mutual bridge: C merges into A
        (12, 30), (30, 31),              # DAG tail: singletons
        (40, 40),                        # self-loop: own (cyclic) SCC
    ]
    got, want = _run(spark, edges)
    assert got == want
    assert got[20] == 1 and got[21] == 1          # merged through the bridge
    assert got[10] == 10 and got[1] == 1          # one-way bridge kept apart
    assert got[30] == 30 and got[31] == 31 and got[40] == 40


def test_scc_pure_dag_is_all_singletons(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    got, want = _run(spark, edges)
    assert got == want == {1: 1, 2: 2, 3: 3, 4: 4}


def test_scc_chain_of_cycles_needs_multiple_peels(spark):
    # condensation is a 3-deep chain of 2-cycles; the global min colors
    # everything downstream in round 1, so rounds 2..3 exercise re-peeling.
    edges = [
        (1, 2), (2, 1),
        (2, 3), (3, 4), (4, 3),
        (4, 5), (5, 6), (6, 5),
    ]
    got, want = _run(spark, edges)
    assert got == want == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}


def test_scc_matches_bruteforce_on_random_graph(spark):
    rng = random.Random(20260820)
    nodes = list(range(1, 41))
    edges = sorted(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(90)
        }
    )
    got, want = _run(spark, edges)
    assert got == want


def test_scc_peel_bound_raises_loudly(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(ValueError, match="max_peel_rounds"):
        strongly_connected_components(df, max_peel_rounds=1)
