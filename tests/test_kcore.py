from __future__ import annotations

from i2o_transform_spark.operators.graph import k_core


def test_kcore_peels_chain_keeps_clique(spark):
    # 4-clique + a 3-node chain dangling off it
    clique = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "src int, dst int")
    assert {r.node for r in k_core(edges, k=3).collect()} == {0, 1, 2, 3}
    # k=2: chain still peels (ends have degree 1 transitively)
    assert {r.node for r in k_core(edges, k=2).collect()} == {0, 1, 2, 3}


def test_kcore_cycle_is_its_own_2core(spark):
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    edges = spark.createDataFrame(cyc, "src int, dst int")
    assert {r.node for r in k_core(edges, k=2).collect()} == set(range(6))
    assert k_core(edges, k=3).count() == 0


def test_kcore_matches_networkx_style_bruteforce(spark):
    import random

    rng = random.Random(5)
    n = 30
    edge_list = sorted({
        tuple(sorted(rng.sample(range(n), 2))) for _ in range(60)
    })
    # pure-python peel
    import collections

    adj = collections.defaultdict(set)
    for a, b in edge_list:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    k = 3
    while True:
        drop = {v for v in alive
                if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    edges = spark.createDataFrame(edge_list, "src int, dst int")
    assert {r.node for r in k_core(edges, k=k).collect()} == alive


def test_harmonic_closeness_path_graph(spark):
    from i2o_transform_spark.operators.graph import harmonic_closeness

    # directed path a->b->c->d->e ; 3-hop truncation
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = {r.node: (r.closeness_scaled, r.n_reached)
           for r in harmonic_closeness(edges, max_hops=3).collect()}
    # a reaches b@1, c@2, d@3 (e is 4 hops: truncated)
    assert got["a"] == (1_000_000 + 500_000 + 333_333, 3)
    assert got["d"] == (1_000_000, 1)
    assert "e" not in got  # no out-edges -> reaches nothing


def test_harmonic_closeness_min_dist_on_diamond(spark):
    from i2o_transform_spark.operators.graph import harmonic_closeness

    # a->b->d and a->c->d and a->d: d reached at dist 1, 2, 2 -> counts at 1
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "d"), ("c", "d")],
        "src string, dst string",
    )
    got = {r.node: (r.closeness_scaled, r.n_reached)
           for r in harmonic_closeness(edges, max_hops=3).collect()}
    assert got["a"] == (3_000_000, 3)  # b, c, d all at distance 1
