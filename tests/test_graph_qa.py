"""Graph QA operators: cycle taint detection + bounded shortest paths."""

from __future__ import annotations

import itertools
import random

from i2o_transform_spark.operators.graph import (
    bounded_shortest_paths,
    cycle_tainted_nodes,
)


def test_dag_has_no_tainted_nodes(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")],
        "src string, dst string",
    )
    assert cycle_tainted_nodes(edges).count() == 0


def test_cycle_taint_includes_downstream_only(spark):
    # cycle a->b->a, tail b->c->d downstream, e->a upstream (NOT tainted)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("e", "a")],
        "src string, dst string",
    )
    got = sorted(r["node"] for r in cycle_tainted_nodes(edges).collect())
    assert got == ["a", "b", "c", "d"]


def test_self_loop_is_a_cycle(spark):
    edges = spark.createDataFrame(
        [("x", "x"), ("x", "y"), ("p", "q")], "src string, dst string"
    )
    got = sorted(r["node"] for r in cycle_tainted_nodes(edges).collect())
    assert got == ["x", "y"]


def _bf_reference(edges, seeds, k):
    """Exact min-cost over all <=k-edge paths, brute force enumeration."""
    best = {s: 0 for s in seeds}
    frontier = dict(best)
    for _ in range(k):
        nxt = {}
        for (u, v, w) in edges:
            if u in frontier:
                c = frontier[u] + w
                if c < nxt.get(v, float("inf")):
                    nxt[v] = c
        for v, c in nxt.items():
            if c < best.get(v, float("inf")):
                best[v] = c
        frontier = nxt
    return best


def test_shortest_paths_match_reference_on_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(30)]
    edges = [
        (u, v, rng.randint(1, 9))
        for u, v in itertools.permutations(nodes, 2)
        if rng.random() < 0.08
    ]
    seeds = ["n0", "n1"]
    e = spark.createDataFrame(edges, "src string, dst string, w long")
    s = spark.createDataFrame([(x,) for x in seeds], "node string")
    got = {
        r["node"]: r["dist"]
        for r in bounded_shortest_paths(e, s, k=4).collect()
    }
    assert got == _bf_reference(edges, seeds, 4)


def test_shortest_paths_prefer_cheap_two_hop_over_expensive_direct(spark):
    e = spark.createDataFrame(
        [("a", "c", 10), ("a", "b", 1), ("b", "c", 2)],
        "src string, dst string, w long",
    )
    s = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in bounded_shortest_paths(e, s, 3).collect()}
    assert got == {"a": 0, "b": 1, "c": 3}


def test_propagate_labels_majority_tie_and_radius(spark):
    from i2o_transform_spark.operators.graph import propagate_labels

    # path 0-1-2-3-4-5-6-7; seeds: 2 -> A, 4 -> B, 6 -> B
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "src int, dst int"
    )
    seeds = spark.createDataFrame(
        [(2, "A"), (4, "B"), (6, "B")], "node int, label string"
    )
    got = {r.node: r.label
           for r in propagate_labels(edges, seeds, rounds=2).collect()}
    # round 1: 3 sees {A, B} -> tie -> "A"; 5 sees {B, B} -> B;
    # 1 sees {A} -> A; 7 sees {B} -> B
    # round 2: 0 sees {A} -> A; everything else labeled
    assert got == {2: "A", 4: "B", 6: "B",
                   1: "A", 3: "A", 5: "B", 7: "B", 0: "A"}


def test_propagate_labels_seeds_are_clamped(spark):
    from i2o_transform_spark.operators.graph import propagate_labels

    # seed 1 (A) surrounded by B-seeds must keep A
    edges = spark.createDataFrame(
        [(1, 2), (1, 3)], "src int, dst int"
    )
    seeds = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "B")], "node int, label string"
    )
    got = {r.node: r.label
           for r in propagate_labels(edges, seeds, rounds=3).collect()}
    assert got == {1: "A", 2: "B", 3: "B"}
