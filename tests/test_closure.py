from __future__ import annotations

from i2o_transform_spark.operators.graph import transitive_closure


def test_closure_diamond_min_max_diverge(spark):
    # a->b->d (2 hops) and a->c->e->d (3 hops): min and max differ on (a,d)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "d"), ("a", "c"), ("c", "e"), ("e", "d")],
        "child string, parent string",
    )
    got = {
        (r.descendant, r.ancestor): (r.min_levels, r.max_levels)
        for r in transitive_closure(edges).collect()
    }
    assert got[("a", "d")] == (2, 3)
    assert got[("a", "b")] == (1, 1)
    assert got[("a", "e")] == (2, 2)
    assert got[("c", "d")] == (2, 2)
    expect = {("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"),
              ("b", "d"), ("c", "e"), ("c", "d"), ("e", "d")}
    assert set(got) == expect


def test_closure_chain_needs_log_rounds(spark):
    # 20-node chain: depth 19 needs 5 squaring rounds (2^5 >= 19)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)], "child int, parent int"
    )
    got = {
        (r.descendant, r.ancestor): (r.min_levels, r.max_levels)
        for r in transitive_closure(edges).collect()
    }
    assert len(got) == 19 * 20 // 2
    assert got[(0, 19)] == (19, 19)
    assert all(mn == mx == anc - desc for (desc, anc), (mn, mx) in got.items())


def test_closure_vs_bruteforce_random_dag(spark):
    import random

    rng = random.Random(7)
    n = 40
    edge_list = sorted({
        (j, i)  # child j -> parent i < j keeps it acyclic
        for _ in range(120)
        for i, j in [sorted(rng.sample(range(n), 2))]
    })
    # brute force: DP over the DAG in topological (numeric) order
    import collections

    best: dict[tuple[int, int], list[int]] = collections.defaultdict(
        lambda: [1 << 30, -1]
    )
    parents = collections.defaultdict(list)
    for c, p in edge_list:
        parents[c].append(p)
    for c in range(n):  # children in increasing order; parents are smaller
        for p in parents[c]:
            mm = best[(c, p)]
            mm[0], mm[1] = min(mm[0], 1), max(mm[1], 1)
            for (d2, a2), (mn, mx) in list(best.items()):
                if d2 == p:
                    mm2 = best[(c, a2)]
                    mm2[0] = min(mm2[0], mn + 1)
                    mm2[1] = max(mm2[1], mx + 1)
    edges = spark.createDataFrame(edge_list, "child int, parent int")
    got = {
        (r.descendant, r.ancestor): (r.min_levels, r.max_levels)
        for r in transitive_closure(edges).collect()
    }
    assert got == {k: (v[0], v[1]) for k, v in best.items()}
