from __future__ import annotations

from i2o_transform_spark.operators.summarize import (
    bisimulation_classes,
    summary_graph,
)


def _g(spark):
    # u1, u2 are structurally identical; u3 differs only at depth 2:
    # its order points at a different status.
    edges = spark.createDataFrame(
        [
            ("u1", "placed", "o1"), ("u2", "placed", "o2"),
            ("u3", "placed", "o3"),
            ("o1", "status", "F"), ("o2", "status", "F"),
            ("o3", "status", "P"),
        ],
        "src string, pred string, dst string",
    )
    types = spark.createDataFrame(
        [("u1", "User"), ("u2", "User"), ("u3", "User"),
         ("o1", "Order"), ("o2", "Order"), ("o3", "Order"),
         ("F", "Status_F"), ("P", "Status_P")],
        "node string, type string",
    )
    return edges, types


def test_bisim_k1_cannot_see_depth2_difference(spark):
    edges, types = _g(spark)
    cls = {r.node: r.cls
           for r in bisimulation_classes(edges, types, k=1).collect()}
    assert cls["u1"] == cls["u2"] == cls["u3"]  # orders look alike at k=0
    assert cls["o1"] == cls["o2"] != cls["o3"]  # statuses differ at k=0


def test_bisim_k2_separates_by_neighbor_structure(spark):
    edges, types = _g(spark)
    cls = {r.node: r.cls
           for r in bisimulation_classes(edges, types, k=2).collect()}
    assert cls["u1"] == cls["u2"]
    assert cls["u1"] != cls["u3"]


def test_summary_graph_counts(spark):
    edges, types = _g(spark)
    labels = bisimulation_classes(edges, types, k=2)
    summ = summary_graph(edges, labels).collect()
    by = {(r.src_class, r.pred, r.dst_class): r.n_edges for r in summ}
    # u1+u2 contract to one class placing 2 edges into the o1/o2 class
    assert sorted(by.values()) == [1, 1, 2, 2]
    assert sum(by.values()) == 6


def test_bisim_leaf_and_edgeless_nodes_keep_type_chain(spark):
    edges = spark.createDataFrame(
        [("a", "p", "b")], "src string, pred string, dst string"
    )
    types = spark.createDataFrame(
        [("a", "T"), ("b", "T"), ("c", "T")], "node string, type string"
    )
    cls = {r.node: r.cls
           for r in bisimulation_classes(edges, types, k=2).collect()}
    # b and c both have no out-edges and the same type -> same class;
    # a differs (it has an out-edge).
    assert cls["b"] == cls["c"] != cls["a"]


def test_bisim_hub_guard_collapses_over_cap_hubs(spark):
    from i2o_transform_spark.operators.summarize import bisimulation_classes

    # h1 fans out to a0..a9, h2 to b0..b9 (different neighborhoods), n1
    # has a single edge.  With cap 5 both hubs exceed it and collapse to
    # the same *HUB* class despite different neighbors; n1 stays distinct.
    edges = [("h1", "p", f"a{i}") for i in range(10)]
    edges += [("h2", "p", f"b{i}") for i in range(10)]
    edges += [("n1", "p", "a0")]
    e = spark.createDataFrame(edges, "src string, pred string, dst string")
    nodes = {s for t in edges for s in (t[0], t[2])}
    # the two hub neighborhoods carry DIFFERENT types, so exact mode can
    # tell the hubs apart while the capped mode deliberately cannot
    types = spark.createDataFrame(
        [(n, "A" if n.startswith("a") else "B" if n.startswith("b")
          else "T") for n in sorted(nodes)],
        "node string, type string",
    )
    capped = {r.node: r.cls
              for r in bisimulation_classes(e, types, k=1,
                                            max_out_degree=5).collect()}
    assert capped["h1"] == capped["h2"]          # hubs collapse
    assert capped["h1"] != capped["n1"]          # non-hub stays apart
    exact = {r.node: r.cls
             for r in bisimulation_classes(e, types, k=1,
                                           max_out_degree=None).collect()}
    assert exact["h1"] != exact["h2"]            # exact mode distinguishes
