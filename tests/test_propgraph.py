from __future__ import annotations

import json

from i2o_transform_spark.sources.propgraph import (
    parse_edge_lines,
    parse_node_lines,
    to_edge_lines,
    to_node_lines,
)


def test_node_lines_are_valid_json_and_roundtrip(spark):
    nodes = spark.createDataFrame(
        [("n1", "User", 'evil "name"\twith\\stuff\n'),
         ("n2", "User", "plain")],
        "id string, label string, name string",
    )
    lines = to_node_lines(nodes, prop_cols=["name"]).collect()
    # every line must be REAL JSON (python's parser is the neutral judge)
    parsed = {json.loads(r.line)["id"]: json.loads(r.line) for r in lines}
    assert parsed["n1"]["props"]["name"] == 'evil "name"\twith\\stuff\n'
    back = {
        r.id: (r.label, r.name)
        for r in parse_node_lines(
            to_node_lines(nodes, prop_cols=["name"]), prop_cols=["name"]
        ).collect()
    }
    assert back == {"n1": ("User", 'evil "name"\twith\\stuff\n'),
                    "n2": ("User", "plain")}


def test_edge_lines_roundtrip(spark):
    edges = spark.createDataFrame(
        [("a", "b", "knows", "2024")],
        "src string, dst string, label string, since string",
    )
    out = parse_edge_lines(
        to_edge_lines(edges, prop_cols=["since"]), prop_cols=["since"]
    ).collect()
    assert [(r.src, r.dst, r.label, r.since) for r in out] == [
        ("a", "b", "knows", "2024")
    ]
