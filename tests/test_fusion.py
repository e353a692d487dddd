"""Record fusion: per-attribute survivorship policies, deterministic ties."""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.fusion import fuse_records

SCHEMA = ("cluster long, name string, phone string, kind string, "
          "ts long, src long")

ROWS = [
    # cluster 1: conflicts everywhere
    (1, "Alice Smith", "111", "person", 10, 2),
    (1, "A. Smith",    "222", "person", 30, 1),
    (1, "Alice",       None,  "robot",  20, 3),
    (1, "Alice",       "333", "person", 30, 0),
    # cluster 2: unanimous
    (2, "Bob", "555", "person", 5, 1),
    (2, "Bob", "555", "person", 6, 1),
    # cluster 3: all-null phone
    (3, "Carol", None, "org", 1, 9),
]


def _fuse(spark, policies, **kw):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = fuse_records(df, "cluster", policies, **kw)
    return {r["cluster"]: r.asDict() for r in out.collect()}


def test_fusion_policies_and_ties(spark):
    got = _fuse(
        spark,
        {"name": "longest", "phone": "newest", "kind": "mode",
         "ts": "max", "src": "min"},
        ts_col="ts",
    )
    c1 = got[1]
    assert c1["n_members"] == 4
    assert c1["name"] == "Alice Smith"          # longest
    # newest: ts=30 twice ("222" vs "333") -> tie to LARGEST value
    assert c1["phone"] == "333"
    assert c1["kind"] == "person"               # plurality 3 vs 1
    assert (c1["ts"], c1["src"]) == (30, 0)
    assert c1["name_n_values"] == 3 and c1["phone_n_values"] == 3
    assert c1["kind_n_values"] == 2
    c2 = got[2]
    assert c2["phone"] == "555" and c2["phone_n_values"] == 1
    c3 = got[3]
    assert c3["phone"] is None and c3["phone_n_values"] == 0


def test_fusion_mode_tie_and_prefer(spark):
    got = _fuse(
        spark,
        {"name": "mode", "phone": "prefer", "ts": "oldest"},
        ts_col="ts", priority_col="src",
    )
    # cluster 1 name counts: Alice=2, others 1 -> "Alice"
    assert got[1]["name"] == "Alice"
    # prefer: smallest src with non-null phone -> src=0 -> "333"
    assert got[1]["phone"] == "333"
    # oldest ts=10; ties impossible here; all-null phone cluster ok
    assert got[1]["ts"] == 10
    assert got[3]["phone"] is None


def test_fusion_mode_tie_smallest_value(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (1, "a"), (1, "b")], "cluster long, v string"
    )
    out = fuse_records(df, "cluster", {"v": "mode"}).collect()[0]
    assert out["v"] == "a"  # 2-2 tie -> smallest


@pytest.mark.parametrize("policies, kw, msg", [
    ({"name": "newest"}, {}, "needs ts_col"),
    ({"name": "prefer"}, {}, "needs priority_col"),
    ({"name": "bogus"}, {}, "unknown policy"),
])
def test_fusion_errors(spark, policies, kw, msg):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match=msg):
        fuse_records(df, "cluster", policies, **kw).collect()
