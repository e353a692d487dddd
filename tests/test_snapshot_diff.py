from __future__ import annotations

from i2o_transform_spark.operators.cdc import snapshot_diff


def test_snapshot_diff_counts(spark):
    old = spark.createDataFrame(
        [("a", "p", "1"), ("b", "p", "2"), ("c", "q", "3")],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [("a", "p", "1"), ("b", "p", "9"), ("d", "r", "4")],
        "subj string, pred string, obj string",
    )
    got = {r.pred: (r.n_added, r.n_removed, r.n_unchanged)
           for r in snapshot_diff(old, new).collect()}
    assert got == {"p": (1, 1, 1), "q": (0, 1, 0), "r": (1, 0, 0)}


def test_snapshot_diff_set_semantics_and_identity(spark):
    dup = spark.createDataFrame(
        [("a", "p", "1"), ("a", "p", "1")],
        "subj string, pred string, obj string",
    )
    got = {r.pred: (r.n_added, r.n_removed, r.n_unchanged)
           for r in snapshot_diff(dup, dup).collect()}
    # duplicates collapse; identical snapshots -> pure unchanged
    assert got == {"p": (0, 0, 1)}
