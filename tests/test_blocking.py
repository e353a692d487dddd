from __future__ import annotations

from i2o_transform_spark.operators.blocking import (
    global_rank,
    sorted_neighborhood_pairs,
)


def test_global_rank_matches_sorted_order_across_partitions(spark):
    rows = [(i, f"k{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "id int, k string")
    got = {
        r.id: r._rank
        for r in global_rank(df, ["k", "id"], partitions=5).collect()
    }
    expect = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == expect


def test_snm_pairs_window3(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "record_id int, k string"
    )
    got = {
        (r.id_a, r.id_b, r.gap)
        for r in sorted_neighborhood_pairs(
            df, key_col="k", window=3
        ).collect()
    }
    assert got == {
        (1, 2, 1), (2, 3, 1), (3, 4, 1), (1, 3, 2), (2, 4, 2),
    }


def test_snm_tie_break_is_deterministic(spark):
    # identical keys: order falls back to record_id, so pairs are stable
    df = spark.createDataFrame(
        [(10, "x"), (7, "x"), (9, "x")], "record_id int, k string"
    )
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, key_col="k", window=2
        ).collect()
    }
    assert got == {(7, 9), (9, 10)}
