from __future__ import annotations

import random

from i2o_transform_spark.operators.graph import (
    incremental_components,
    label_propagation_components,
)


def _labels(df):
    return {r.node: r.root for r in df.collect()}


def test_incremental_equals_full_recompute_random(spark):
    rng = random.Random(11)
    nodes = list(range(60))
    all_edges = sorted({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)
    })
    rng.shuffle(all_edges)
    base, delta = all_edges[:45], all_edges[45:]
    base_df = spark.createDataFrame(base, "src int, dst int")
    delta_df = spark.createDataFrame(delta, "src int, dst int")
    full_df = spark.createDataFrame(base + delta, "src int, dst int")
    labels = label_propagation_components(base_df)
    inc = _labels(incremental_components(labels, delta_df))
    full = _labels(label_propagation_components(full_df))
    # full recompute only covers nodes with edges; incremental covers the
    # same set here since every base node has an edge
    assert inc == full


def test_incremental_new_nodes_and_untouched_components(spark):
    base = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], "src int, dst int"
    )
    labels = label_propagation_components(base)
    # delta: merge {10,11} with {20,21}, and attach brand-new nodes 30-31
    delta = spark.createDataFrame(
        [(11, 20), (30, 31)], "src int, dst int"
    )
    got = _labels(incremental_components(labels, delta))
    assert got == {1: 1, 2: 1, 3: 1,
                   10: 10, 11: 10, 20: 10, 21: 10,
                   30: 30, 31: 30}


def test_incremental_empty_delta_is_identity(spark):
    base = spark.createDataFrame([(1, 2), (3, 4)], "src int, dst int")
    labels = label_propagation_components(base)
    delta = spark.createDataFrame([], "src int, dst int")
    assert _labels(incremental_components(labels, delta)) == _labels(labels)
