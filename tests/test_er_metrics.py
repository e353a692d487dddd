"""ER quality metrics: hand-computed golden + brute-force pair equivalence."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from i2o_transform_spark.operators.er_metrics import (
    blocking_quality,
    clustering_quality,
)


def test_clustering_quality_golden(spark):
    # gold: {1,2,3} {4,5} {6}; pred: {1,2} {3,4,5} {6}
    rows = [
        (1, "X", "A"), (2, "X", "A"), (3, "Y", "A"),
        (4, "Y", "B"), (5, "Y", "B"), (6, "Z", "C"),
    ]
    df = spark.createDataFrame(
        rows, "record_id int, pred_cluster string, gold_cluster string"
    )
    got = clustering_quality(df).collect()[0].asDict()
    # tp pairs: (1,2) from X, (4,5) from Y -> 2; pred C(2)+C(3)=4; gold 3+1=4
    assert got == {
        "tp_pairs": 2, "pred_pairs": 4, "gold_pairs": 4,
        "precision_ppm": 500000, "recall_ppm": 500000, "f1_ppm": 500000,
    }


def _brute_prf(assign):
    pred_pairs = {
        frozenset(p) for p in itertools.combinations(range(len(assign)), 2)
        if assign[p[0]][0] == assign[p[1]][0]
    }
    gold_pairs = {
        frozenset(p) for p in itertools.combinations(range(len(assign)), 2)
        if assign[p[0]][1] == assign[p[1]][1]
    }
    tp = len(pred_pairs & gold_pairs)
    return tp, len(pred_pairs), len(gold_pairs)


def test_clustering_quality_matches_bruteforce_random(spark):
    rng = random.Random(7)
    assign = [(rng.randrange(5), rng.randrange(4)) for _ in range(60)]
    df = spark.createDataFrame(
        [(i, p, g) for i, (p, g) in enumerate(assign)],
        "record_id int, pred_cluster int, gold_cluster int",
    )
    got = clustering_quality(df).collect()[0].asDict()
    tp, pp, gp = _brute_prf(assign)
    assert (got["tp_pairs"], got["pred_pairs"], got["gold_pairs"]) == (
        tp, pp, gp
    )
    assert got["precision_ppm"] == tp * 1_000_000 * 2 // (pp * 2)
    assert got["recall_ppm"] == tp * 1_000_000 * 2 // (gp * 2)


def test_blocking_quality_golden(spark):
    # 4 records; gold pairs: {1,2}, {3,4}.  Blocks: b1={1,2,3}, b2={3,4},
    # and record 1 also in b2?  Keep simple: 1,2,3 share b1; 3,4 share b2.
    blocks = spark.createDataFrame(
        [(1, "b1"), (2, "b1"), (3, "b1"), (3, "b2"), (4, "b2")],
        "record_id int, block_key string",
    )
    gold = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "B")],
        "record_id int, gold_cluster string",
    )
    got = blocking_quality(blocks, gold).collect()[0].asDict()
    # co-blocked distinct pairs: (1,2),(1,3),(2,3),(3,4) = 4
    # covered gold pairs: (1,2) and (3,4) = 2 of 2; total = C(4,2) = 6
    assert got == {
        "candidate_pairs": 4, "covered_gold_pairs": 2, "gold_pairs": 2,
        "total_pairs": 6,
        "pair_completeness_ppm": 1_000_000,
        # (6-4)/6 = 333333 ppm
        "reduction_ratio_ppm": 333333,
    }


def test_multiblock_pair_counted_once(spark):
    # the same pair co-blocked under two keys must count once
    blocks = spark.createDataFrame(
        [(1, "x"), (2, "x"), (1, "y"), (2, "y"), (3, "z")],
        "record_id int, block_key string",
    )
    gold = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")],
        "record_id int, gold_cluster string",
    )
    got = blocking_quality(blocks, gold).collect()[0].asDict()
    assert got["candidate_pairs"] == 1
    assert got["covered_gold_pairs"] == 1


def test_clustering_plan_is_aggregation_only(spark):
    df = spark.range(1000).select(
        F.col("id").alias("record_id"),
        (F.col("id") % 7).alias("pred_cluster"),
        (F.col("id") % 5).alias("gold_cluster"),
    )
    plan = clustering_quality(df)._jdf.queryExecution().executedPlan().toString()
    # no sort-merge join / cartesian over record-scale data: the only joins
    # are the three 1-row metric frames (broadcast nested loop is fine there)
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
