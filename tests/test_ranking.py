"""link_prediction_ranks (operators/ranking.py): randomized equivalence vs
a brute-force pandas ranking, deterministic tie-break golden, and the
single-logical-shuffle plan property."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import Row

from i2o_transform_spark.operators.ranking import link_prediction_ranks


def _brute(scores: pd.DataFrame, truth: dict) -> dict:
    out = {}
    for q, grp in scores.groupby("q"):
        tc = truth[q]
        ts = int(grp.loc[grp["cand"] == tc, "score"].iloc[0])
        better = sum(
            1
            for _, r in grp.iterrows()
            if (r["score"], r["cand"]) < (ts, tc)
        )
        out[q] = (tc, ts, better + 1)
    return out


def test_randomized_vs_bruteforce(spark):
    rng = random.Random(7)
    rows, truth = [], {}
    for q in range(40):
        cands = list(range(rng.randint(2, 12)))
        truth[q] = rng.choice(cands)
        for c in cands:
            # small score range forces plenty of ties
            rows.append(Row(q=q, cand=c, score=rng.randint(0, 4)))
    scores = spark.createDataFrame(rows)
    tdf = spark.createDataFrame(
        [Row(q=q, cand=c) for q, c in truth.items()]
    )
    got = {
        r.q: (r.true_cand, r.true_score, r.rnk)
        for r in link_prediction_ranks(scores, tdf, ["q"]).collect()
    }
    want = _brute(pd.DataFrame([r.asDict() for r in rows]), truth)
    assert got == want


def test_tie_break_golden(spark):
    # all scores equal: rank of true cand 2 among {0,1,2,3} is 3
    scores = spark.createDataFrame(
        [Row(q=1, cand=c, score=5) for c in range(4)]
    )
    tdf = spark.createDataFrame([Row(q=1, cand=2)])
    r = link_prediction_ranks(scores, tdf, ["q"]).collect()[0]
    assert (r.rnk, r.hit1, r.true_score) == (3, 0, 5)


def test_hit1_and_exchange_reuse(spark):
    scores = spark.createDataFrame(
        [Row(q=1, cand=0, score=9), Row(q=1, cand=1, score=2),
         Row(q=2, cand=0, score=1), Row(q=2, cand=1, score=1)]
    )
    tdf = spark.createDataFrame([Row(q=1, cand=1), Row(q=2, cand=0)])
    out = link_prediction_ranks(scores, tdf, ["q"])
    got = {r.q: (r.rnk, r.hit1) for r in out.collect()}
    assert got == {1: (1, 1), 2: (1, 1)}
    # the rank is aggregation-only and join-based: no window sort over
    # candidate lists, no cartesian product anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
