"""Truth discovery (operators/truth.py) + fuzzy linking (operators/fuzzy.py).

* planted-reliability golden: the weighted round-2 vote recovers the truth
  on an item where plain majority is wrong (the headline property of
  TruthFinder-family conflict resolution),
* SymSpell blocking completeness: blocked fuzzy_link == brute-force cross
  join on randomized strings (includes the empty-string edge).
"""

from __future__ import annotations

import random

from i2o_transform_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_link,
    fuzzy_link_bruteforce,
)
from i2o_transform_spark.operators.truth import (
    resolve_conflicts,
    source_accuracy,
    vote,
)

from pyspark.sql import functions as F


def _planted_claims(spark):
    # Items 0..7: A,B assert the truth (item*10); C,D,E each assert a
    # DIFFERENT wrong value (no collusion) -> majority elects the truth.
    # Item 8: C,D,E collude on 81 vs A,B's truth 80 -> majority is WRONG,
    # but A,B's higher learned reliability (8/9 vs 1/9) flips it in round 2.
    rows = []
    for item in range(8):
        rows += [("A", item, item * 10), ("B", item, item * 10)]
        rows += [
            ("C", item, item * 10 + 1),
            ("D", item, item * 10 + 2),
            ("E", item, item * 10 + 3),
        ]
    rows += [("A", 8, 80), ("B", 8, 80)]
    rows += [(s, 8, 81) for s in ("C", "D", "E")]
    return spark.createDataFrame(rows, "src string, item long, val long")


def test_weighted_vote_flips_colluding_majority(spark):
    claims = _planted_claims(spark)
    majority = {
        r["item"]: r["val"]
        for r in resolve_conflicts(
            claims, ["item"], "val", "src", rounds=1
        ).collect()
    }
    assert majority[8] == 81  # plain majority falls for the collusion
    assert all(majority[i] == i * 10 for i in range(8))
    resolved = {
        r["item"]: r["val"]
        for r in resolve_conflicts(
            claims, ["item"], "val", "src", rounds=2
        ).collect()
    }
    assert resolved == {i: i * 10 for i in range(8)} | {8: 80}


def test_source_accuracy_weights(spark):
    claims = _planted_claims(spark)
    w1 = vote(claims, ["item"], "val", "src", None)
    acc = {
        r["src"]: r["wt"]
        for r in source_accuracy(
            claims, w1, ["item"], "val", "src"
        ).collect()
    }
    # A,B match round-1 winners on items 0..7 (8/9); C,D,E only on item 8.
    assert acc["A"] == acc["B"] == (8 * 1_000_000) // 9
    assert acc["C"] == acc["D"] == acc["E"] == (1 * 1_000_000) // 9


def test_vote_tie_breaks_to_smallest_value(spark):
    claims = spark.createDataFrame(
        [("s1", 0, 7), ("s2", 0, 3)], "src string, item long, val long"
    )
    [r] = vote(claims, ["item"], "val", "src", None).collect()
    assert r["val"] == 3 and r["n_sources"] == 1


def test_deletion_variants_include_self_and_all_deletions(spark):
    [r] = (
        spark.range(1)
        .select(deletion_variants(F.lit("abc")).alias("v"))
        .collect()
    )
    assert sorted(r["v"]) == ["ab", "abc", "ac", "bc"]
    [r] = (
        spark.range(1)
        .select(deletion_variants(F.lit("")).alias("v"))
        .collect()
    )
    assert r["v"] == [""]


def test_fuzzy_blocking_matches_bruteforce(spark):
    rng = random.Random(42)
    alpha = "abc"
    names = sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 5)))
            for _ in range(40)
        }
    )
    dictionary = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)],
        "entity_id long, entity_name string",
    )
    ments = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 5)))
        for _ in range(60)
    ]
    mentions = spark.createDataFrame(
        [(i, m) for i, m in enumerate(ments)],
        "mention_id long, mention string",
    )
    blocked = sorted(
        map(tuple, fuzzy_link(mentions, dictionary).collect())
    )
    brute = sorted(
        map(tuple, fuzzy_link_bruteforce(mentions, dictionary).collect())
    )
    assert blocked == brute
    assert blocked  # the random corpus does produce matches
