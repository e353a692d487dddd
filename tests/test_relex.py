"""Distant-supervision relation extraction (operators/relex.py)."""

from __future__ import annotations

from i2o_transform_spark.operators.relex import (
    apply_patterns,
    mine_patterns,
)


def _dfs(spark):
    pairs = spark.createDataFrame(
        [
            ("a1", "b1", "  Works   AT "),   # aligned: emp
            ("a2", "b2", "works at"),         # aligned: emp
            ("a3", "b3", "works\tat"),        # aligned: loc (contamination)
            ("a4", "b4", "works at"),         # unaligned -> candidate
            ("a1", "b1", "single support"),   # below min_support
            ("a9", "b9", "works at"),         # unaligned -> candidate
        ],
        "subj string, obj string, between string",
    )
    kb = spark.createDataFrame(
        [("a1", "emp", "b1"), ("a2", "emp", "b2"), ("a3", "loc", "b3")],
        "subj string, pred string, obj string",
    )
    return pairs, kb


def test_mining_normalizes_splits_and_floors(spark):
    pairs, kb = _dfs(spark)
    rows = {(r["pattern"], r["pred"]): r for r in
            mine_patterns(pairs, kb, min_support=2).collect()}
    assert set(rows) == {("works at", "emp")}  # loc has support 1 -> cut
    r = rows[("works at", "emp")]
    assert (r["n_support"], r["n_pattern"], r["conf_ppm"]) == (2, 3, 666666)
    # with min_support=1 the ambiguous split appears
    both = {(r["pattern"], r["pred"]): r["conf_ppm"] for r in
            mine_patterns(pairs, kb, min_support=1).collect()}
    assert both[("works at", "loc")] == 333333
    assert both[("single support", "emp")] == 1000000


def test_application_emits_only_new_triples(spark):
    pairs, kb = _dfs(spark)
    mined = mine_patterns(pairs, kb, min_support=2)
    got = sorted(
        map(tuple, apply_patterns(pairs, mined, kb,
                                  min_conf_ppm=600_000).collect())
    )
    # a1/a2 already in KB under emp; a3 proposed as emp (not loc -> new);
    # a4/a9 are the genuinely new extractions
    assert got == [
        ("a3", "emp", "b3", 1),
        ("a4", "emp", "b4", 1),
        ("a9", "emp", "b9", 1),
    ]
    # raising the gate above the ambiguous pattern's ppm silences it
    assert apply_patterns(pairs, mined, kb,
                          min_conf_ppm=700_000).count() == 0
