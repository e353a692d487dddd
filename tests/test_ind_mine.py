"""Unary IND mining (profile.mine_unary_inds): exact/partial
containment, NULL exclusion, threshold, direction asymmetry."""

from __future__ import annotations

from i2o_transform_spark.operators.profile import mine_unary_inds

AV = "attr string, value string"


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_exact_and_partial_inds(spark):
    av = spark.createDataFrame(
        # fk ⊆ pk exactly; pk has extra values (reverse is partial)
        [("fk", "1"), ("fk", "2"),
         ("pk", "1"), ("pk", "2"), ("pk", "3"), ("pk", "4")],
        AV,
    )
    got = rows(mine_unary_inds(av))
    assert ("fk", "pk", 1_000_000) in got
    assert ("pk", "fk", 500_000) in got  # 2 of 4
    assert len(got) == 2


def test_threshold_filters(spark):
    av = spark.createDataFrame(
        [("a", "1"), ("a", "2"), ("a", "3"),
         ("b", "1"), ("b", "9"), ("b", "8")],
        AV,
    )
    # overlap 1/3 = 333333 ppm both directions
    assert rows(mine_unary_inds(av, min_containment_ppm=400_000)) == set()
    got = rows(mine_unary_inds(av, min_containment_ppm=300_000))
    assert got == {("a", "b", 333_333), ("b", "a", 333_333)}


def test_nulls_excluded_and_dupes_collapse(spark):
    av = spark.createDataFrame(
        [("x", "1"), ("x", "1"), ("x", None),
         ("y", "1"), ("y", None)],
        AV,
    )
    got = rows(mine_unary_inds(av))
    # x has one non-null distinct value, fully contained in y and back
    assert got == {("x", "y", 1_000_000), ("y", "x", 1_000_000)}


def test_disjoint_attrs_emit_nothing(spark):
    av = spark.createDataFrame(
        [("a", "1"), ("b", "2")], AV
    )
    assert rows(mine_unary_inds(av)) == set()
