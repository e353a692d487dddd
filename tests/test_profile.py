"""Relational profiling (operators/profile): FD mining + key profiling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.operators.profile import (
    mine_functional_deps,
    profile_keys,
)


@pytest.fixture(scope="module")
def rel(spark):
    # a=1 -> b=x (2 rows), a=2 -> b in {x,y,y} (violating, plurality y),
    # a=3 -> null b (excluded), null a (excluded)
    return spark.createDataFrame(
        [(1, "x", 10), (1, "x", 11), (2, "x", 12), (2, "y", 16),
         (2, "y", 13), (3, None, 14), (None, "z", 15)],
        "a int, b string, c int",
    ).cache()


def test_fd_holds_and_g3(rel):
    got = {r.lhs: r for r in mine_functional_deps(
        rel, [("a", "b"), ("c", "b")]
    ).collect()}
    fd = got["a"]
    # groups: a=1 (clean), a=2 (2 distinct b) — null rows excluded
    assert (fd.n_groups, fd.n_violating_groups, fd.holds) == (2, 1, False)
    # g3: keep 2 (a=1) + 2 (plurality y of a=2) of 5 rows = 800000 ppm
    assert fd.g3_confidence_ppm == 800000
    # c is row-unique where non-null -> determines b exactly
    assert got["c"].holds and got["c"].g3_confidence_ppm == 1_000_000


def test_fd_composite_lhs_via_expression(rel):
    rel2 = rel.withColumn("ab", F.concat_ws("|", "a", "c"))
    out = mine_functional_deps(rel2, [("ab", "b")]).collect()[0]
    assert out.holds  # (a, c) is a key of the non-null projection


def test_fd_empty_pairs_raises(rel):
    with pytest.raises(ValueError):
        mine_functional_deps(rel, [])


def test_profile_keys(rel):
    got = {r.column: r for r in profile_keys(rel, ["a", "b", "c"]).collect()}
    assert got["c"].is_key and got["c"].uniqueness_ppm == 1_000_000
    assert not got["a"].is_key          # has a null
    assert got["a"].n_nonnull == 6 and got["a"].n_distinct == 3
    assert got["a"].uniqueness_ppm == 500000
    assert got["b"].n_rows == 7 and not got["b"].is_key


def test_profile_keys_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "x int, y string")
    got = {r.column: r for r in profile_keys(df, ["y"]).collect()}
    assert got["y"].uniqueness_ppm == 0 and not got["y"].is_key
