from __future__ import annotations

from i2o_transform_spark.operators.align import (
    align_vocabularies,
    normalize_name,
)


def test_normalize_name(spark):
    df = spark.createDataFrame([("Brand#22  ACME-Widget!",)], "s string")
    got = df.select(normalize_name("s").alias("n")).collect()[0].n
    assert got == "brand 22 acme widget"


def test_align_exact_fuzzy_and_threshold(spark):
    left = spark.createDataFrame(
        [
            (1, "Small Ring Brand#2 ECONOMY"),   # exact (case-insensitive)
            (2, "red widget deluxe kit"),        # token-reversed on right
            (3, "blue bolt titan grade"),        # 2-of-6-union: below 0.5
            (4, "hot gear"),                     # no candidate at all
        ],
        "concept_id long, name string",
    )
    right = spark.createDataFrame(
        [
            (101, "small ring brand 2 economy"),
            (102, "kit deluxe widget red"),
            (103, "blue bolt steel mesh"),
            (104, "cold plate"),
        ],
        "concept_id long, name string",
    )
    got = {
        r.left_id: (r.right_id, r.method, r.score_ppm)
        for r in align_vocabularies(left, right).collect()
    }
    assert got[1] == (101, "exact", 1_000_000)
    assert got[2] == (102, "fuzzy", 1_000_000)  # same token SET
    # blue bolt vs {steel mesh}: J = 2/6 < 0.5 -> excluded; no row for 3/4
    assert 3 not in got and 4 not in got


def test_align_election_prefers_score_then_min_id(spark):
    left = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "concept_id long, name string"
    )
    right = spark.createDataFrame(
        [
            (300, "alpha beta gamma epsilon"),  # J = 3/5
            (200, "alpha beta gamma delta x"),  # J = 4/5 -> wins on score
            (100, "alpha beta gamma zeta"),     # J = 3/5
        ],
        "concept_id long, name string",
    )
    got = align_vocabularies(left, right).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.right_id, r.method, r.score_ppm) == (200, "fuzzy", 800_000)
    # tie case: two rights at the same score elect the smaller id
    right2 = spark.createDataFrame(
        [(300, "alpha beta gamma epsilon"), (100, "alpha beta gamma zeta")],
        "concept_id long, name string",
    )
    r2 = align_vocabularies(left, right2).collect()[0]
    assert (r2.right_id, r2.score_ppm) == (100, 600_000)
