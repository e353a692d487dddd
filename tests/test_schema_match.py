"""Instance-based schema matching: value-overlap column correspondences."""

from __future__ import annotations

from i2o_transform_spark.operators.schema_match import match_schemas


def _rows(df):
    return {
        (r["left_col"], r["right_col"]): r.asDict() for r in df.collect()
    }


def test_match_schemas_counts_ppm_and_ranks(spark):
    left = spark.createDataFrame(
        [("1", "US", None), ("2", "FR", "x"), ("3", "US", "y"),
         ("4", "DE", "z")],
        "id string, country string, note string",
    )
    right = spark.createDataFrame(
        [("2", "US"), ("3", "IT"), ("9", "FR")],
        "ref string, nation string",
    )
    got = _rows(match_schemas(left, right))
    # id {1,2,3,4} vs ref {2,3,9}: shared {2,3} -> jaccard 2/5
    m = got[("id", "ref")]
    assert (m["n_left"], m["n_right"], m["n_shared"]) == (4, 3, 2)
    assert m["jaccard_ppm"] == 2 * 1_000_000 // 5
    assert m["contain_left_ppm"] == 500_000
    assert m["contain_right_ppm"] == 2 * 1_000_000 // 3
    assert m["kind_left"] == m["kind_right"] == "int" and m["kind_match"]
    assert m["rank"] == 1
    # country {US,FR,DE} vs nation {US,IT,FR}: shared {US,FR} -> 2/4
    c = got[("country", "nation")]
    assert (c["n_shared"], c["jaccard_ppm"]) == (2, 500_000)
    assert c["kind_left"] == "text" and c["kind_right"] == "text"
    assert c["kind_match"]
    # note overlaps nothing -> absent; zero-overlap pairs are not emitted
    assert ("note", "ref") not in got and ("note", "nation") not in got
    assert ("id", "nation") not in got  # numeric ids never match nations


def test_match_schemas_cross_kind_overlap_and_rank_order(spark):
    left = spark.createDataFrame(
        [("1", "1"), ("2", "2"), ("3", "5")], "a string, b string"
    )
    right = spark.createDataFrame(
        [("1",), ("2",), ("3",)], "x string"
    )
    got = _rows(match_schemas(left, right))
    # a {1,2,3} matches x fully; b {1,2,5} partially
    assert got[("a", "x")]["jaccard_ppm"] == 1_000_000
    assert got[("a", "x")]["rank"] == 1
    assert got[("b", "x")]["n_shared"] == 2
    assert got[("b", "x")]["rank"] == 1  # best (only) candidate for b


def test_match_schemas_nulls_excluded_and_kind_election(spark):
    left = spark.createDataFrame(
        [("2024-01-01",), ("2024-02-03",), ("oops",), (None,)],
        "d string",
    )
    right = spark.createDataFrame(
        [("2024-01-01",), ("1.5",), ("2.5",)], "e string"
    )
    got = _rows(match_schemas(left, right))
    m = got[("d", "e")]
    assert (m["n_left"], m["n_right"], m["n_shared"]) == (3, 3, 1)
    assert m["kind_left"] == "date"  # 2 of 3 distinct values
    assert m["kind_right"] == "dec"
    assert not m["kind_match"]
