"""VoID dataset statistics (operators/void): partition semantics, schema
stability, approx path, extra-column tolerance."""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.void import void_statistics

T = "subj string, pred string, obj string"


@pytest.fixture(scope="module")
def g(spark):
    return spark.createDataFrame(
        [("a", "knows", "b"), ("a", "knows", "c"), ("b", "knows", "c"),
         ("a", "rdf:type", "Person"), ("b", "rdf:type", "Person"),
         ("c", "rdf:type", "Org"),
         ("a", "name", "alice"), ("b", "name", "alice")],
        T,
    ).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_partitions_exact(g):
    got = rows(void_statistics(g))
    assert ("dataset", "", 8, 3, 5, 3) in got  # objs {b,c,Person,Org,alice}
    assert ("property", "knows", 3, 2, 2, 1) in got
    assert ("property", "rdf:type", 3, 3, 2, 1) in got
    assert ("property", "name", 2, 2, 1, 1) in got
    assert ("class", "Person", 2, 2, 1, 1) in got
    assert ("class", "Org", 1, 1, 1, 1) in got
    assert len(got) == 6


def test_schema_fixed(g):
    cols = void_statistics(g).columns
    assert cols == ["partition", "key", "n_triples", "n_subjects",
                    "n_objects", "n_predicates"]


def test_no_type_triples_empty_class_partition(spark):
    df = spark.createDataFrame([("a", "knows", "b")], T)
    got = rows(void_statistics(df))
    assert got == {("dataset", "", 1, 1, 1, 1),
                   ("property", "knows", 1, 1, 1, 1)}


def test_extra_columns_ignored(spark):
    df = spark.createDataFrame(
        [("a", "label", "x", "en"), ("a", "label", "x", "fr")],
        "subj string, pred string, obj string, obj_lang string")
    got = rows(void_statistics(df))
    # statistics are lexical S/P/O: the two tagged rows are 2 triples,
    # 1 distinct object
    assert ("dataset", "", 2, 1, 1, 1) in got


def test_approx_same_shape_small_exact(g):
    # HLL on tiny cardinalities is exact; schema identical
    exact = void_statistics(g)
    approx = void_statistics(g, exact=False)
    assert approx.columns == exact.columns
    assert rows(approx) == rows(exact)


def test_custom_type_pred(g):
    got = rows(void_statistics(g, type_pred="knows"))
    assert ("class", "c", 2, 2, 1, 1) in got  # a,b "type" c


def test_void_graph_statistics_null_graph_and_approx(spark):
    from i2o_transform_spark.operators.void import void_graph_statistics

    quads = spark.createDataFrame(
        [
            ("g1", "s1", "p", "o1"), ("g1", "s1", "p", "o2"),
            ("g1", "s2", "q", "o1"),
            (None, "s1", "p", "o1"),  # default graph must NOT vanish
        ],
        "graph string, subj string, pred string, obj string",
    )
    rows = {(r["graph"], r["partition"], r["key"]):
            (r["n_triples"], r["n_subjects"], r["n_objects"])
            for r in void_graph_statistics(quads).collect()}
    assert rows[("g1", "dataset", None)] == (3, 2, 2)
    assert rows[("g1", "property", "p")] == (2, 1, 2)
    assert rows[("g1", "property", "q")] == (1, 1, 1)
    assert rows[(None, "dataset", None)] == (1, 1, 1)
    assert rows[(None, "property", "p")] == (1, 1, 1)
    approx = {(r["graph"], r["partition"], r["key"]):
              (r["n_triples"], r["n_subjects"], r["n_objects"])
              for r in void_graph_statistics(quads, exact=False).collect()}
    assert approx == rows  # HLL exact at tiny cardinality
