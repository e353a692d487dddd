"""RDF-star (sources/ntriples_star): wire grammar, escape fidelity,
FAILFAST/PERMISSIVE, and the loss-free bridge to the reified store."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.operators.reify import dereify, reify
from i2o_transform_spark.sources.ntriples_star import (
    parse_ntriples_star_lines,
    rdfstar_to_reified,
    reified_to_rdfstar,
    to_ntriples_star_lines,
)

ANN = ("q_subj string, q_pred string, q_obj string, q_obj_is_iri boolean, "
       "pred string, obj string, obj_is_iri boolean")


def rows(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture(scope="module")
def ann(spark):
    return spark.createDataFrame(
        [
            ("http://s/1", "http://p/likes", "http://o/1", True,
             "http://q/conf", "0.9", False),
            # literal quoted object with every escape class + unicode
            ("http://s/1", "http://p/says", 'he said "hi"\n\tok\\é', False,
             "http://q/src", "http://crawl/w1", True),
            # two annotations of ONE quoted triple -> one statement node
            ("http://s/2", "http://p/likes", "http://o/1", True,
             "http://q/conf", "0.4", False),
            ("http://s/2", "http://p/likes", "http://o/1", True,
             "http://q/ts", "2026-01-01", False),
        ],
        ANN,
    ).cache()


def test_serialize_parse_roundtrip(spark, ann):
    lines = to_ntriples_star_lines(
        ann, q_obj_is_iri="q_obj_is_iri", obj_is_iri="obj_is_iri"
    )
    back = parse_ntriples_star_lines(lines)
    assert rows(back) == rows(ann)


def test_line_shape(spark, ann):
    lines = {
        r["line"]
        for r in to_ntriples_star_lines(
            ann, q_obj_is_iri="q_obj_is_iri", obj_is_iri="obj_is_iri"
        ).collect()
    }
    assert (
        "<< <http://s/1> <http://p/likes> <http://o/1> >> "
        '<http://q/conf> "0.9" .' in lines
    )


def test_nested_quoting_failfast(spark):
    bad = spark.createDataFrame(
        [('<< << <a> <b> <c> >> <d> "x" >> <e> "y" .',)], "line string"
    )
    with pytest.raises(Exception, match="malformed"):
        parse_ntriples_star_lines(bad).collect()


def test_permissive_quarantine(spark):
    mixed = spark.createDataFrame(
        [
            ('<< <a> <b> "v" >> <q> "1" .',),
            ("# comment",),
            ("junk line",),
        ],
        "line string",
    )
    out = parse_ntriples_star_lines(mixed, mode="PERMISSIVE")
    good = out.where(F.col("_corrupt_line").isNull())
    bad = out.where(F.col("_corrupt_line").isNotNull())
    assert good.count() == 1 and bad.count() == 1
    assert bad.collect()[0]["_corrupt_line"] == "junk line"


def test_bridge_to_reified_and_back(spark, ann):
    store = rdfstar_to_reified(ann)
    # dereify recovers exactly the distinct quoted triples
    assert rows(dereify(store)) == rows(
        ann.select("q_subj", "q_pred", "q_obj").distinct()
    )
    # the inverse bridge recovers the annotations (plain lexical store)
    back = reified_to_rdfstar(store)
    assert rows(back) == rows(
        ann.select("q_subj", "q_pred", "q_obj", "pred", "obj")
    )
    # shared statement node: s/2's two annotations produced ONE core set
    cores = store.where(F.col("pred") == "rdf:subject").count()
    assert cores == ann.select("q_subj", "q_pred", "q_obj").distinct().count()


def test_bare_reification_emits_no_annotations(spark):
    plain = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    store = reify(plain, qualifier_cols=[])
    assert reified_to_rdfstar(store).count() == 0


def test_reify_and_rdfstar_models_agree(spark, ann):
    """reify() over a qualifier-column frame and rdfstar_to_reified over
    the equivalent annotation rows build the SAME store."""
    wide = spark.createDataFrame(
        [("s", "p", "o", "17")],
        "subj string, pred string, obj string, qty string",
    )
    via_reify = reify(wide, qualifier_cols=["qty"])
    star = spark.createDataFrame(
        [("s", "p", "o", True, "qty", "17", False)], ANN
    )
    assert rows(via_reify) == rows(rdfstar_to_reified(star))


def test_reserved_annotation_predicate_refused(spark):
    bad = spark.createDataFrame(
        [("s", "p", "o", True, "rdf:subject", "x", False)], ANN
    )
    with pytest.raises(Exception, match="reserved reification predicate"):
        rdfstar_to_reified(bad).collect()
