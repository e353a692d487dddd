"""SPARQL SERVICE federation (operators/sparql stores registry):
join semantics, SILENT, service-only groups, refusals."""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.sparql import SparqlSyntaxError, sparql

T = "subj string, pred string, obj string"


def rows(df):
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


@pytest.fixture(scope="module")
def main(spark):
    return spark.createDataFrame(
        [("c1", "inNation", "n1"), ("c2", "inNation", "n2"),
         ("c3", "inNation", "n3")], T,
    ).cache()


@pytest.fixture(scope="module")
def geo(spark):
    return spark.createDataFrame(
        [("n1", "name", "FRANCE"), ("n2", "name", "KENYA"),
         ("n1", "partOf", "r1"), ("n2", "partOf", "r2")], T,
    ).cache()


def test_service_joins_on_shared_var(main, geo):
    out = sparql(
        main,
        'SELECT ?c ?nm WHERE { ?c inNation ?n . '
        'SERVICE <http://geo> { ?n name ?nm } }',
        stores={"http://geo": geo},
    )
    assert rows(out) == {("c1", "FRANCE"), ("c2", "KENYA")}


def test_service_block_internal_join(main, geo):
    out = sparql(
        main,
        'SELECT ?c WHERE { ?c inNation ?n . '
        'SERVICE <http://geo> { ?n name ?nm . ?n partOf "r2" } }',
        stores={"http://geo": geo},
    )
    assert rows(out) == {("c2",)}


def test_service_only_group(main, geo):
    out = sparql(
        main,
        'SELECT ?n ?nm WHERE { SERVICE <http://geo> { ?n name ?nm } }',
        stores={"http://geo": geo},
    )
    assert rows(out) == {("n1", "FRANCE"), ("n2", "KENYA")}


def test_missing_endpoint_raises_listing_known(main, geo):
    with pytest.raises(ValueError, match="http://geo"):
        sparql(
            main,
            'SELECT ?c WHERE { ?c inNation ?n . '
            'SERVICE <http://nowhere> { ?n name ?nm } }',
            stores={"http://geo": geo},
        ).collect()


def test_silent_missing_endpoint_is_neutral(main, geo):
    out = sparql(
        main,
        'SELECT ?c ?n WHERE { ?c inNation ?n . '
        'SERVICE SILENT <http://nowhere> { ?n name ?nm } }',
        stores={"http://geo": geo},
    )
    # the failed SILENT group contributes no constraint
    assert rows(out) == {("c1", "n1"), ("c2", "n2"), ("c3", "n3")}


def test_silent_present_endpoint_still_joins(main, geo):
    out = sparql(
        main,
        'SELECT ?c WHERE { ?c inNation ?n . '
        'SERVICE SILENT <http://geo> { ?n name ?nm } }',
        stores={"http://geo": geo},
    )
    assert rows(out) == {("c1",), ("c2",)}


def test_variable_endpoint_refused(main):
    with pytest.raises(SparqlSyntaxError, match="constant IRI"):
        sparql(
            main,
            'SELECT ?c WHERE { SERVICE ?ep { ?c inNation ?n } }',
            stores={},
        )


def test_no_registry_raises(main):
    with pytest.raises(ValueError, match="store registry"):
        sparql(
            main,
            'SELECT ?c WHERE { ?c inNation ?n . '
            'SERVICE <http://geo> { ?n name ?nm } }',
        ).collect()
