"""JSON-LD source (sources/jsonld): schema.org-profile flattening,
deterministic blank nodes, quarantine contract, HTML script extraction,
and composition with the tagged-store SPARQL engine."""

from __future__ import annotations

import hashlib
import json

import pytest

from i2o_transform_spark.sources.jsonld import (
    RDF_TYPE,
    extract_jsonld_scripts,
    jsonld_to_triples,
)

SCHEMA_IN = "doc_key string, jsonld string"


def rows(df):
    return {tuple(r) for r in df.collect()}


def docs_df(spark, *docs):
    return spark.createDataFrame(
        [(f"d{i}", json.dumps(d) if not isinstance(d, str) else d)
         for i, d in enumerate(docs)],
        SCHEMA_IN,
    )


def test_basic_flatten(spark):
    doc = {
        "@context": {"ex": "http://ex/", "@vocab": "http://schema.org/"},
        "@id": "ex:P1",
        "@type": "Person",
        "name": "Alice",
        "age": 30,
        "verified": True,
        "knows": {"@id": "ex:P2"},
        "nick": ["Al", "Ali", None],
    }
    got = rows(jsonld_to_triples(docs_df(spark, doc)))
    S = "http://schema.org/"
    X = "http://www.w3.org/2001/XMLSchema#"
    assert got == {
        ("d0", "http://ex/P1", RDF_TYPE, S + "Person", True, None, None),
        ("d0", "http://ex/P1", S + "name", "Alice", False, None, None),
        ("d0", "http://ex/P1", S + "age", "30", False, X + "integer", None),
        ("d0", "http://ex/P1", S + "verified", "true", False,
         X + "boolean", None),
        ("d0", "http://ex/P1", S + "knows", "http://ex/P2", True,
         None, None),
        ("d0", "http://ex/P1", S + "nick", "Al", False, None, None),
        ("d0", "http://ex/P1", S + "nick", "Ali", False, None, None),
    }


def test_bnode_deterministic(spark):
    doc = {"@context": "https://schema.org",
           "name": "anon", "child": {"name": "kid"}}
    got = rows(jsonld_to_triples(docs_df(spark, doc)))
    root = "_:" + hashlib.md5(b"d0").hexdigest()[:16]
    kid = "_:" + hashlib.md5(b"d0/child/0").hexdigest()[:16]
    S = "https://schema.org/"
    assert got == {
        ("d0", root, S + "name", "anon", False, None, None),
        ("d0", root, S + "child", kid, True, None, None),
        ("d0", kid, S + "name", "kid", False, None, None),
    }


def test_value_objects_language_and_type(spark):
    doc = {
        "@context": {"@vocab": "http://s/", "x": "http://x/"},
        "@id": "http://e/1",
        "label": {"@value": "chat", "@language": "fr"},
        "born": {"@value": "1990-01-02", "@type": "x:date"},
    }
    got = rows(jsonld_to_triples(docs_df(spark, doc)))
    assert ("d0", "http://e/1", "http://s/label", "chat", False,
            None, "fr") in got
    assert ("d0", "http://e/1", "http://s/born", "1990-01-02", False,
            "http://x/date", None) in got


def test_graph_roots_and_toplevel_array(spark):
    g = {"@context": {"@vocab": "http://s/"},
         "@graph": [{"@id": "http://a", "p": 1},
                    {"@id": "http://b", "p": 2}]}
    arr = [{"@id": "http://c", "name": "x"}]
    got = rows(jsonld_to_triples(docs_df(spark, g, arr)))
    assert ("d0", "http://a", "http://s/p", "1", False,
            "http://www.w3.org/2001/XMLSchema#integer", None) in got
    assert ("d0", "http://b", "http://s/p", "2", False,
            "http://www.w3.org/2001/XMLSchema#integer", None) in got
    assert ("d1", "http://c", "name", "x", False, None, None) in got


def test_set_unwrap(spark):
    doc = {"@context": {"@vocab": "http://s/"}, "@id": "http://e",
           "tag": {"@set": ["a", "b"]}}
    got = rows(jsonld_to_triples(docs_df(spark, doc)))
    assert ("d0", "http://e", "http://s/tag", "a", False, None, None) in got
    assert ("d0", "http://e", "http://s/tag", "b", False, None, None) in got


@pytest.mark.parametrize("doc,msg", [
    ({"@id": "http://e", "p": {"@list": [1]}}, "@list"),
    ({"@id": "http://e", "@reverse": {"p": "x"}}, "keyword @reverse"),
    ({"@id": "http://e", "p": {"@context": {}, "q": 1}}, "nested @context"),
    ({"@context": {"t": {"@id": "http://x"}}, "p": 1}, "term definition"),
    ({"p": {"@value": "x", "@language": "en", "@type": "http://t"}},
     "both @language and @type"),
    ({"@graph": [{"p": 1}], "q": 2}, "sibling properties"),
])
def test_failfast_refusals(spark, doc, msg):
    with pytest.raises(Exception, match=msg):
        jsonld_to_triples(docs_df(spark, doc)).collect()


def test_max_depth_loud(spark):
    doc: dict = {"@id": "http://e"}
    cur = doc
    for _ in range(10):
        cur["c"] = {}
        cur = cur["c"]
    with pytest.raises(Exception, match="max_depth"):
        jsonld_to_triples(docs_df(spark, doc), max_depth=5).collect()


def test_permissive_quarantine(spark):
    good = {"@context": "http://s", "@id": "http://e", "name": "ok"}
    df = docs_df(spark, good, "{not json", {"p": {"@list": []}})
    out = jsonld_to_triples(df, mode="PERMISSIVE")
    assert out.columns[-1] == "_corrupt_doc"
    bad = out.where("_corrupt_doc IS NOT NULL")
    assert {r.doc_key for r in bad.collect()} == {"d1", "d2"}
    ok = rows(out.where("_corrupt_doc IS NULL").drop("_corrupt_doc"))
    assert ("d0", "http://e", "http://s/name", "ok", False, None,
            None) in ok


def test_extract_scripts_from_html(spark):
    html = (
        '<html><head>'
        '<script type="application/ld+json">{"a": 1}</script>'
        "<script src='x.js'></script>"
        "<SCRIPT TYPE='application/ld+json'>\n{\"b\": 2}\n</SCRIPT>"
        "</head></html>"
    )
    df = spark.createDataFrame([("http://u", html)], "url string, html string")
    got = rows(extract_jsonld_scripts(df))
    assert got == {("http://u#0", 0, '{"a": 1}'),
                   ("http://u#1", 1, '{"b": 2}')}


def test_composes_with_tagged_sparql(spark):
    """Extracted @language literals answer SPARQL LANG() queries — the
    tagged-triples schema is shared with sources/ntriples keep_tags."""
    from i2o_transform_spark.operators.sparql import sparql

    doc = {"@context": {"@vocab": "http://s/"}, "@id": "http://e",
           "label": [{"@value": "chat", "@language": "fr"},
                     {"@value": "cat", "@language": "en"}]}
    triples = jsonld_to_triples(docs_df(spark, doc)).drop(
        "doc_key", "obj_is_iri", "obj_datatype")
    out = sparql(triples, """
        SELECT ?l WHERE {
          <http://e> <http://s/label> ?l .
          FILTER (LANGMATCHES(LANG(?l), "fr"))
        }""")
    assert rows(out) == {("chat", "fr")}
