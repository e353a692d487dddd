"""RDFa Lite source (sources/rdfa.py): context inheritance, CURIE
expansion, chaining, refusal contracts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.sources.rdfa import (
    RDF_TYPE,
    RdfaUnsupportedError,
    _RdfaWalker,
    rdfa_to_triples,
)


def _walk(html, key="http://d/1"):
    w = _RdfaWalker(key)
    w.feed(html)
    w.close()
    return w.out


def test_page_subject_and_vocab_scope():
    out = _walk(
        '<html vocab="https://s.org/"><span property="title">T</span>'
        "</html>"
    )
    assert out == [("http://d/1", "https://s.org/title", "T",
                    False, None, None)]


def test_vocab_override_in_subtree():
    out = _walk(
        '<div vocab="https://a.org/"><span property="p">1</span>'
        '<div vocab="https://b.org/"><span property="p">2</span></div>'
        '<span property="q">3</span></div>'
    )
    preds = [(p, o) for (_s, p, o, *_r) in out]
    assert ("https://a.org/p", "1") in preds
    assert ("https://b.org/p", "2") in preds
    assert ("https://a.org/q", "3") in preds  # restored after subtree


def test_curie_prefix_declaration_and_undeclared_refusal():
    out = _walk(
        '<div prefix="og: http://ogp.me/ns# tw: http://t.example/">'
        '<meta property="og:title" content="x">'
        '<meta property="tw:card" content="y"></div>'
    )
    preds = {p for (_s, p, *_r) in out}
    assert preds == {"http://ogp.me/ns#title", "http://t.example/card"}
    with pytest.raises(RdfaUnsupportedError):
        _walk('<meta property="nope:x" content="y">')
    with pytest.raises(RdfaUnsupportedError):
        _walk('<span property="bare">v</span>')  # no vocab


def test_typeof_resource_chaining_and_bnodes():
    out = _walk(
        '<div vocab="https://s.org/" typeof="A" resource="http://e/1">'
        '<div property="part" typeof="B">'
        '<span property="n">inner</span></div></div>'
    )
    bn = "_:" + hashlib.md5(b"http://d/1#rdfa0").hexdigest()[:16]
    assert ("http://e/1", RDF_TYPE, "https://s.org/A", True, None,
            None) in out
    assert (bn, RDF_TYPE, "https://s.org/B", True, None, None) in out
    assert ("http://e/1", "https://s.org/part", bn, True, None, None) in out
    assert (bn, "https://s.org/n", "inner", False, None, None) in out


def test_value_priority_content_resource_href_text():
    out = _walk(
        '<div vocab="https://s.org/" resource="http://e/1">'
        '<a property="a" content="cv" href="http://h/">t</a>'
        '<span property="b" resource="http://r/">t</span>'
        '<a property="c" href="http://h2/">t</a>'
        '<span property="d">txt</span></div>'
    )
    got = {p.rsplit("/", 1)[-1]: (o, iri) for (_s, p, o, iri, _d, _l)
           in out}
    assert got == {
        "a": ("cv", False),       # content beats href
        "b": ("http://r/", True),
        "c": ("http://h2/", True),
        "d": ("txt", False),
    }


def test_resource_sets_subject_for_subtree():
    out = _walk(
        '<div vocab="https://s.org/"><div resource="http://e/9">'
        '<span property="p">v</span></div>'
        '<span property="q">w</span></div>'
    )
    assert ("http://e/9", "https://s.org/p", "v", False, None, None) in out
    assert ("http://d/1", "https://s.org/q", "w", False, None, None) in out


def test_property_resource_rechains_subject():
    out = _walk(
        '<div vocab="https://s.org/" typeof="A" resource="http://e/1">'
        '<div property="link" resource="http://e/2">'
        '<span property="n">two</span></div></div>'
    )
    assert ("http://e/1", "https://s.org/link", "http://e/2", True,
            None, None) in out
    assert ("http://e/2", "https://s.org/n", "two", False, None,
            None) in out


def test_lang_tagging_rules():
    out = _walk(
        '<html lang="en" vocab="https://s.org/">'
        '<span property="a">en-text</span>'
        '<span property="b" lang="de">de-text</span>'
        '<meta property="c" content="meta-v">'
        '<a property="d" href="http://x/">iri</a></html>'
    )
    langs = {o: l for (_s, _p, o, _i, _d, l) in out}
    assert langs == {"en-text": "en", "de-text": "de", "meta-v": "en",
                     "http://x/": None}


def test_full_rdfa_attributes_refused():
    for attr in ("about='http://x/'", "rel='next'", "rev='prev'",
                 "datatype='xsd:int'", "inlist=''"):
        with pytest.raises(RdfaUnsupportedError):
            _walk(f'<div vocab="https://s.org/" {attr}>'
                  '<span property="p">v</span></div>')


def test_malformed_prefix_refused():
    with pytest.raises(RdfaUnsupportedError):
        _walk('<div prefix="og http://ogp.me/ns#"></div>')
    with pytest.raises(RdfaUnsupportedError):
        _walk('<div prefix="og: http://ogp.me/ns# dangling:"></div>')


def test_multi_property_and_multi_typeof():
    out = _walk(
        '<div vocab="https://s.org/" typeof="A B" resource="http://e/1">'
        '<span property="p q">v</span></div>'
    )
    assert {o for (_s, p, o, *_r) in out if p == RDF_TYPE} == {
        "https://s.org/A", "https://s.org/B"
    }
    assert {p for (_s, p, o, *_r) in out if o == "v"} == {
        "https://s.org/p", "https://s.org/q"
    }


def test_permissive_quarantine(spark):
    pages = spark.createDataFrame(
        [("u1", '<div about="http://x/"></div>'),
         ("u2", '<div vocab="https://s.org/">'
                '<span property="x">ok</span></div>')],
        ["url", "html"],
    )
    with pytest.raises(Exception):
        rdfa_to_triples(pages).collect()
    got = rdfa_to_triples(pages, mode="PERMISSIVE")
    assert got.where(F.col("_corrupt_doc").isNotNull())\
              .select("doc_key").first()[0] == "u1"
    assert got.where(F.col("obj") == "ok").count() == 1


def test_plan_is_narrow(spark):
    pages = spark.createDataFrame([("u", "<p></p>")], ["url", "html"])
    plan = (rdfa_to_triples(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_default_prefixes_opt_in():
    from i2o_transform_spark.sources.rdfa import DEFAULT_PREFIXES

    html = '<meta property="og:title" content="T">'
    with pytest.raises(RdfaUnsupportedError):
        _walk(html)  # strict profile: og: is undeclared
    w = _RdfaWalker("http://d/1", DEFAULT_PREFIXES)
    w.feed(html)
    w.close()
    assert w.out == [("http://d/1", "http://ogp.me/ns#title", "T",
                      False, None, None)]
    # a local prefix attr overrides the initial context
    w2 = _RdfaWalker("http://d/1", DEFAULT_PREFIXES)
    w2.feed('<div prefix="og: http://other/ns#">'
            '<meta property="og:x" content="y"></div>')
    w2.close()
    assert w2.out[0][1] == "http://other/ns#x"
