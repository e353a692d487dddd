"""Microdata source (sources/microdata.py): walker semantics, language
scoping, datatype sniffing, bnode determinism, refusal contracts."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.sources.microdata import (
    RDF_TYPE,
    MicrodataUnsupportedError,
    _Walker,
    microdata_to_triples,
)

XSD = "http://www.w3.org/2001/XMLSchema#"


def _walk(html, key="http://d/1", max_depth=32):
    w = _Walker(key, max_depth)
    w.feed(html)
    w.close()
    return w.out


def test_value_table_per_tag():
    out = _walk(
        '<div itemscope itemtype="https://s.org/T">'
        '<meta itemprop="m" content="mv">'
        '<a itemprop="l" href="http://x/">t</a>'
        '<img itemprop="i" src="http://img/">'
        '<link itemprop="k" href="http://k/">'
        '<data itemprop="d" value="42">forty-two</data>'
        '<span itemprop="s">text <em>nested</em> tail</span>'
        "</div>"
    )
    by_pred = {p.rsplit("/", 1)[-1]: (o, iri) for (_s, p, o, iri, _d, _l)
               in out if p != RDF_TYPE}
    assert by_pred == {
        "m": ("mv", False),
        "l": ("http://x/", True),
        "i": ("http://img/", True),
        "k": ("http://k/", True),
        "d": ("42", False),
        "s": ("text nested tail", False),
    }


def test_vocab_expansion_and_absolute_names():
    out = _walk(
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name http://other.org/prop#x">v</span></div>'
    )
    preds = {p for (_s, p, *_rest) in out if p != RDF_TYPE}
    assert preds == {"https://schema.org/name", "http://other.org/prop#x"}
    # hash-vocabulary type
    out2 = _walk(
        '<div itemscope itemtype="http://v.org/ns#T">'
        '<span itemprop="q">v</span></div>'
    )
    assert any(p == "http://v.org/ns#q" for (_s, p, *_r) in out2)


def test_untyped_item_inherits_ancestor_vocab():
    out = _walk(
        '<div itemscope itemtype="https://schema.org/Person">'
        '<div itemprop="knows" itemscope>'
        '<span itemprop="name">inner</span></div></div>'
    )
    inner = [t for t in out if t[2] == "inner"]
    assert inner and inner[0][1] == "https://schema.org/name"


def test_bnode_determinism_and_ordinals():
    html = (
        '<div itemscope itemtype="https://s.org/A"></div>'
        '<div itemscope itemtype="https://s.org/B"></div>'
    )
    out1, out2 = _walk(html), _walk(html)
    assert out1 == out2
    sids = [t[0] for t in out1]
    exp = ["_:" + hashlib.md5(f"http://d/1#item{i}".encode())
           .hexdigest()[:16] for i in (0, 1)]
    assert sids == exp


def test_itemid_skips_bnode_but_consumes_ordinal():
    out = _walk(
        '<div itemscope itemid="http://e/1" itemtype="https://s.org/A">'
        '<span itemprop="x" itemscope itemtype="https://s.org/B"></span>'
        "</div>"
    )
    child = [t[2] for t in out if t[1].endswith("/x")][0]
    assert child == "_:" + hashlib.md5(b"http://d/1#item1").hexdigest()[:16]


def test_lang_inheritance_override_and_suppression():
    out = _walk(
        '<html lang="en"><body itemscope itemtype="https://s.org/T">'
        '<span itemprop="a">plain-en</span>'
        '<span itemprop="b" lang="fr">fr-here</span>'
        '<time itemprop="c" datetime="2020-01-01">dt</time>'
        '<a itemprop="d" href="http://x/">iri</a>'
        "</body></html>"
    )
    langs = {o: l for (_s, _p, o, _i, _d, l) in out}
    assert langs["plain-en"] == "en"
    assert langs["fr-here"] == "fr"
    assert langs["2020-01-01"] is None  # datatyped: no tag
    assert langs["http://x/"] is None   # IRI: no tag


def test_time_sniffing_matrix():
    cases = {
        "2020-01-02": XSD + "date",
        "2020-01-02T10:00:00Z": XSD + "dateTime",
        "10:30:05": XSD + "time",
        "1999": XSD + "gYear",
        "last tuesday": None,
    }
    for lex, want in cases.items():
        out = _walk(
            f'<div itemscope itemtype="https://s.org/T">'
            f'<time itemprop="t" datetime="{lex}">x</time></div>'
        )
        got = [d for (_s, p, o, _i, d, _l) in out if o == lex]
        assert got == [want], lex


def test_top_level_item_without_itemprop_nested_in_markup():
    out = _walk(
        '<div itemscope itemtype="https://s.org/A"><div>'
        '<div itemscope itemtype="https://s.org/B">'
        '<span itemprop="n">b-name</span></div></div></div>'
    )
    # B is NOT linked from A (no itemprop on its element)
    assert not any(o.startswith("_:") and p.endswith("/n") is False
                   and p != RDF_TYPE for (_s, p, o, _i, _d, _l) in out
                   if _s != o and p not in (RDF_TYPE,))
    b_sid = [s for (s, p, o, *_r) in out if o == "https://s.org/B"][0]
    assert (b_sid, "https://s.org/n", "b-name", False, None, None) in out


def test_multi_type_emits_all_types_vocab_from_first():
    out = _walk(
        '<div itemscope itemtype="https://a.org/T http://b.org/U">'
        '<span itemprop="p">v</span></div>'
    )
    types = {o for (_s, p, o, *_r) in out if p == RDF_TYPE}
    assert types == {"https://a.org/T", "http://b.org/U"}
    assert any(p == "https://a.org/p" for (_s, p, *_r) in out)


def test_refusals_and_permissive_quarantine(spark):
    bad = [
        "<div itemscope itemref='x'></div>",
        "<div itemscope><span itemprop='bare'>v</span></div>",
        "<span itemprop='orphan'>v</span>",
    ]
    for html in bad:
        with pytest.raises(MicrodataUnsupportedError):
            _walk(html)
    pages = spark.createDataFrame(
        [("u1", bad[0]),
         ("u2", '<p itemscope itemtype="https://s.org/T">'
                '<span itemprop="x">ok</span></p>')],
        ["url", "html"],
    )
    with pytest.raises(Exception):
        microdata_to_triples(pages).collect()
    got = microdata_to_triples(pages, mode="PERMISSIVE")
    corrupt = got.where(F.col("_corrupt_doc").isNotNull())
    assert corrupt.select("doc_key").first()[0] == "u1"
    assert got.where(F.col("obj") == "ok").count() == 1


def test_max_depth_bound():
    html = ('<div itemscope itemtype="https://s.org/T">'
            '<div itemprop="c" itemscope>' * 5) + "</div>" * 6
    with pytest.raises(MicrodataUnsupportedError):
        _walk(html, max_depth=3)
    assert _walk(html, max_depth=10)


def test_tag_soup_tolerance_and_entities():
    out = _walk(
        '<div itemscope itemtype="https://s.org/T">'
        "<p itemprop='a'>x &amp; y</p itemprop='zzz'>"
        "</span>"  # unmatched close: ignored
        "<span itemprop='b'>w</div>"  # unclosed span: closed by div
    )
    vals = {o for (_s, p, o, *_r) in out if p != RDF_TYPE}
    assert "x & y" in vals and "w" in vals


def test_plan_is_narrow(spark):
    pages = spark.createDataFrame([("u", "<p></p>")], ["url", "html"])
    plan = (microdata_to_triples(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
