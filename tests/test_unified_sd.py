"""Fused structured-data extraction (sources/unified.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.sources.jsonld import (
    extract_jsonld_scripts,
    jsonld_to_triples,
)
from i2o_transform_spark.sources.microdata import microdata_to_triples
from i2o_transform_spark.sources.rdfa import rdfa_to_triples
from i2o_transform_spark.sources.unified import structured_data_to_triples

PAGE = (
    '<html><head><script type="application/ld+json">'
    '{"@context": "https://schema.org", "@id": "http://e/1",'
    ' "@type": "Person", "name": "A"}</script>'
    '<script type="application/ld+json">'
    '{"@context": "https://schema.org", "@id": "http://e/2",'
    ' "award": {"@value": "x", "@language": "en"}}</script>'
    '</head><body lang="en" vocab="https://schema.org/">'
    '<span property="name">Page</span>'
    '<div itemscope itemtype="https://schema.org/Person" '
    'itemid="http://e/1"><meta itemprop="identifier" content="C1">'
    "</div></body></html>"
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, ["url", "html"])


def test_fused_equals_three_pass_union(spark):
    pages = _pages(spark, [("u1", PAGE), ("u2", "<p>nothing here</p>")])
    cols = ["doc_key", "subj", "pred", "obj", "obj_is_iri",
            "obj_datatype", "obj_lang"]
    jl = jsonld_to_triples(extract_jsonld_scripts(pages)).select(
        F.lit("jsonld").alias("syntax"), *cols)
    md = microdata_to_triples(pages).select(
        F.lit("microdata").alias("syntax"), *cols)
    rd = rdfa_to_triples(pages).select(
        F.lit("rdfa").alias("syntax"), *cols)
    three = sorted(map(tuple, jl.unionByName(md).unionByName(rd).collect()))
    fused = sorted(map(tuple,
                       structured_data_to_triples(pages).collect()))
    # jsonld: doc0 type+name, doc1 tagged award; microdata: type +
    # identifier; rdfa: page-level name -> 6 rows total
    assert fused == three and len(fused) == 6


def test_syntax_subset_selection(spark):
    pages = _pages(spark, [("u1", PAGE)])
    only_md = structured_data_to_triples(pages, syntaxes=("microdata",))
    assert only_md.select("syntax").distinct().collect()[0][0] == "microdata"
    with pytest.raises(ValueError):
        structured_data_to_triples(pages, syntaxes=("microdata", "turtle"))


def test_permissive_quarantine_is_per_syntax(spark):
    # microdata is broken (itemref) but jsonld + rdfa on the SAME page
    # must still yield their triples
    html = (
        '<html vocab="https://schema.org/">'
        '<script type="application/ld+json">'
        '{"@context": "https://schema.org", "@id": "http://e/1",'
        ' "name": "ok"}</script>'
        '<div itemscope itemref="x"></div>'
        '<span property="name">ok2</span></html>'
    )
    pages = _pages(spark, [("u", html)])
    with pytest.raises(Exception):
        structured_data_to_triples(pages).collect()
    got = structured_data_to_triples(pages, mode="PERMISSIVE")
    corrupt = got.where(F.col("_corrupt_doc").isNotNull()).collect()
    assert len(corrupt) == 1 and corrupt[0]["syntax"] == "microdata"
    assert got.where(F.col("obj") == "ok").count() == 1
    assert got.where(F.col("obj") == "ok2").count() == 1


def test_single_python_stage_no_exchange(spark):
    pages = _pages(spark, [("u", PAGE)])
    plan = (structured_data_to_triples(pages)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert plan.count("MapInPandas") == 1
