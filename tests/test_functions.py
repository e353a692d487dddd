"""Unit vectors from FIXTURES.md §B6 — scalar function semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from i2o_transform_spark.functions.text import (
    codelist_explode,
    path_segment,
    prefix_strip,
    truncate_source_value,
)
from i2o_transform_spark.functions.textstats import (
    doc_fingerprint,
    predicted_lang,
    token_count,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_path_segment(spark):
    # stringpart('\A\B\C\','\',2)='B' (MSSQL/OMOPLoader.sql:259-282)
    df = spark.createDataFrame([("\\A\\B\\C\\",)], ["p"])
    row = df.select(
        path_segment("p", 1).alias("s1"),
        path_segment("p", 2).alias("s2"),
        path_segment("p", 3).alias("s3"),
    ).collect()[0]
    assert (row.s1, row.s2, row.s3) == ("A", "B", "C")


def test_prefix_strip(spark):
    # 'ICD9:250.00' -> '250.00'; no-colon passthrough; only FIRST colon
    df = spark.createDataFrame(
        [("ICD9:250.00",), ("nocolon",), ("a:b:c",)], ["c"]
    )
    got = [r.v for r in df.select(prefix_strip("c").alias("v")).collect()]
    assert got == ["250.00", "nocolon", "b:c"]


def test_codelist_explode(spark):
    df = spark.createDataFrame(
        [("'01','02'",), ("",), (None,), ("'x'",)], ["cl"]
    )
    got = df.select(codelist_explode("cl").alias("v")).collect()
    assert [r.v for r in got] == [["01", "02"], [], [], ["x"]]


def test_truncate50(spark):
    df = spark.createDataFrame([("x" * 80,)], ["t"])
    assert len(df.select(truncate_source_value("t").alias("v")).collect()[0].v) == 50


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("  ",), ("one",)], ["t"])
    got = [r.v for r in df.select(token_count("t").alias("v")).collect()]
    assert got == [3, 0, 1]


def test_predicted_lang(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog",),       # en
            ("el perro y la casa que",),    # es
            ("der hund und die katze",),    # de
            ("xyzzy plugh",),               # no evidence -> default en
        ],
        ["t"],
    )
    got = [r.v for r in df.select(predicted_lang("t").alias("v")).collect()]
    assert got == ["en", "es", "de", "en"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("  hello world ",)], ["t"]
    )
    a, b = [r.v for r in df.select(doc_fingerprint("t").alias("v")).collect()]
    assert a == b  # whitespace + case normalized before hashing
