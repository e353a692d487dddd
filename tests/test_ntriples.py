"""N-Triples sink/source (sources/ntriples.py): adversarial escape
roundtrip, real-file write/read, spec-grammar acceptance, malformed-line
and bad-IRI raise contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from i2o_transform_spark.sources.ntriples import (
    parse_ntriples_lines,
    read_ntriples,
    to_ntriples_lines,
    write_ntriples,
)

NASTY = [
    'plain',
    'tab\there',
    'quote " backslash \\ mix',
    '\\n is two chars; \n is one',
    'ends with backslash \\',
    '\\\\ doubled \\\\\\ tripled',
    'cr\rlf\n tab\t bell\b feed\f',
    '',
    '\\t',  # literal backslash-t, must NOT round-trip to a tab
]


def _df(spark, objs, iri=False):
    rows = [
        Row(subj=f"http://ex/s{i}", pred="http://ex/p", obj=o,
            obj_is_iri=iri)
        for i, o in enumerate(objs)
    ]
    return spark.createDataFrame(rows)


def test_escape_roundtrip_adversarial(spark):
    df = _df(spark, NASTY)
    lines = to_ntriples_lines(df, obj_is_iri="obj_is_iri")
    back = parse_ntriples_lines(lines)
    got = {r.subj: r.obj for r in back.collect()}
    assert got == {f"http://ex/s{i}": o for i, o in enumerate(NASTY)}
    assert all(not r.obj_is_iri for r in back.collect())
    # wire bytes are single-line per triple (the format's split guarantee)
    for r in lines.collect():
        assert "\n" not in r.line and "\r" not in r.line
        assert r.line.endswith(" .")


def test_file_roundtrip_and_comment_skip(spark, tmp_path):
    df = _df(spark, ["a", 'b "q" \\', "c\nd"]).unionByName(
        _df(spark, ["http://ex/o"], iri=True)
    )
    path = str(tmp_path / "kg.nt")
    write_ntriples(df, path, obj_is_iri="obj_is_iri")
    back = read_ntriples(spark, path)
    orig = {(r.subj, r.obj, r.obj_is_iri) for r in df.collect()}
    assert {(r.subj, r.obj, r.obj_is_iri) for r in back.collect()} == orig


def test_foreign_lines_accepted(spark):
    """Lines this writer never produced: comments, blanks, datatype
    suffixes, IRI objects — must parse per spec."""
    lines = spark.createDataFrame(
        [
            Row(line="# a comment"),
            Row(line="   "),
            Row(line='<http://a> <http://p> "42"^^<http://int> .'),
            Row(line="<http://a> <http://p> <http://b> ."),
            Row(line='<http://a> <http://p> "esc\\" \\\\ \\n" . '),
        ]
    )
    out = {(r.obj, r.obj_is_iri) for r in parse_ntriples_lines(lines).collect()}
    assert out == {("42", False), ("http://b", True),
                   ('esc" \\ \n', False)}


def test_malformed_line_raises(spark):
    bad = spark.createDataFrame([Row(line="<http://a> nope .")])
    with pytest.raises(Exception, match="malformed N-Triples"):
        parse_ntriples_lines(bad).collect()


def test_bad_iri_raises(spark):
    df = spark.createDataFrame(
        [Row(subj="http://ex/has space", pred="http://ex/p", obj="x",
             obj_is_iri=False)]
    )
    with pytest.raises(Exception, match="invalid IRI"):
        to_ntriples_lines(df, obj_is_iri="obj_is_iri").collect()


def test_serialization_is_jvm_only(spark):
    """No Python in the row path: the serialized plan contains no
    BatchEvalPython / ArrowEvalPython / mapInPandas nodes."""
    df = _df(spark, NASTY)
    plan = (
        to_ntriples_lines(df, obj_is_iri="obj_is_iri")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "InPandas" not in plan


def test_permissive_mode_quarantines_and_failfast_raises(spark):
    import pytest

    from i2o_transform_spark.sources.ntriples import parse_ntriples_lines

    lines = spark.createDataFrame(
        [
            ("<http://a> <http://p> <http://b> .",),
            ("<http://a> <http://p> \"lit\\tx\" .",),
            ("garbage line",),
            ("# comment survives as a drop, not a corrupt row",),
        ],
        "line string",
    )
    out = parse_ntriples_lines(lines, mode="PERMISSIVE").collect()
    good = [r for r in out if r._corrupt_line is None]
    bad = [r for r in out if r._corrupt_line is not None]
    assert {(r.subj, r.obj, r.obj_is_iri) for r in good} == {
        ("http://a", "http://b", True),
        ("http://a", "lit\tx", False),
    }
    assert [r._corrupt_line for r in bad] == ["garbage line"]
    assert bad[0].subj is None and bad[0].obj_is_iri is None
    with pytest.raises(Exception, match="malformed N-Triples"):
        parse_ntriples_lines(lines, mode="FAILFAST").collect()
    with pytest.raises(ValueError, match="mode"):
        parse_ntriples_lines(lines, mode="DROPMALFORMED")


def test_uchar_escapes_decode(spark):
    """Externally-produced spec-valid UCHAR escapes (\\uXXXX / \\UXXXXXXXX,
    which this writer never emits) must decode to their code points —
    including supplementary-plane codepoints via surrogate-pair arithmetic
    — while an ESCAPED backslash followed by 'u'/'U' stays literal
    (ADVICE r03: these previously passed the grammar but kept the raw
    backslash sequence)."""
    lines = spark.createDataFrame(
        [
            Row(line='<http://a> <http://p> "A=\\u0041" .'),
            Row(line='<http://a> <http://p> "\\u00e9t\\u00e9" .'),
            Row(line='<http://a> <http://p> "grin:\\U0001F600!" .'),
            Row(line='<http://a> <http://p> "raw\\\\u0041" .'),
            Row(line='<http://a> <http://p> "mix\\n\\u0042\\\\U0" .'),
        ]
    )
    out = {r.obj for r in parse_ntriples_lines(lines).collect()}
    assert out == {
        "A=A",
        "été",
        "grin:\U0001F600!",
        "raw\\u0041",
        "mix\nB\\U0",
    }


def test_lang_tags_accepted_and_dropped_by_default(spark):
    lines = spark.createDataFrame(
        [Row(line='<http://a> <http://p> "hallo"@de .'),
         Row(line='<http://a> <http://p> "hi"@en-US-x-2 .')]
    )
    out = {(r.obj, r.obj_is_iri)
           for r in parse_ntriples_lines(lines).collect()}
    assert out == {("hallo", False), ("hi", False)}


def test_keep_tags_preserves_datatype_and_lang(spark):
    lines = spark.createDataFrame(
        [Row(line='<http://a> <http://p> "42"^^<http://int> .'),
         Row(line='<http://a> <http://p> "hallo"@de .'),
         Row(line='<http://a> <http://p> "plain" .'),
         Row(line="<http://a> <http://p> <http://b> .")]
    )
    out = {(r.obj, r.obj_is_iri, r.obj_datatype, r.obj_lang)
           for r in parse_ntriples_lines(lines, keep_tags=True).collect()}
    assert out == {
        ("42", False, "http://int", None),
        ("hallo", False, None, "de"),
        ("plain", False, None, None),
        ("http://b", True, None, None),
    }


def test_tagged_serialize_roundtrip(spark):
    rows = [
        Row(subj="http://ex/s1", pred="http://ex/p", obj="42",
            obj_is_iri=False, dt="http://www.w3.org/2001/XMLSchema#integer",
            lang=None),
        Row(subj="http://ex/s2", pred="http://ex/p", obj='q" \\ uote',
            obj_is_iri=False, dt=None, lang="en-US"),
        Row(subj="http://ex/s3", pred="http://ex/p", obj="plain",
            obj_is_iri=False, dt=None, lang=None),
        Row(subj="http://ex/s4", pred="http://ex/p", obj="http://ex/o",
            obj_is_iri=True, dt=None, lang=None),
    ]
    df = spark.createDataFrame(rows)
    lines = to_ntriples_lines(
        df, obj_is_iri="obj_is_iri", obj_datatype="dt", obj_lang="lang"
    )
    texts = {r.line for r in lines.collect()}
    assert ('<http://ex/s1> <http://ex/p> '
            '"42"^^<http://www.w3.org/2001/XMLSchema#integer> .') in texts
    assert any('"@en-US .' in t for t in texts)
    back = parse_ntriples_lines(lines, keep_tags=True)
    got = {(r.subj, r.obj, r.obj_is_iri, r.obj_datatype, r.obj_lang)
           for r in back.collect()}
    want = {(r.subj, r.obj, r.obj_is_iri, r.dt, r.lang) for r in rows}
    assert got == want


@pytest.mark.parametrize("dt, lang, iri, msg", [
    ("http://int", "en", False, "BOTH datatype and lang"),
    (None, "not a tag!", False, "invalid LANGTAG"),
    ("http://int", None, True, "cannot carry a literal tag"),
])
def test_tagged_serialize_violations_raise(spark, dt, lang, iri, msg):
    df = spark.createDataFrame(
        [("http://ex/s", "http://ex/p", "v", iri, dt, lang)],
        "subj string, pred string, obj string, obj_is_iri boolean, "
        "dt string, lang string",
    )
    lines = to_ntriples_lines(
        df, obj_is_iri="obj_is_iri", obj_datatype="dt", obj_lang="lang"
    )
    with pytest.raises(Exception, match=msg):
        lines.collect()


def test_permissive_keep_tags_quarantine(spark):
    lines = spark.createDataFrame(
        [Row(line='<http://a> <http://p> "x"@en .'),
         Row(line='garbage line')]
    )
    out = parse_ntriples_lines(lines, mode="PERMISSIVE", keep_tags=True)
    rows = {(r.obj, r.obj_lang, r._corrupt_line) for r in out.collect()}
    assert rows == {("x", "en", None), (None, None, "garbage line")}


def test_nquads_mixed_roundtrip_and_grammar(spark):
    from i2o_transform_spark.sources.ntriples import (
        parse_ntriples_lines,
        to_ntriples_lines,
    )

    rows = [
        ("http://s/1", "http://p", "http://o/1", True, "http://g/a"),
        ("http://s/2", "http://p", 'lit "q" \n', False, None),  # default g
        ("http://s/3", "http://p", "http://o/3", True, None),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean,"
              " g string"
    )
    lines = to_ntriples_lines(df, obj_is_iri="obj_is_iri", graph="g")
    txt = {r["line"] for r in lines.collect()}
    assert "<http://s/1> <http://p> <http://o/1> <http://g/a> ." in txt
    assert "<http://s/3> <http://p> <http://o/3> ." in txt  # no 4th term
    back = parse_ntriples_lines(lines, quads=True)
    got = sorted(map(tuple, back.select(
        "subj", "pred", "obj", "obj_is_iri", "graph").collect()))
    assert got == sorted(rows)
    # triple-mode parser must REJECT a quad line (FAILFAST)
    import pytest as _pytest
    with _pytest.raises(Exception):
        parse_ntriples_lines(lines).collect()
    # permissive quad parse quarantines junk, keeps graph column
    junk = lines.unionByName(
        spark.createDataFrame([("<bad quad",)], "line string")
    )
    soft = parse_ntriples_lines(junk, quads=True, mode="PERMISSIVE")
    assert soft.where("_corrupt_line IS NOT NULL").count() == 1
    assert soft.where("graph = 'http://g/a'").count() == 1
    # an invalid graph IRI raises inside the serializer expression
    bad = spark.createDataFrame(
        [("http://s", "http://p", "x", False, "has space")],
        "subj string, pred string, obj string, obj_is_iri boolean, g string",
    )
    with _pytest.raises(Exception):
        to_ntriples_lines(bad, obj_is_iri="obj_is_iri", graph="g").collect()
