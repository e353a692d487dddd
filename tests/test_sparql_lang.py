"""Language-tagged literals (RDF 1.1) through the SPARQL front-end and
the BGP algebra: tagged stores carry an ``obj_lang`` column
(sources/ntriples keep_tags=True); variables bound from tagged object
positions carry a ``__lang`` companion so RDF TERM equality — not lexical
equality — drives joins, DISTINCT, GROUP BY, MINUS and OPTIONAL.

Reference semantics: SPARQL 1.1 §17.4.1 (LANG / LANGMATCHES, RFC 4647
basic filtering) and RDF 1.1 Concepts §3.3 (tags compare lowercased).
"""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.bgp import bgp_match, update_where
from i2o_transform_spark.operators.sparql import (
    SparqlSyntaxError,
    sparql,
)

TAGGED = "subj string, pred string, obj string, obj_lang string"


@pytest.fixture(scope="module")
def tg(spark):
    # 'chat' is deliberately both @en, @fr and plain — the conflation trap
    return spark.createDataFrame(
        [("d1", "label", "chat", "en"),
         ("d1", "label", "chat", "fr"),
         ("d1", "label", "chat", None),
         ("d2", "label", "cat", "EN-US"),   # uppercase tag in the store
         ("d2", "label", "Katze", "de"),
         ("d3", "label", "chat", "fr"),
         ("d1", "linksTo", "d2", None),
         ("d2", "linksTo", "d3", None),
         ("chat", "isWord", "yes", None)],  # 'chat' as an IRI-position term
        TAGGED,
    ).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


# ---------------------------------------------------------------- constants


def test_tagged_constant_filters_on_tag(tg):
    q = 'SELECT ?d WHERE { ?d label "chat"@en . }'
    assert rows(sparql(tg, q)) == {("d1",)}


def test_tag_case_insensitive_both_sides(tg):
    # query @en-us vs store 'EN-US' — RDF 1.1 lowercase normalization
    q = 'SELECT ?d WHERE { ?d label "cat"@EN-US . }'
    assert rows(sparql(tg, q)) == {("d2",)}
    q = 'SELECT ?d WHERE { ?d label "cat"@en-us . }'
    assert rows(sparql(tg, q)) == {("d2",)}


def test_plain_constant_excludes_tagged_rows(tg):
    # "chat" (no tag) is a plain literal: matches ONLY the untagged row
    q = 'SELECT ?d WHERE { ?d label "chat" . }'
    assert rows(sparql(tg, q)) == {("d1",)}


def test_tagged_constant_needs_tagged_store(spark):
    plain = spark.createDataFrame([("d1", "label", "chat")],
                                  "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="obj_lang"):
        sparql(plain, 'SELECT ?d WHERE { ?d label "chat"@en . }').collect()


# ------------------------------------------------------- variable bindings


def test_projected_var_keeps_companion_and_distinct_by_term(tg):
    q = 'SELECT DISTINCT ?l WHERE { d1 label ?l . }'
    out = sparql(tg, q)
    assert out.columns == ["l", "l__lang"]
    # three DISTINCT terms even though the lexical form is one string
    assert rows(out) == {("chat", "en"), ("chat", "fr"), ("chat", "")}


def test_star_projection_hides_companions_but_keeps_terms(tg):
    out = sparql(tg, "SELECT * WHERE { d1 label ?l . }")
    assert out.columns == ["l", "l__lang"]  # companion re-attached


def test_lang_builtin_filter(tg):
    q = ('SELECT ?d WHERE { ?d label ?l . '
         'FILTER (?l = "chat" && LANG(?l) = "fr") }')
    assert rows(sparql(tg, q)) == {("d1",), ("d3",)}


def test_lang_of_plain_literal_is_empty_string(tg):
    q = 'SELECT ?d ?l WHERE { ?d label ?l . FILTER (LANG(?l) = "") }'
    assert rows(sparql(tg, q)) == {("d1", "chat", "")}


def test_langmatches_star_exact_and_prefix(tg):
    base = 'SELECT ?d ?l WHERE {{ ?d label ?l . FILTER ({}) }}'
    # '*' = any non-empty tag
    got = rows(sparql(tg, base.format('LANGMATCHES(LANG(?l), "*")')))
    assert got == {("d1", "chat", "en"), ("d1", "chat", "fr"),
                   ("d2", "cat", "en-us"), ("d2", "Katze", "de"),
                   ("d3", "chat", "fr")}
    # extended-prefix: 'en' matches 'en-us', not 'de'
    got = rows(sparql(tg, base.format('LANGMATCHES(LANG(?l), "en")')))
    assert got == {("d1", "chat", "en"), ("d2", "cat", "en-us")}
    # exact is case-insensitive
    got = rows(sparql(tg, base.format('LANGMATCHES(LANG(?l), "EN-US")')))
    assert got == {("d2", "cat", "en-us")}


# -------------------------------------------------- term-equality in joins


def test_shared_var_join_tagged_both_sides(tg):
    # ?l bound from two tagged object positions: joins on (lexical, tag),
    # so d1/d3 share "chat"@fr but d2 never joins d1 on "chat"
    q = ('SELECT DISTINCT ?a ?b ?l WHERE '
         '{ ?a label ?l . ?b label ?l . FILTER (?a != ?b) }')
    assert rows(sparql(tg, q)) == {("d1", "d3", "chat", "fr"),
                                   ("d3", "d1", "chat", "fr")}


def test_repeated_var_iri_and_object_position_pins_plain(tg):
    # ?w appears as a SUBJECT (IRI position) and a tagged OBJECT:
    # term equality admits only PLAIN object rows ('chat' untagged)
    q = "SELECT DISTINCT ?w WHERE { ?d label ?w . ?w isWord ?y . }"
    got = sparql(tg, q)
    assert rows(got) == {("chat", "")}


def test_minus_is_term_level(tg):
    # MINUS removes the TERM "chat"@fr (what d3 has); the same lexical
    # form under @en or untagged survives for d1
    q = ('SELECT DISTINCT ?d ?l WHERE { ?d label ?l . '
         'MINUS { d3 label ?l . } }')
    got = rows(sparql(tg, q))
    assert ("d1", "chat", "fr") not in got and ("d3", "chat", "fr") not in got
    assert ("d1", "chat", "en") in got and ("d1", "chat", "") in got


def test_optional_left_join_on_term(tg):
    # OPTIONAL shares tagged ?l: only the exact TERM extends — under
    # lexical-only equality d3 would ALSO attach to d1's @en and plain rows
    q = 'SELECT DISTINCT ?l ?o WHERE { d1 label ?l . OPTIONAL { ?o label ?l . } }'
    assert rows(sparql(tg, q)) == {
        ("chat", "en", "d1"),
        ("chat", "fr", "d1"), ("chat", "fr", "d3"),
        ("chat", "", "d1"),
    }


def test_group_by_tagged_var_groups_by_term(tg):
    q = ('SELECT ?l (COUNT(?d) AS ?n) WHERE { ?d label ?l . } '
         'GROUP BY ?l ORDER BY ?l')
    got = rows(sparql(tg, q))
    assert ("chat", 2, "fr") in got or ("chat", "fr", 2) in got


def test_union_fill_marks_untagged_branch_plain(tg):
    # ?t tagged in branch 1, IRI-position in branch 2: branch-2 rows get
    # '' (plain) companions, not NULL
    q = ('SELECT DISTINCT ?t WHERE { d2 label ?t . } '
         'UNION { ?t isWord yes . }')
    got = rows(sparql(tg, q))
    assert ("chat", "") in got
    assert ("cat", "en-us") in got and ("Katze", "de") in got


# ----------------------------------------------------- untagged unaffected


def test_untagged_store_schema_untouched(spark):
    plain = spark.createDataFrame(
        [("d1", "label", "chat"), ("d2", "label", "chat")],
        "subj string, pred string, obj string")
    out = sparql(plain, "SELECT DISTINCT ?l WHERE { ?d label ?l . }")
    assert out.columns == ["l"]
    assert rows(out) == {("chat",)}


# ------------------------------------------------------------ loud refusals


@pytest.mark.parametrize("q,msg", [
    ('SELECT ?p WHERE { "chat"@en ?p ?o . }', "subject"),
    ('SELECT ?d WHERE { ?d label ?l . VALUES ?l { "chat"@en } }',
     "VALUES"),
    ('SELECT ?d WHERE { ?d label ?l . FILTER (?l = "chat"@en) }',
     "expression"),
    ('SELECT ?d WHERE { ?d label "x"^^xsd:string@en . }', "exactly one"),
])
def test_syntax_refusals(tg, q, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        sparql(tg, q)


def test_property_path_refused_on_tagged_store(tg):
    with pytest.raises(ValueError, match="property-path"):
        sparql(tg, "SELECT ?x WHERE { d1 linksTo+ ?x . }").collect()


def test_construct_refuses_tagged_binding(tg):
    with pytest.raises(ValueError, match="CONSTRUCT"):
        sparql(tg, "CONSTRUCT { ?d hasLabel ?l } WHERE "
                   "{ ?d label ?l . }").collect()


def test_update_refused_on_tagged_store(tg):
    with pytest.raises(ValueError, match="tagged"):
        update_where(tg, where=[("?d", "label", "?l")],
                     delete=[("?d", "label", "?l")])


def test_reserved_suffix_variable_rejected(tg):
    with pytest.raises(ValueError, match="reserved"):
        bgp_match(tg, [("?d", "label", "?x__lang")]).collect()
