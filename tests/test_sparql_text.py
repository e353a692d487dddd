"""SPARQL text front-end (operators/sparql): parse + execute on the BGP
algebra; syntax-error contract for the unsupported remainder."""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.sparql import (
    SparqlSyntaxError,
    parse,
    sparql,
)

T = "subj string, pred string, obj string"


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(
        [("c1", "inNation", "N:7"), ("c1", "mktsegment", "BUILDING"),
         ("c2", "inNation", "N:7"), ("c2", "mktsegment", "AUTO"),
         ("c3", "inNation", "N:3"), ("c3", "mktsegment", "BUILDING"),
         ("c1", "knows", "c2"), ("c2", "knows", "c3"),
         ("N:7", "partOf", "R:1"), ("N:3", "partOf", "R:2"),
         ("R:1", "partOf", "W")],
        T,
    ).cache()


def rows(df):
    return {tuple(r) for r in df.collect()}


def test_select_filter_order_limit(graph):
    q = """SELECT ?c ?s WHERE {
             ?c inNation "N:7" ; mktsegment ?s .
             FILTER (?s != "AUTO")
           } ORDER BY ?c LIMIT 5"""
    assert rows(sparql(graph, q)) == {("c1", "BUILDING")}


def test_semicolon_comma_abbreviations(graph):
    q = 'SELECT ?c WHERE { ?c mktsegment "BUILDING", "AUTO" . }'
    # comma = same subject+pred: needs BOTH objects -> nobody
    assert rows(sparql(graph, q)) == set()


def test_group_by_having_desc(graph):
    q = """SELECT ?n (COUNT(?c) AS ?cnt) WHERE { ?c inNation ?n . }
           GROUP BY ?n HAVING (?cnt >= 2) ORDER BY DESC(?cnt)"""
    assert rows(sparql(graph, q)) == {("N:7", 2)}


def test_count_distinct_and_implicit_group(graph):
    q = """SELECT (COUNT(DISTINCT ?n) AS ?nations) WHERE
           { ?c inNation ?n . }"""
    assert rows(sparql(graph, q)) == {(2,)}


def test_property_path_alt_seq_plus(graph):
    q = """SELECT DISTINCT ?x WHERE {
             ?x (knows+/inNation)|inNation "N:3" . }"""
    # c3 directly; c1 and c2 via knows+ to c3
    assert rows(sparql(graph, q)) == {("c1",), ("c2",), ("c3",)}


def test_inverse_path(graph):
    q = 'SELECT ?n WHERE { ?n ^inNation "c1" . }'
    assert rows(sparql(graph, q)) == {("N:7",)}


def test_negated_property_set(graph):
    q = 'SELECT ?o WHERE { "c1" !(knows|mktsegment) ?o . }'
    assert rows(sparql(graph, q)) == {("N:7",)}


def test_variable_predicate(graph):
    q = 'SELECT ?p ?o WHERE { "c3" ?p ?o . }'
    assert rows(sparql(graph, q)) == {("inNation", "N:3"),
                                      ("mktsegment", "BUILDING")}


def test_optional_bound_filter(graph):
    q = """SELECT ?c WHERE {
             ?c inNation ?n .
             OPTIONAL { ?c knows ?k }
             FILTER (!BOUND(?k))
           }"""
    assert rows(sparql(graph, q)) == {("c3",)}


def test_values_minus_optional_bind(graph):
    q = """SELECT ?c ?up ?cu WHERE {
             VALUES ?seg { "BUILDING" "AUTO" }
             ?c mktsegment ?seg .
             OPTIONAL { ?c knows ?up }
             BIND (UCASE(?c) AS ?cu)
             MINUS { ?c inNation "N:3" }
           }"""
    assert rows(sparql(graph, q)) == {("c1", "c2", "C1"),
                                      ("c2", "c3", "C2")}


def test_values_row_form_with_undef(graph):
    q = """SELECT ?c ?n WHERE {
             ?c inNation ?n .
             VALUES (?c ?n) { ("c1" UNDEF) (UNDEF "N:3") }
           }"""
    assert rows(sparql(graph, q)) == {("c1", "N:7"), ("c3", "N:3")}


def test_union_extends_bindings(graph):
    q = """SELECT ?c ?n ?k WHERE { ?c inNation ?n . FILTER (?n = "N:3") }
           UNION { ?c knows ?k . }"""
    got = rows(sparql(graph, q))
    assert ("c3", "N:3", None) in got
    assert ("c1", None, "c2") in got and ("c2", None, "c3") in got


def test_ask_exists(graph):
    q = 'ASK { ?c mktsegment "AUTO" . FILTER EXISTS { ?c inNation "N:7" } }'
    assert rows(sparql(graph, q)) == {(True,)}
    q2 = 'ASK { ?c mktsegment "AUTO" . FILTER EXISTS { ?c inNation "N:9" } }'
    assert rows(sparql(graph, q2)) == {(False,)}


def test_filter_not_exists_is_minus(graph):
    q = """SELECT ?c WHERE { ?c inNation ?n .
           FILTER NOT EXISTS { ?c knows ?x } }"""
    assert rows(sparql(graph, q)) == {("c3",)}  # c1, c2 both know someone


def test_construct(graph):
    q = """CONSTRUCT { ?a sameRegionAs ?b } WHERE {
             ?a inNation ?n . ?b inNation ?n . FILTER (?a < ?b) }"""
    assert rows(sparql(graph, q)) == {("c1", "sameRegionAs", "c2")}


def test_regex_and_strstarts(graph):
    q = """SELECT ?c WHERE { ?c inNation ?n .
           FILTER (REGEX(?n, "^N:[0-9]$") && STRSTARTS(?c, "c")) }"""
    assert rows(sparql(graph, q)) == {("c1",), ("c2",), ("c3",)}


def test_prefix_expansion(graph):
    q = """PREFIX ex: <kno>
           SELECT ?x WHERE { ?x ex:ws "c2" . }"""
    assert parse(q)["groups"][0]["patterns"] == [("?x", "knows", "c2")]
    assert rows(sparql(graph, q)) == {("c1",)}


def test_offset_pagination(graph):
    q = "SELECT ?c WHERE { ?c inNation ?n . } ORDER BY ?c LIMIT 1 OFFSET 1"
    assert rows(sparql(graph, q)) == {("c2",)}


def test_select_star(graph):
    q = 'SELECT * WHERE { ?c inNation "N:3" . }'
    assert rows(sparql(graph, q)) == {("c3",)}


@pytest.mark.parametrize(
    "bad, msg",
    [
        ("SELECT ?x WHERE { ?x p ?y } JUNK ?z", "trailing"),
        ("SELECT WHERE { ?x p ?y }", "empty SELECT"),
        ("SELECT ?x WHERE { }", "no required triple"),
        ("SELECT ?z WHERE { ?x p ?y }", "unbound"),
        ("SELECT ?x WHERE { ?x p ?y } HAVING (?x > 1)", "HAVING without"),
        ("SELECT ?x WHERE { ?x p ?y . FILTER (FOO(?x)) }", "unsupported"),
        ("SELECT ?x WHERE { ?x p ?y . BIND (?y) }", "BIND without AS"),
    ],
)
def test_syntax_errors(graph, bad, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        sparql(graph, bad).collect()


def test_group_concat_and_sample(graph):
    q = """SELECT ?n (GROUP_CONCAT(?c) AS ?cs) (SAMPLE(?c) AS ?one)
           WHERE { ?c inNation ?n . } GROUP BY ?n ORDER BY ?n"""
    got = rows(sparql(graph, q))
    assert got == {("N:3", "c3", "c3"), ("N:7", "c1 c2", "c1")}


def test_subquery_aggregate_then_join(graph):
    q = """SELECT ?c ?n ?cnt WHERE {
             ?c inNation ?n .
             { SELECT ?n (COUNT(?c2) AS ?cnt)
               WHERE { ?c2 inNation ?n } GROUP BY ?n }
             FILTER (?cnt >= 2)
           }"""
    assert rows(sparql(graph, q)) == {("c1", "N:7", 2), ("c2", "N:7", 2)}


def test_subquery_only_group_outer_aggregate(graph):
    # group = subquery alone (empty-patterns bgp_match path); outer
    # aggregates the inner per-nation counts
    q = """SELECT (AVG(?cnt) AS ?a) (COUNT(*) AS ?k) WHERE {
             { SELECT ?n (COUNT(?c) AS ?cnt)
               WHERE { ?c inNation ?n } GROUP BY ?n }
           }"""
    assert rows(sparql(graph, q)) == {(1.5, 2)}


def test_subquery_modifiers_limit_then_join(graph):
    # top-1 nation by member count, then its members
    q = """SELECT ?c WHERE {
             ?c inNation ?n .
             { SELECT ?n WHERE { ?c2 inNation ?n }
               GROUP BY ?n ORDER BY DESC(?cnt) ?n LIMIT 1 }
           }"""
    # ?cnt unknown in that ORDER BY -> must raise (unbound projection
    # discipline also covers ORDER BY keys)
    with pytest.raises(Exception):
        sparql(graph, q).collect()
    q_ok = """SELECT ?c WHERE {
             ?c inNation ?n .
             { SELECT ?n (COUNT(?c2) AS ?cnt) WHERE { ?c2 inNation ?n }
               GROUP BY ?n ORDER BY DESC(?cnt) ?n LIMIT 1 }
           }"""
    assert rows(sparql(graph, q_ok)) == {("c1",), ("c2",)}


def test_subquery_nested_two_deep(graph):
    q = """SELECT ?n ?cnt WHERE {
             { SELECT ?n (COUNT(?c) AS ?cnt) WHERE {
                 ?c inNation ?n .
                 { SELECT ?c WHERE { ?c mktsegment "BUILDING" } }
               } GROUP BY ?n }
           }"""
    assert rows(sparql(graph, q)) == {("N:7", 1), ("N:3", 1)}


def test_subquery_scoping_inner_var_hidden(graph):
    with pytest.raises(SparqlSyntaxError, match="unbound"):
        sparql(graph, """SELECT ?c2 WHERE {
          ?c inNation ?n .
          { SELECT ?n (COUNT(?c2) AS ?cnt)
            WHERE { ?c2 inNation ?n } GROUP BY ?n }
        }""").collect()


def test_subquery_bare_nested_group_rejected(graph):
    with pytest.raises(SparqlSyntaxError, match="subquery"):
        parse("SELECT ?x WHERE { { ?x p ?y } }")


def test_path_zero_or_one(graph):
    # c1 knows? -> itself and c2 (identity from the node universe)
    q = 'SELECT ?y WHERE { c1 knows? ?y }'
    assert rows(sparql(graph, q)) == {("c1",), ("c2",)}


def test_describe_text_form(graph):
    q = 'DESCRIBE ?c WHERE { ?c mktsegment "AUTO" }'
    assert rows(sparql(graph, q)) == {
        ("c2", "inNation", "N:7"), ("c2", "mktsegment", "AUTO"),
        ("c2", "knows", "c3"),
    }


def test_graph_block_quads(spark):
    quads = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("a", "p", "y", "g2"),
         ("b", "p", "x", "g1"), ("a", "q", "z", "g1")],
        "subj string, pred string, obj string, graph string",
    )
    got = rows(sparql(quads, """SELECT ?s ?g WHERE {
        GRAPH ?g { ?s p "x" } }"""))
    assert got == {("a", "g1"), ("b", "g1")}
    # constant graph term + cross-graph variable join against g2
    got = rows(sparql(quads, """SELECT ?s WHERE {
        GRAPH <g1> { ?s q ?z } . GRAPH <g2> { ?s p ?y } }"""))
    assert got == {("a",)}


def test_graph_block_rejects_paths(graph):
    with pytest.raises(SparqlSyntaxError, match="GRAPH"):
        parse("SELECT ?s WHERE { GRAPH ?g { ?s knows+ ?o } }")


@pytest.fixture(scope="module")
def typed_graph(spark):
    return spark.createDataFrame(
        [("o1", "score", "700"), ("o2", "score", "450"),
         ("o3", "score", "900"), ("o4", "score", "n/a"),
         ("o1", "grp", "5"), ("o2", "grp", "5"), ("o3", "grp", "2"),
         ("o1", "day", "2024-03-01"), ("o2", "day", "2024-09-15"),
         ("o3", "day", "2024-12-31")],
        T,
    ).cache()


def test_typed_literal_constructor_filter(typed_graph):
    # xsd:integer(?v) -> TRY_CAST: "n/a" becomes NULL and is eliminated
    q = """SELECT ?o WHERE {
             ?o score ?v .
             FILTER (xsd:integer(?v) > "500"^^xsd:integer)
           }"""
    assert rows(sparql(typed_graph, q)) == {("o1",), ("o3",)}


def test_typed_literal_bind_unparseable_is_unbound(typed_graph):
    q = """SELECT ?o ?n WHERE {
             ?o score ?v .
             BIND (xsd:integer(?v) AS ?n)
           }"""
    got = rows(sparql(typed_graph, q))
    assert got == {("o1", 700), ("o2", 450), ("o3", 900), ("o4", None)}


def test_typed_literal_date_comparison(typed_graph):
    q = """SELECT ?o WHERE {
             ?o day ?d .
             FILTER (xsd:date(?d) >= "2024-09-01"^^xsd:date)
           }"""
    assert rows(sparql(typed_graph, q)) == {("o2",), ("o3",)}


def test_typed_literal_full_iri_and_data_position_canon(typed_graph):
    # data position: "05"^^xsd:integer canonicalizes to the stored "5";
    # full-IRI datatype spelling accepted
    q = """SELECT ?o WHERE {
             ?o grp "05"^^<http://www.w3.org/2001/XMLSchema#integer> .
           }"""
    assert rows(sparql(typed_graph, q)) == {("o1",), ("o2",)}


def test_typed_literal_decimal_and_double_constants(typed_graph):
    q = """SELECT ?o WHERE {
             ?o score ?v .
             FILTER (xsd:double(?v) < "4.6e2"^^xsd:double)
           }"""
    assert rows(sparql(typed_graph, q)) == {("o2",)}


def test_typed_literal_prefixed_via_declared_prefix(typed_graph):
    q = """PREFIX x: <http://www.w3.org/2001/XMLSchema#>
           SELECT ?o WHERE {
             ?o score ?v . FILTER (x:integer(?v) = "900"^^x:integer)
           }"""
    assert rows(sparql(typed_graph, q)) == {("o3",)}


@pytest.mark.parametrize("bad, msg", [
    ('SELECT ?o WHERE { ?o day "2024-09-01"^^xsd:date . }',
     "data position"),
    ('SELECT ?o WHERE { ?o score ?v . '
     'FILTER (?v > "12x"^^xsd:integer) }', "lexical form"),
    ('SELECT ?o WHERE { ?o score ?v . '
     'FILTER (?v > "2024-13-99T99"^^xsd:dateTime) }', "lexical form"),
    ('SELECT ?o WHERE { ?o score "x"^^xsd:unknownType . }',
     "data position"),
])
def test_typed_literal_errors(typed_graph, bad, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        sparql(typed_graph, bad)


# ---------------------------------------------------------------------------
# SPARQL UPDATE text form (r05): DELETE/INSERT ... WHERE onto update_where
# ---------------------------------------------------------------------------

def test_update_delete_insert_where(spark, graph):
    from i2o_transform_spark.operators.bgp import update_where

    q = """DELETE { ?c mktsegment "AUTO" }
           INSERT { ?c segment "auto-retired" . ?c inNation ?n }
           WHERE  { ?c mktsegment "AUTO" . ?c inNation ?n }"""
    got = rows(sparql(graph, q))
    want = rows(update_where(
        graph,
        where=[("?c", "mktsegment", "AUTO"), ("?c", "inNation", "?n")],
        delete=[("?c", "mktsegment", "AUTO")],
        insert=[("?c", "segment", "auto-retired"), ("?c", "inNation", "?n")],
    ))
    assert got == want
    assert ("c2", "mktsegment", "AUTO") not in got
    assert ("c2", "segment", "auto-retired") in got
    assert ("c2", "inNation", "N:7") in got        # re-assert dedups
    assert sum(1 for t in got if t == ("c2", "inNation", "N:7")) == 1


def test_update_delete_only_and_insert_only(graph):
    out = rows(sparql(graph, 'DELETE { ?a knows ?b } WHERE { ?a knows ?b }'))
    assert not any(p == "knows" for (_, p, _) in out)
    out2 = rows(sparql(
        graph, 'INSERT { ?b knownBy ?a } WHERE { ?a knows ?b }'))
    assert ("c2", "knownBy", "c1") in out2 and ("c1", "knows", "c2") in out2


@pytest.mark.parametrize("bad, msg", [
    ("DELETE { ?a knows ?b }", "WHERE"),
    ("INSERT { ?a (knows/knows) ?b } WHERE { ?a knows ?b }", "template"),
    ("DELETE { } WHERE { ?a knows ?b } JUNK", "trailing"),
])
def test_update_syntax_errors(graph, bad, msg):
    with pytest.raises(SparqlSyntaxError, match=msg):
        sparql(graph, bad)


def test_update_delete_where_shorthand(graph):
    """DELETE WHERE { ... }: the WHERE pattern doubles as the delete
    template (SPARQL 1.1 Update 3.1.2) — equal to the explicit form."""
    short = rows(sparql(graph, 'DELETE WHERE { ?a knows ?b }'))
    long_ = rows(sparql(
        graph, 'DELETE { ?a knows ?b } WHERE { ?a knows ?b }'))
    assert short == long_
    assert not any(p == "knows" for (_, p, _) in short)
    with pytest.raises(SparqlSyntaxError, match="plain triple-pattern"):
        sparql(graph, 'DELETE WHERE { ?a knows ?b . FILTER (?a != "c1") }')
