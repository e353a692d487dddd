"""BGP matcher (operators/bgp.py): golden bindings, repeated-variable
templates, disconnected-pattern cross join, bag-vs-set semantics, and the
join-order guarantee (connected pattern never plans a cartesian product)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from i2o_transform_spark.operators.bgp import bgp_match

T = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("a", "knows", "c"),
    ("c", "likes", "c"),
    ("a", "likes", "b"),
    ("b", "type", "person"),
    ("c", "type", "person"),
    ("a", "type", "robot"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        [Row(subj=s, pred=p, obj=o) for s, p, o in T]
    )


def test_two_hop_golden(triples):
    out = bgp_match(
        triples,
        [("?x", "knows", "?y"), ("?y", "knows", "?z"),
         ("?z", "type", "person")],
    )
    assert {tuple(sorted(r.asDict().items())) for r in out.collect()} == {
        (("x", "a"), ("y", "b"), ("z", "c")),
    }


def test_repeated_variable_intra_template(triples):
    # (?x likes ?x) — only the self-loop binds
    out = bgp_match(triples, [("?x", "likes", "?x")])
    assert [r.x for r in out.collect()] == ["c"]


def test_disconnected_pattern_cross_joins(triples):
    out = bgp_match(
        triples,
        [("a", "knows", "?x"), ("?y", "type", "robot")], distinct=True
    )
    got = {(r.x, r.y) for r in out.collect()}
    assert got == {("b", "a"), ("c", "a")}


def test_bag_vs_set_semantics(triples):
    # ?x knows ?z via any middle: a->b->c and a->c (direct) give ?x=a twice
    pats = [("?x", "knows", "?m"), ("?m", "knows", "?z")]
    bag = bgp_match(triples, [(p[0], p[1], p[2]) for p in pats],
                    distinct=False).select("x", "z")
    st = bgp_match(triples, pats).select("x", "z")
    assert bag.count() >= st.distinct().count()
    assert {(r.x, r.z) for r in st.collect()} == {("a", "c")}


def test_constant_only_template(triples):
    # fully-ground template acts as an ASK gate: binds nothing but
    # filters everything when absent
    out = bgp_match(triples, [("?x", "type", "robot"),
                              ("zz", "knows", "zz")])
    assert out.count() == 0


def test_empty_pattern_raises(triples):
    with pytest.raises(ValueError):
        bgp_match(triples, [])


def test_connected_pattern_has_no_cartesian(triples):
    out = bgp_match(
        triples,
        [("?x", "knows", "?y"), ("?y", "knows", "?z"),
         ("?z", "type", "person")],
    )
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_bgp_optional_binds_or_nulls(spark):
    import pytest

    from i2o_transform_spark.operators.bgp import bgp_match

    triples = spark.createDataFrame(
        [
            ("o1", "placedBy", "c1"), ("o2", "placedBy", "c2"),
            ("c1", "segment", "AUTO"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        (r.o, r.c, r.s)
        for r in bgp_match(
            triples,
            [("?o", "placedBy", "?c")],
            optional=[("?c", "segment", "?s")],
        ).collect()
    }
    assert got == {("o1", "c1", "AUTO"), ("o2", "c2", None)}
    # a disconnected OPTIONAL is refused, never a hidden cross join
    with pytest.raises(ValueError):
        bgp_match(
            triples,
            [("?o", "placedBy", "?c")],
            optional=[("?x", "segment", "?y")],
        )


def test_bgp_minus_removes_matched_solutions(spark):
    import pytest

    from i2o_transform_spark.operators.bgp import bgp_match

    triples = spark.createDataFrame(
        [
            ("c1", "inNation", "N:7"), ("c2", "inNation", "N:7"),
            ("c1", "flagged", "x1"), ("c1", "flagged", "x2"),
        ],
        "subj string, pred string, obj string",
    )
    got = {
        r.c
        for r in bgp_match(
            triples,
            [("?c", "inNation", "N:7")],
            minus=[("?c", "flagged", "?x")],
        ).collect()
    }
    assert got == {"c2"}  # c1 removed ONCE despite two flag matches
    with pytest.raises(ValueError):
        bgp_match(triples, [("?c", "inNation", "N:7")],
                  minus=[("?a", "flagged", "?b")])


def test_plan_order_cost_based_vs_constants(spark):
    from i2o_transform_spark.operators.bgp import plan_order

    patterns = [
        ("?o", "placedBy", "?c"),      # 0: huge predicate
        ("?c", "inNation", "N:7"),     # 1: small predicate + a constant
        ("?o", "priority", "?p"),      # 2: huge predicate
    ]
    # without stats: most constants first -> template 1 seeds either way
    assert plan_order(patterns)[0] == 1
    # with stats: the tiny predicate seeds even WITHOUT its constant
    stats = {"placedBy": 1_000_000, "inNation": 100, "priority": 1_000_000}
    no_const = [("?o", "placedBy", "?c"), ("?c", "inNation", "?n"),
                ("?o", "priority", "?p")]
    assert plan_order(no_const, stats)[0] == 1
    # connectivity still wins over raw cost: after seeding with 1, the
    # next pick must share ?c or ?n -> template 0 (placedBy), NOT 2
    assert plan_order(no_const, stats) == [1, 0, 2]


def test_bgp_match_stats_same_answer(spark):
    from i2o_transform_spark.operators.bgp import bgp_match

    triples = spark.createDataFrame(
        [("o1", "placedBy", "c1"), ("c1", "inNation", "N:7"),
         ("o2", "placedBy", "c2"), ("c2", "inNation", "N:8")],
        "subj string, pred string, obj string",
    )
    pats = [("?o", "placedBy", "?c"), ("?c", "inNation", "N:7")]
    # column ORDER is join-order-dependent; bindings must not be
    a = {(r["o"], r["c"]) for r in bgp_match(triples, pats).collect()}
    b = {(r["o"], r["c"]) for r in bgp_match(
        triples, pats, stats={"placedBy": 2, "inNation": 2}
    ).collect()}
    assert a == b == {("o1", "c1")}


def _rows(df):
    return {tuple(sorted(r.asDict().items())) for r in df.collect()}


def test_bgp_values_equi_and_undef(triples):
    # no-UNDEF table: plain equi-join on the shared variable
    out = bgp_match(
        triples,
        [("?x", "knows", "?y")],
        values=[{"y": "b", "lab": "isB"}, {"y": "c", "lab": "isC"}],
    )
    assert _rows(out) == {
        (("lab", "isB"), ("x", "a"), ("y", "b")),
        (("lab", "isC"), ("x", "a"), ("y", "c")),
        (("lab", "isC"), ("x", "b"), ("y", "c")),
    }
    # UNDEF row matches anything and still contributes its other bindings
    out2 = bgp_match(
        triples,
        [("?x", "likes", "?y")],
        values=[{"y": "b", "lab": "isB"}, {"y": None, "lab": "anyY"}],
    )
    assert _rows(out2) == {
        (("lab", "isB"), ("x", "a"), ("y", "b")),
        (("lab", "anyY"), ("x", "a"), ("y", "b")),
        (("lab", "anyY"), ("x", "c"), ("y", "c")),
    }


def test_bgp_values_fresh_vars_and_empty(triples):
    # VALUES variables disjoint from the pattern extend every solution
    out = bgp_match(
        triples,
        [("?x", "type", "robot")],
        values=[{"g": "g1"}, {"g": "g2"}],
    )
    assert _rows(out) == {
        (("g", "g1"), ("x", "a")),
        (("g", "g2"), ("x", "a")),
    }
    with pytest.raises(ValueError, match="binds no variables"):
        bgp_match(triples, [("?x", "type", "robot")], values=[{}])


def test_bgp_bind_and_filter(triples):
    out = bgp_match(
        triples,
        [("?x", "knows", "?y")],
        bind={"pair": "concat(x, '->', y)"},
        filter_expr="y <> 'c'",
    )
    assert _rows(out) == {(("pair", "a->b"), ("x", "a"), ("y", "b"))}
    # FILTER over a NULL (unbound OPTIONAL) binding eliminates the row —
    # SPARQL error-eliminates semantics
    out2 = bgp_match(
        triples,
        [("?x", "type", "?t")],
        optional=[("?x", "likes", "?w")],
        filter_expr="w = 'b'",
    )
    assert _rows(out2) == {(("t", "robot"), ("w", "b"), ("x", "a"))}
    with pytest.raises(ValueError, match="already bound"):
        bgp_match(triples, [("?x", "knows", "?y")], bind={"y": "x"})


def test_bgp_aggregate_skips_optional_nulls(triples):
    from i2o_transform_spark.operators.bgp import bgp_aggregate

    bindings = bgp_match(
        triples,
        [("?x", "type", "?t")],
        optional=[("?x", "knows", "?y")],
        distinct=False,
    )
    out = bgp_aggregate(
        bindings,
        ["t"],
        {
            "n": ("count", "*"),
            "n_knows": ("count", "y"),
            "n_targets": ("count_distinct", "y"),
            "first_target": ("sample", "y"),
            "all_targets": ("group_concat", "y"),
        },
    )
    got = {r["t"]: r.asDict() for r in out.collect()}
    # robot 'a' knows b and c (2 rows); persons: b knows c, c knows nothing
    # but still counts 1 row with NULL y — skipped by count(y)
    assert got["robot"]["n"] == 2
    assert got["robot"]["n_knows"] == 2
    assert got["robot"]["n_targets"] == 2
    assert got["robot"]["first_target"] == "b"
    assert got["robot"]["all_targets"] == "b c"
    assert got["person"]["n"] == 2
    assert got["person"]["n_knows"] == 1
    assert got["person"]["n_targets"] == 1
    # global group: empty group_by
    tot = bgp_aggregate(bindings, [], {"n": ("count", "*")}).collect()[0]
    assert tot["n"] == 4
    with pytest.raises(ValueError, match="unknown aggregate"):
        bgp_aggregate(bindings, [], {"n": ("median", "y")})


def test_bgp_path_templates(triples):
    """Property-path expressions in the predicate position compose with
    plain templates: plus-closure, seq, inverse, and constants/repeated
    vars on the endpoints all bind like ordinary scans."""
    out = bgp_match(
        triples,
        [
            ("?x", ("plus", ("pred", "knows")), "?z"),
            ("?z", "type", "person"),
        ],
    )
    assert _rows(out) == {
        (("x", "a"), ("z", "b")),
        (("x", "a"), ("z", "c")),
        (("x", "b"), ("z", "c")),
    }
    # constant object + seq path; 'a likes b, b knows c' -> a
    out2 = bgp_match(
        triples,
        [("?w", ("seq", ("pred", "likes"), ("pred", "knows")), "c")],
    )
    assert _rows(out2) == {(("w", "a"),)}
    # star derives the node universe from the triples frame itself
    out3 = bgp_match(
        triples,
        [("a", ("star", ("pred", "knows")), "?r")],
    )
    assert _rows(out3) == {(("r", "a"),), (("r", "b"),), (("r", "c"),)}


def test_construct_partial_instantiation(triples):
    # CONSTRUCT with an OPTIONAL-bound variable: templates referencing the
    # unbound ?t stay silent, the others still fire per solution.
    from i2o_transform_spark.operators.bgp import bgp_construct

    out = bgp_construct(
        triples,
        [("?x", "knows", "?y")],
        [("?y", "knownBy", "?x"), ("?x", "kind", "?t")],
        optional=[("?x", "type", "?t")],
    )
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert got == {
        ("b", "knownBy", "a"), ("c", "knownBy", "b"), ("c", "knownBy", "a"),
        ("a", "kind", "robot"), ("b", "kind", "person"),
    }


def test_construct_is_a_set(triples):
    # a knows b via two solutions (?m = b and ?m = c would differ) — the
    # constructed graph still holds each triple once.
    from i2o_transform_spark.operators.bgp import bgp_construct

    out = bgp_construct(
        triples,
        [("?x", "knows", "?m"), ("?m", "knows", "?z")],
        [("?x", "reaches", "?z")],
    )
    rows = [(r.subj, r.pred, r.obj) for r in out.collect()]
    assert sorted(rows) == [("a", "reaches", "c")]
    assert len(rows) == len(set(rows))


def test_construct_rejects_paths_and_empty(triples):
    from i2o_transform_spark.operators.bgp import bgp_construct

    with pytest.raises(ValueError, match="template"):
        bgp_construct(triples, [("?x", "knows", "?y")], [])
    with pytest.raises(ValueError, match="property-path"):
        bgp_construct(
            triples,
            [("?x", "knows", "?y")],
            [("?x", ("pred", "knows"), "?y")],
        )


def test_solution_modifiers_order_offset_limit(triples):
    from i2o_transform_spark.operators.bgp import bgp_match, solution_modifiers

    b = bgp_match(triples, [("?x", "knows", "?y")])
    # total order: y desc, then tie-break x asc appended automatically
    rows = [
        (r.x, r.y)
        for r in solution_modifiers(b, [("y", "desc")]).collect()
    ]
    assert rows == [("a", "c"), ("b", "c"), ("a", "b")]
    page = [
        (r.x, r.y)
        for r in solution_modifiers(b, [("y", "desc")], limit=2,
                                    offset=1).collect()
    ]
    assert page == rows[1:3]
    with pytest.raises(ValueError, match="asc/desc"):
        solution_modifiers(b, [("y", "down")])


def test_solution_modifiers_limit_plan_is_heap(triples):
    # ORDER BY + LIMIT must execute as TakeOrderedAndProject (per-partition
    # top-k heaps), never a materialized global Sort.
    from i2o_transform_spark.operators.bgp import bgp_match, solution_modifiers

    b = bgp_match(triples, [("?x", "knows", "?y")])
    plan = solution_modifiers(
        b, [("y", "desc")], limit=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --- UNION / ASK / DESCRIBE / quads / UPDATE (round-4 close-out) ---------


def _tuples(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple("" if v is None else str(v) for v in t),
    )


def test_union_extends_binding_set(triples):
    from i2o_transform_spark.operators.bgp import bgp_union

    out = bgp_union(
        triples,
        [
            {"patterns": [("?x", "type", "robot")]},
            {"patterns": [("?x", "likes", "?y")]},
        ],
    )
    assert out.columns == ["x", "y"]
    assert _tuples(out) == [("a", None), ("a", "b"), ("c", "c")]


def test_union_bag_vs_set(triples):
    from i2o_transform_spark.operators.bgp import bgp_union

    groups = [
        {"patterns": [("?x", "type", "person")]},
        {"patterns": [("?x", "knows", "?y"), ("?y", "type", "person")]},
    ]
    bag = bgp_union(triples, groups, distinct=False)
    st = bgp_union(triples, groups)
    # branch overlap: b and c appear in both branches with different
    # bindings, so bag > set only if identical rows repeat — here the
    # NULL-y rows differ from the bound rows, all survive distinct
    assert bag.count() == 5 and st.count() == 5
    # duplicate-producing union: same branch twice
    dup = bgp_union(triples, [groups[0], groups[0]], distinct=False)
    assert dup.count() == 4
    assert bgp_union(triples, [groups[0], groups[0]]).count() == 2
    with pytest.raises(ValueError):
        bgp_union(triples, [])


def test_ask_true_false_and_early_exit_plan(triples):
    from i2o_transform_spark.operators.bgp import bgp_ask

    yes = bgp_ask(triples, [("?x", "knows", "?y"), ("?y", "likes", "?y")])
    no = bgp_ask(triples, [("?x", "knows", "a")])
    assert yes.collect()[0]["ask"] is True
    assert no.collect()[0]["ask"] is False
    # early exit: the match side sits under a limit node (Local/Global
    # under AQE), not a full aggregate over every solution
    assert "Limit" in yes._jdf.queryExecution().executedPlan().toString()


def test_describe_cbd_and_incoming(triples):
    from i2o_transform_spark.operators.bgp import bgp_describe

    # resources b (robot a knows b via likes? no — a likes b) described
    out = bgp_describe(triples, [("a", "likes", "?y")], "?y")
    assert _tuples(out) == [("b", "knows", "c"), ("b", "type", "person")]
    both = bgp_describe(
        triples, [("a", "likes", "?y")], "?y", include_incoming=True
    )
    assert ("a", "knows", "b") in _tuples(both)
    with pytest.raises(ValueError):
        bgp_describe(triples, [("a", "likes", "?y")], "?z")


def test_quad_patterns_graph_join_and_constant(spark):
    quads = spark.createDataFrame(
        [
            ("a", "knows", "b", "g1"),
            ("b", "type", "person", "g1"),
            ("a", "knows", "c", "g2"),
            ("c", "type", "person", "g3"),
        ],
        "subj string, pred string, obj string, graph string",
    )
    # graph variable joins across patterns: only g1 has both triples
    out = bgp_match(
        quads,
        [("?s", "knows", "?o", "?g"), ("?o", "type", "person", "?g")],
    )
    assert _tuples(out) == [("g1", "b", "a")] or _tuples(out) == [
        ("a", "b", "g1")
    ] or len(out.collect()) == 1
    # constant graph prunes
    out2 = bgp_match(quads, [("a", "knows", "?o", "g2")])
    assert _tuples(out2) == [("c",)]
    # paths inside quad patterns are refused
    with pytest.raises(ValueError):
        bgp_match(quads, [("?s", ("pred", "knows"), "?o", "?g")])


def test_update_where_delete_insert_set_semantics(triples):
    from i2o_transform_spark.operators.bgp import update_where

    out = update_where(
        triples,
        where=[("?x", "type", "robot"), ("?x", "knows", "?y")],
        delete=[("?x", "knows", "?y")],
        insert=[("?x", "met", "?y"), ("?x", "type", "robot")],
    )
    rows = set(_tuples(out))
    assert ("a", "knows", "b") not in rows and ("a", "knows", "c") not in rows
    assert ("a", "met", "b") in rows and ("a", "met", "c") in rows
    # re-asserting an existing triple must not duplicate it (set graph)
    assert out.where("subj='a' and pred='type'").count() == 1
    # untouched triples survive
    assert ("b", "knows", "c") in rows
    with pytest.raises(ValueError):
        update_where(triples, [("?x", "type", "robot")])


def test_update_delete_then_insert_order(triples):
    from i2o_transform_spark.operators.bgp import update_where

    # a triple in BOTH templates ends up PRESENT (delete before insert)
    out = update_where(
        triples,
        where=[("a", "likes", "?y")],
        delete=[("a", "likes", "?y")],
        insert=[("a", "likes", "?y")],
    )
    assert out.where("subj='a' and pred='likes' and obj='b'").count() == 1
    assert out.count() == len(T)


def test_bgp_exists_semi_join_no_fanout(triples):
    # FILTER EXISTS keeps only solutions with a matching binding, never
    # fans out, and binds nothing
    out = bgp_match(
        triples,
        [("?x", "type", "person")],
        exists=[("?x", "knows", "?y")],
    )
    assert out.columns == ["x"]
    assert _tuples(out) == [("b",)]  # c knows nobody; b knows c
    # a solution matched by MANY exists rows appears once (a knows b AND c)
    out2 = bgp_match(
        triples,
        [("?x", "type", "robot")],
        exists=[("?x", "knows", "?y")],
        distinct=False,
    )
    assert _tuples(out2) == [("a",)]
    with pytest.raises(ValueError, match="EXISTS"):
        bgp_match(triples, [("?x", "type", "robot")],
                  exists=[("?p", "knows", "?q")])
