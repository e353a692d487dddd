"""RDF collection unroll (operators/rdflist): pointer-doubling cons-list
resolution, well-formedness probes, cycle detection, owl:unionOf expansion.
"""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.rdflist import (
    MalformedCollection,
    expand_unionof,
    unroll_collections,
)

T = "subj string, pred string, obj string"


def _chain(name: str, members: list[str]) -> list[tuple[str, str, str]]:
    """Well-formed cons chain ``<name>:0 -> ... -> rdf:nil``."""
    rows = []
    for i, m in enumerate(members):
        cell = f"{name}:{i}"
        nxt = f"{name}:{i + 1}" if i + 1 < len(members) else "rdf:nil"
        rows.append((cell, "rdf:first", m))
        rows.append((cell, "rdf:rest", nxt))
    return rows


def test_unroll_positions_and_heads(spark):
    t = spark.createDataFrame(
        _chain("a", ["x", "y", "z"]) + _chain("b", ["q"]), T
    )
    out = {(r.head, r.pos, r.member)
           for r in unroll_collections(t).collect()}
    assert out == {("a:0", 0, "x"), ("a:0", 1, "y"), ("a:0", 2, "z"),
                   ("b:0", 0, "q")}


def test_unroll_long_list_needs_doubling_rounds(spark):
    # 200 cells: a per-hop walk would need 200 rounds; doubling needs 8.
    members = [f"m{i}" for i in range(200)]
    t = spark.createDataFrame(_chain("L", members), T)
    rows = unroll_collections(t, max_rounds=9).orderBy("pos").collect()
    assert [r.member for r in rows] == members
    assert all(r.head == "L:0" for r in rows)


def test_unroll_long_list_round_budget_exceeded_is_cycle_free_partial(spark):
    # max_rounds too small: strict mode raises at the no-progress probe
    # only for CYCLES; a round-budget exhaustion returns the anchored
    # prefix (cells within 2^max_rounds of the head).
    members = [f"m{i}" for i in range(40)]
    t = spark.createDataFrame(_chain("L", members), T)
    rows = unroll_collections(t, max_rounds=3, strict=True).collect()
    got = {r.pos for r in rows}
    assert got == set(range(len(got)))  # contiguous prefix from the head
    assert 1 <= len(got) < 40


@pytest.mark.parametrize(
    "extra",
    [
        [("a:1", "rdf:first", "dup")],                  # duplicate first
        [("a:1", "rdf:rest", "rdf:nil")],               # duplicate rest
        [("h:0", "rdf:rest", "h:1"),
         ("h:1", "rdf:rest", "rdf:nil")],               # rest w/o first
        [("h:0", "rdf:first", "orphan")],               # first w/o rest
        [("s:0", "rdf:first", "s"), ("s:0", "rdf:rest", "a:1")],  # shared tail
    ],
)
def test_strict_raises_on_malformed(spark, extra):
    t = spark.createDataFrame(_chain("a", ["x", "y", "z"]) + extra, T)
    with pytest.raises(MalformedCollection):
        unroll_collections(t).collect()


def test_nonstrict_quarantines_but_keeps_good_lists(spark):
    bad = [("a:1", "rdf:first", "dup")]  # a:1 now has two firsts
    t = spark.createDataFrame(
        _chain("a", ["x", "y", "z"]) + _chain("b", ["q", "r"]) + bad, T
    )
    out = {(r.head, r.pos, r.member)
           for r in unroll_collections(t, strict=False).collect()}
    # list b is untouched; list a loses the poisoned cell (and its
    # downstream chain cannot anchor through it).
    assert {("b:0", 0, "q"), ("b:0", 1, "r")} <= out
    assert not any(m == "dup" for _, _, m in out)


def test_cycle_detected_strict_and_dropped_nonstrict(spark):
    cyc = [
        ("c:0", "rdf:first", "u"), ("c:0", "rdf:rest", "c:1"),
        ("c:1", "rdf:first", "v"), ("c:1", "rdf:rest", "c:0"),
    ]
    # a pure 2-cycle has no head: every cell has a predecessor.  But the
    # shared-tail probe fires first only when a cell has TWO preds, so
    # this is the clean cycle case.
    t = spark.createDataFrame(_chain("a", ["x"]) + cyc, T)
    with pytest.raises(MalformedCollection):
        unroll_collections(t).collect()
    out = {(r.head, r.pos, r.member)
           for r in unroll_collections(t, strict=False).collect()}
    assert out == {("a:0", 0, "x")}


def test_expand_unionof(spark):
    t = spark.createDataFrame(
        _chain("l1", ["ClsA", "ClsB"]) + _chain("l2", ["ClsC"])
        + [("Union1", "owl:unionOf", "l1:0"),
           ("Union2", "owl:unionOf", "l2:0")],
        T,
    )
    out = {(r.sub, r.sup) for r in expand_unionof(t).collect()}
    assert out == {("ClsA", "Union1"), ("ClsB", "Union1"),
                   ("ClsC", "Union2")}


def test_millions_of_lists_resolve_in_log_rounds_of_longest(spark):
    # many short lists + one long list: round count is driven by the
    # LONGEST list only (all lists double together).  120 lists of 3 and
    # one list of 64 must finish inside ceil(log2 64)+1 = 7 rounds.
    rows = []
    for g in range(120):
        rows += _chain(f"g{g}", [f"g{g}m{j}" for j in range(3)])
    rows += _chain("big", [f"B{j}" for j in range(64)])
    t = spark.createDataFrame(rows, T)
    out = unroll_collections(t, max_rounds=7)
    assert out.count() == 120 * 3 + 64


# ---- owl_class_entail (reasoner) -------------------------------------

TT = "subj string, pred string, obj string"


def _onto(*specs):
    """specs: (cls, kind, [members]) -> cons-encoded axiom triples."""
    rows = []
    for cls, kind, members in specs:
        head = f"{cls}#0"
        for i, m in enumerate(members):
            cell = f"{cls}#{i}"
            nxt = f"{cls}#{i + 1}" if i + 1 < len(members) else "rdf:nil"
            rows += [(cell, "rdf:first", m), (cell, "rdf:rest", nxt)]
        rows.append((cls, kind, head))
    return rows


def _types(*pairs):
    return [(n, "rdf:type", c) for n, c in pairs]


def test_class_entail_int1_requires_all_conjuncts(spark):
    from i2o_transform_spark.operators.reasoner import owl_class_entail

    t = spark.createDataFrame(
        _onto(("Both", "owl:intersectionOf", ["A", "B"]))
        + _types(("x", "A"), ("x", "B"), ("y", "A")), TT)
    out = {(r.node, r.cls) for r in owl_class_entail(t).collect()}
    assert ("x", "Both") in out
    assert ("y", "Both") not in out        # partial membership never fires
    # cls-int2 on the derived intersection adds nothing new for x
    assert out == {("x", "A"), ("x", "B"), ("x", "Both"), ("y", "A")}


def test_class_entail_int2_decomposes_asserted_intersection(spark):
    from i2o_transform_spark.operators.reasoner import owl_class_entail

    t = spark.createDataFrame(
        _onto(("Both", "owl:intersectionOf", ["A", "B"]))
        + _types(("z", "Both")), TT)
    out = {(r.node, r.cls) for r in owl_class_entail(t).collect()}
    assert out == {("z", "Both"), ("z", "A"), ("z", "B")}


def test_class_entail_nested_union_needs_fixpoint(spark):
    from i2o_transform_spark.operators.reasoner import owl_class_entail

    # Outer's member Both only materializes in round 2 for w.
    t = spark.createDataFrame(
        _onto(("Both", "owl:intersectionOf", ["A", "B"]),
              ("Outer", "owl:unionOf", ["Both", "C"]))
        + _types(("w", "A"), ("w", "B"), ("v", "C")), TT)
    out = {(r.node, r.cls) for r in owl_class_entail(t).collect()}
    assert ("w", "Both") in out and ("w", "Outer") in out
    assert ("v", "Outer") in out and ("v", "Both") not in out


def test_class_entail_oneof_is_data_free(spark):
    from i2o_transform_spark.operators.reasoner import owl_class_entail

    t = spark.createDataFrame(
        _onto(("Enum", "owl:oneOf", ["e1", "e2"])), TT)
    out = {(r.node, r.cls) for r in owl_class_entail(t).collect()}
    assert out == {("e1", "Enum"), ("e2", "Enum")}


def test_class_entail_oneof_members_feed_other_rules(spark):
    from i2o_transform_spark.operators.reasoner import owl_class_entail

    # e1 gets Enum by cls-oo; Enum is a union member, so e1 also gets Up.
    t = spark.createDataFrame(
        _onto(("Enum", "owl:oneOf", ["e1"]),
              ("Up", "owl:unionOf", ["Enum", "Other"])), TT)
    out = {(r.node, r.cls) for r in owl_class_entail(t).collect()}
    assert out == {("e1", "Enum"), ("e1", "Up")}


def test_class_entail_no_axioms_is_identity(spark):
    from i2o_transform_spark.operators.reasoner import owl_class_entail

    t = spark.createDataFrame(_types(("a", "X"), ("b", "Y")), TT)
    out = {(r.node, r.cls) for r in owl_class_entail(t).collect()}
    assert out == {("a", "X"), ("b", "Y")}


# ---- sh:in (shacl_validate in_values) --------------------------------


def test_shacl_in_counts_offending_objects_per_focus(spark):
    from i2o_transform_spark.operators.shacl import shacl_validate

    triples = spark.createDataFrame(
        [("n1", "color", "red", False),
         ("n1", "color", "mauve", False),
         ("n1", "color", "taupe", False),
         ("n2", "color", "blue", False),
         ("n2", "size", "XXL", False)],   # size not enumerated: ignored
        "subj string, pred string, obj string, obj_is_iri boolean")
    shapes = spark.createDataFrame(
        [("color", None, None, None, None, None)],
        "pred string, domain_type string, range_type string, "
        "obj_kind string, min_card int, max_card int")
    in_values = spark.createDataFrame(
        [("color", "red"), ("color", "blue")], "pred string, allowed string")
    out = shacl_validate(
        triples, spark.createDataFrame([], "node string, type string"),
        shapes, in_values=in_values,
    ).collect()
    rows = {(r.node, r.pred, r.violation, r.n) for r in out}
    assert rows == {("n1", "color", "in", 2)}


# ---- owl_chain_entail (reasoner, prp-spo2) ----------------------------


def _chain_axiom(sup, members):
    rows = []
    for i, m in enumerate(members):
        cell = f"{sup}#{i}"
        nxt = f"{sup}#{i + 1}" if i + 1 < len(members) else "rdf:nil"
        rows += [(cell, "rdf:first", m), (cell, "rdf:rest", nxt)]
    rows.append((sup, "owl:propertyChainAxiom", f"{sup}#0"))
    return rows


def test_chain_entail_uncle(spark):
    from i2o_transform_spark.operators.reasoner import owl_chain_entail

    t = spark.createDataFrame(
        _chain_axiom("uncle", ["parent", "brother"])
        + [("kid", "parent", "dad"), ("dad", "brother", "bob"),
           ("dad", "brother", "jim"), ("kid2", "parent", "mom")],
        TT)
    out = {tuple(r) for r in owl_chain_entail(t).collect()}
    assert ("kid", "uncle", "bob") in out and ("kid", "uncle", "jim") in out
    assert not any(s == "kid2" and p == "uncle" for s, p, o in out)
    # axiom encoding triples are not part of the entailed graph
    assert not any(p in ("rdf:first", "rdf:rest", "owl:propertyChainAxiom")
                   for _, p, _ in out)


def test_chain_entail_recursive_ancestor(spark):
    from i2o_transform_spark.operators.reasoner import owl_chain_entail

    # TWO chain axioms on the SAME property — anc ⊒ parent (seed) and
    # anc ⊒ parent/anc (recursive) — together close parent transitively.
    # Also pins the (sup, head) grouping: one property, two lists.
    edges = [(f"n{i}", "parent", f"n{i + 1}") for i in range(5)]
    rows = _chain_axiom("anc", ["parent"])
    rec = [("r#0", "rdf:first", "parent"), ("r#0", "rdf:rest", "r#1"),
           ("r#1", "rdf:first", "anc"), ("r#1", "rdf:rest", "rdf:nil"),
           ("anc", "owl:propertyChainAxiom", "r#0")]
    t = spark.createDataFrame(rows + rec + edges, TT)
    out = {tuple(r) for r in owl_chain_entail(t, max_rounds=8).collect()}
    anc = {(s, o) for s, p, o in out if p == "anc"}
    assert anc == {(f"n{i}", f"n{j}")
                   for i in range(5) for j in range(i + 1, 6)}


def test_chain_entail_axiom_feeds_axiom_second_round(spark):
    from i2o_transform_spark.operators.reasoner import owl_chain_entail

    t = spark.createDataFrame(
        _chain_axiom("pq", ["p", "q"]) + _chain_axiom("top", ["pq", "r"])
        + [("a", "p", "b"), ("b", "q", "c"), ("c", "r", "d")], TT)
    out = {tuple(r) for r in owl_chain_entail(t).collect()}
    assert ("a", "pq", "c") in out
    assert ("a", "top", "d") in out  # needs the derived pq edge


def test_chain_entail_no_axioms_is_identity(spark):
    from i2o_transform_spark.operators.reasoner import owl_chain_entail

    t = spark.createDataFrame([("a", "p", "b")], TT)
    assert {tuple(r) for r in owl_chain_entail(t).collect()} == {
        ("a", "p", "b")}
