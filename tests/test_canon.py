"""Blank-node canonicalization (operators/canon): relabel invariance,
structural sensitivity, orbit counting, refinement depth."""

from __future__ import annotations

import pytest

from i2o_transform_spark.operators.canon import (
    bnode_colors,
    canonical_graph_hashes,
)

Q = "subj string, pred string, obj string, graph string"


def _hashes(spark, rows, rounds=3):
    df = canonical_graph_hashes(
        spark.createDataFrame(rows, Q), rounds=rounds
    )
    return {r.graph: r for r in df.collect()}


def test_relabel_invariance_and_structure_sensitivity(spark):
    base = [
        ("_:x", "about", "O:1", "g1"), ("_:x", "prio", "HIGH", "g1"),
        ("_:x", "meta", "_:y", "g1"), ("_:y", "src", "crawl", "g1"),
    ]
    relabeled = [
        (s.replace("_:x", "_:zz").replace("_:y", "_:q"),
         p,
         o.replace("_:x", "_:zz").replace("_:y", "_:q"),
         "g2")
        for (s, p, o, _) in base
    ]
    mutated = [
        (s, "status" if p == "prio" else p, o, "g3")
        for (s, p, o, _) in base
    ]
    got = _hashes(spark, base + relabeled + mutated)
    assert got["g1"].canon_hash == got["g2"].canon_hash
    assert got["g1"].canon_hash != got["g3"].canon_hash
    assert got["g1"].n_bnodes == 2 and got["g1"].n_colors == 2


def test_automorphic_bnodes_share_a_color(spark):
    rows = [
        ("E:1", "has", "_:l1", "g"), ("E:1", "has", "_:l2", "g"),
        ("_:l1", "v", "same", "g"), ("_:l2", "v", "same", "g"),
    ]
    got = _hashes(spark, rows)
    assert got["g"].n_bnodes == 2 and got["g"].n_colors == 1


def test_chain_separation_needs_depth(spark):
    # _:a1 -> _:b1 -> "X"   vs   _:a2 -> _:b2 -> "Y"
    # round 1 separates b1/b2 (ground evidence); a1/a2 separate only at
    # round 2, once their neighbors' colors differ.
    rows = [
        ("_:a1", "n", "_:b1", "g"), ("_:b1", "v", "X", "g"),
        ("_:a2", "n", "_:b2", "g"), ("_:b2", "v", "Y", "g"),
    ]
    df1 = bnode_colors(
        spark.createDataFrame(rows, Q), rounds=1, graph_col="graph"
    )
    c1 = {r.node: r.color for r in df1.collect()}
    assert c1["_:a1"] == c1["_:a2"] and c1["_:b1"] != c1["_:b2"]
    df2 = bnode_colors(
        spark.createDataFrame(rows, Q), rounds=2, graph_col="graph"
    )
    c2 = {r.node: r.color for r in df2.collect()}
    assert c2["_:a1"] != c2["_:a2"]


def test_graph_scoped_bnode_ids(spark):
    # the SAME label _:x names different structures in g1/g2 — per-graph
    # scoping must keep them apart
    rows = [
        ("_:x", "v", "A", "g1"),
        ("_:x", "v", "B", "g2"),
    ]
    got = _hashes(spark, rows)
    assert got["g1"].canon_hash != got["g2"].canon_hash


def test_ground_only_graph(spark):
    rows = [("s", "p", "o", "g")]
    got = _hashes(spark, rows)
    assert got["g"].n_bnodes == 0 and got["g"].n_colors == 0
    assert got["g"].n_triples == 1


def test_modular_sum_survives_many_triples(spark):
    # ANSI overflow guard: the per-graph sum runs in decimal(38,0); a few
    # thousand near-2^61 terms would overflow a bigint sum ~1000x over
    rows = [(f"s{i}", "p", f"o{i}", "g") for i in range(5000)]
    got = _hashes(spark, rows)
    assert 0 <= got["g"].canon_hash < (1 << 61) - 1


def test_auto_rounds_refines_deep_chain(spark):
    # 5-deep bnode chain ending in distinguishing ground terms: fixed
    # rounds=2 under-refines the chain heads; auto converges past them
    def chain(tag, leaf):
        return (
            [(f"_:{tag}{i}", "n", f"_:{tag}{i + 1}", "g") for i in range(4)]
            + [(f"_:{tag}4", "v", leaf, "g")]
        )

    rows = chain("a", "X") + chain("b", "Y")
    df = spark.createDataFrame(rows, Q)
    c2 = {r.node: r.color
          for r in bnode_colors(df, rounds=2, graph_col="graph").collect()}
    assert c2["_:a0"] == c2["_:b0"]          # under-refined at depth 2
    ca = {r.node: r.color
          for r in bnode_colors(df, rounds="auto",
                                graph_col="graph").collect()}
    assert ca["_:a0"] != ca["_:b0"]          # auto reached the fixpoint
    # every chain position separated
    assert all(ca[f"_:a{i}"] != ca[f"_:b{i}"] for i in range(5))


def test_skolemize_strict_guard_and_ordinal_fallback(spark):
    import pytest as _pytest

    from i2o_transform_spark.operators.canon import skolemize

    # two 1-WL-indistinguishable bnodes (a symmetric pair with identical
    # ground context): strict must refuse, ordinal mode must separate
    t = spark.createDataFrame(
        [("_:x", "p", "v"), ("_:y", "p", "v")],
        "subj string, pred string, obj string",
    )
    with _pytest.raises(Exception):
        skolemize(t).collect()
    out = skolemize(t, strict=False).collect()
    subs = sorted({r["subj"] for r in out})
    assert len(subs) == 2
    assert subs[0].startswith("https://ex.org/.well-known/genid/")
    assert subs[1] == subs[0] + "-1"  # deterministic ordinal suffix


def test_skolemize_rewrites_object_position_and_keeps_ground(spark):
    from i2o_transform_spark.operators.canon import skolemize

    t = spark.createDataFrame(
        [
            ("_:a", "knows", "_:b"),
            ("_:a", "name", "alice"),
            ("_:b", "name", "bob"),
            ("http://e/1", "likes", "_:b"),
        ],
        "subj string, pred string, obj string",
    )
    out = skolemize(t, base="https://k/")
    rows = sorted(map(tuple, out.collect()))
    assert all(not s.startswith("_:") and not o.startswith("_:")
               for (s, _p, o) in rows)
    # ground terms untouched
    assert any(s == "http://e/1" for (s, _p, _o) in rows)
    assert any(o == "alice" for (_s, _p, o) in rows)
    # the chain edge points at the SAME skolem IRI bob's triples use
    bob = [s for (s, p, _o) in rows if p == "name" and _o == "bob"][0] \
        if False else [s for (s, p, o) in rows if p == "name" and o == "bob"][0]
    assert ("https://k/" in bob) and any(
        o == bob for (_s, p, o) in rows if p in ("knows", "likes")
    )
