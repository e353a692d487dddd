from __future__ import annotations

import pytest

from i2o_transform_spark.operators.reasoner import rdfs_entail


def _schema(spark):
    subclass = spark.createDataFrame(
        [("Dog", "Mammal"), ("Mammal", "Animal")], "sub string, sup string"
    )
    subprop = spark.createDataFrame(
        [("hasPet", "keeps")], "sub string, sup string"
    )
    domains = spark.createDataFrame(
        [("hasPet", "Person")], "pred string, cls string"
    )
    ranges = spark.createDataFrame(
        [("hasPet", "Animal")], "pred string, cls string"
    )
    return subclass, subprop, domains, ranges


def test_rdfs_all_rules_fire(spark):
    triples = spark.createDataFrame(
        [("alice", "hasPet", "rex"), ("rex", "type", "Dog")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_entail(triples, *_schema(spark)).collect()
    }
    assert got == {
        # rdfs7: property lift
        ("alice", "hasPet", "rex"), ("alice", "keeps", "rex"),
        # rdfs2/3 on the ORIGINAL predicate only (domain/range of hasPet)
        ("alice", "type", "Person"),
        # rdfs3 + rdfs9: rex is Animal via range AND via Dog < Mammal < Animal
        ("rex", "type", "Animal"),
        ("rex", "type", "Dog"), ("rex", "type", "Mammal"),
    }


def test_rdfs_untouched_predicates_pass_through(spark):
    triples = spark.createDataFrame(
        [("a", "unrelated", "b")], "subj string, pred string, obj string"
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_entail(triples, *_schema(spark)).collect()
    }
    assert got == {("a", "unrelated", "b")}


def test_rdfs_entailment_is_idempotent(spark):
    triples = spark.createDataFrame(
        [("alice", "hasPet", "rex"), ("rex", "type", "Dog")],
        "subj string, pred string, obj string",
    )
    once = rdfs_entail(triples, *_schema(spark))
    twice = rdfs_entail(once, *_schema(spark))
    a = {(r.subj, r.pred, r.obj) for r in once.collect()}
    b = {(r.subj, r.pred, r.obj) for r in twice.collect()}
    assert a == b  # the stratified pass IS the fixpoint


def test_rdfs_cyclic_schema_terminates(spark):
    # mutually-equivalent classes (A <: B, B <: A) are legal RDFS; the
    # driver-side BFS closure terminates and entails both directions
    triples = spark.createDataFrame(
        [("x", "type", "A")], "subj string, pred string, obj string"
    )
    subclass = spark.createDataFrame(
        [("A", "B"), ("B", "A")], "sub string, sup string"
    )
    empty = spark.createDataFrame([], "sub string, sup string")
    emptydr = spark.createDataFrame([], "pred string, cls string")
    got = {
        (r.subj, r.pred, r.obj)
        for r in rdfs_entail(triples, subclass, empty, emptydr,
                             emptydr).collect()
    }
    assert got == {("x", "type", "A"), ("x", "type", "B")}


def test_schema_closure_bound_is_loud(spark, monkeypatch):
    from i2o_transform_spark.operators import reasoner

    monkeypatch.setattr(reasoner, "MAX_SCHEMA_EDGES", 2)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "sub string, sup string"
    )
    with pytest.raises(ValueError, match="MAX_SCHEMA_EDGES"):
        reasoner._reflexive_closure(edges, "sub", "sup")


def _spo(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


def test_rdfs_delta_equals_full_recompute(spark):
    from i2o_transform_spark.operators.reasoner import rdfs_entail_delta

    schema = _schema(spark)
    base = spark.createDataFrame(
        [("alice", "hasPet", "rex"), ("bob", "type", "Dog")],
        "subj string, pred string, obj string",
    )
    delta = spark.createDataFrame(
        [("carol", "hasPet", "fido"), ("rex", "type", "Dog"),
         ("alice", "hasPet", "rex")],  # one delta row already known
        "subj string, pred string, obj string",
    )
    m = rdfs_entail(base, *schema)
    inc = rdfs_entail_delta(m, delta, *schema)
    assert _spo(m) | _spo(inc) == _spo(
        rdfs_entail(base.unionByName(delta), *schema)
    )
    # increment is disjoint from the materialization
    assert not (_spo(inc) & _spo(m))
    # empty delta -> empty increment
    empty = spark.createDataFrame([], "subj string, pred string, obj string")
    assert rdfs_entail_delta(m, empty, *schema).count() == 0


def test_rdfs_schema_delta_equals_full_recompute(spark):
    from i2o_transform_spark.operators.reasoner import (
        rdfs_entail_schema_delta,
    )

    subclass, subprop, domains, ranges = _schema(spark)
    inst = spark.createDataFrame(
        [("alice", "hasPet", "rex"), ("rex", "type", "Dog"),
         ("x", "unrelated", "y")],
        "subj string, pred string, obj string",
    )
    # old schema: drop one subclass edge, one domain row
    old_subclass = subclass.where("sub <> 'Mammal'")
    old_domains = domains.limit(0)
    m = rdfs_entail(inst, old_subclass, subprop, old_domains, ranges)
    inc = rdfs_entail_schema_delta(
        m, old_subclass, subprop, old_domains, ranges,
        subclass, subprop, domains, ranges,
    )
    assert _spo(m) | _spo(inc) == _spo(rdfs_entail(inst, subclass, subprop,
                                                   domains, ranges))
    assert not (_spo(inc) & _spo(m))
    # unchanged schema -> empty increment (affected slice is empty)
    none = rdfs_entail_schema_delta(
        m, old_subclass, subprop, old_domains, ranges,
        old_subclass, subprop, old_domains, ranges,
    )
    assert none.count() == 0
