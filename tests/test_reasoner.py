from __future__ import annotations

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
