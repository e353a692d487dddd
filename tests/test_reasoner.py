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


def test_owl_inverse_and_canonicalization(spark):
    from i2o_transform_spark.operators.reasoner import owl_property_entail

    # input carries BOTH orientations: one partOf edge and one hasPart edge
    t = spark.createDataFrame(
        [("a", "partOf", "b"), ("c", "hasPart", "d")],
        "subj string, pred string, obj string",
    )
    inv = spark.createDataFrame(
        [("partOf", "hasPart")], "p string, q string"
    )
    got = _spo(owl_property_entail(t, inverse_of=inv))
    assert got == {
        ("a", "partOf", "b"), ("b", "hasPart", "a"),
        ("c", "hasPart", "d"), ("d", "partOf", "c"),
    }


def test_owl_symmetric_and_self_inverse(spark):
    from i2o_transform_spark.operators.reasoner import owl_property_entail

    t = spark.createDataFrame(
        [("a", "adj", "b")], "subj string, pred string, obj string"
    )
    sym = spark.createDataFrame([("adj",)], "pred string")
    self_inv = spark.createDataFrame([("adj", "adj")], "p string, q string")
    expect = {("a", "adj", "b"), ("b", "adj", "a")}
    assert _spo(owl_property_entail(t, symmetric=sym)) == expect
    assert _spo(owl_property_entail(t, inverse_of=self_inv)) == expect


def test_owl_transitive_chain_and_cycle(spark):
    from i2o_transform_spark.operators.reasoner import owl_property_entail

    chain = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
         ("x", "q", "y")],
        "subj string, pred string, obj string",
    )
    tr = spark.createDataFrame([("p",)], "pred string")
    got = _spo(owl_property_entail(chain, transitive=tr))
    assert got == {
        ("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
        ("a", "p", "c"), ("b", "p", "d"), ("a", "p", "d"),
        ("x", "q", "y"),  # non-transitive predicate untouched
    }
    # cycle terminates (count fixpoint), including self-pairs via the loop
    cyc = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "a")],
        "subj string, pred string, obj string",
    )
    got2 = _spo(owl_property_entail(cyc, transitive=tr))
    assert got2 == {
        ("a", "p", "b"), ("b", "p", "a"), ("a", "p", "a"), ("b", "p", "b"),
    }


def test_owl_symmetric_transitive_and_inherited(spark):
    from i2o_transform_spark.operators.reasoner import owl_property_entail

    # connectedTo symmetric + transitive: undirected reachability
    t = spark.createDataFrame(
        [("a", "conn", "b"), ("c", "conn", "b")],
        "subj string, pred string, obj string",
    )
    sym = spark.createDataFrame([("conn",)], "pred string")
    tr = spark.createDataFrame([("conn",)], "pred string")
    got = _spo(owl_property_entail(t, symmetric=sym, transitive=tr))
    nodes = {"a", "b", "c"}
    assert got == {(x, "conn", y) for x in nodes for y in nodes}
    # transitivity inherited across an inverse pair: above declared on
    # 'above' only, edges arrive through the inverse name 'below'
    t2 = spark.createDataFrame(
        [("x", "below", "y"), ("y", "below", "z")],
        "subj string, pred string, obj string",
    )
    inv = spark.createDataFrame([("above", "below")], "p string, q string")
    tr2 = spark.createDataFrame([("above",)], "pred string")
    got2 = _spo(owl_property_entail(t2, inverse_of=inv, transitive=tr2))
    assert ("x", "below", "z") in got2 and ("z", "above", "x") in got2


def test_owl_double_inverse_is_loud(spark):
    from i2o_transform_spark.operators.reasoner import owl_property_entail

    t = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    inv = spark.createDataFrame(
        [("p", "q"), ("p", "r")], "p string, q string"
    )
    with pytest.raises(ValueError, match="two inverses"):
        owl_property_entail(t, inverse_of=inv).collect()


def test_stream_entailment_replay_is_idempotent(spark, tmp_path):
    # a replayed (at-least-once) micro-batch appends ZERO rows: the
    # increment is anti-joined against the store that already holds it
    import glob
    import os

    from i2o_transform_spark.streaming.kg_stream import (
        stream_entailment_maintenance,
    )

    schema = _schema(spark)
    base = spark.createDataFrame(
        [("alice", "hasPet", "rex")], "subj string, pred string, obj string"
    )
    delta = spark.createDataFrame(
        [("rex", "type", "Dog")], "subj string, pred string, obj string"
    )
    src = tmp_path / "triples"
    base.coalesce(1).write.parquet(str(src / "b0.parquet"))
    delta.coalesce(1).write.parquet(str(src / "b1.parquet"))
    store = str(tmp_path / "store")

    def run(ckpt: str):
        stream = (
            spark.readStream
            .schema("subj string, pred string, obj string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src) + "/*/")
        )
        q = stream_entailment_maintenance(
            stream, store, str(tmp_path / ckpt), *schema
        )
        q.awaitTermination(300)

    run("ckpt1")
    full = rdfs_entail(base.unionByName(delta), *schema)
    got = spark.read.parquet(store)
    assert _spo(got) == _spo(full)
    n_files = len(glob.glob(os.path.join(store, "*.parquet")))
    # REPLAY everything with a fresh checkpoint (simulates lost offsets —
    # the worst at-least-once case): store content must not change
    run("ckpt2")
    got2 = spark.read.parquet(store)
    assert _spo(got2) == _spo(full)
    assert got2.count() == got.count()  # no duplicate rows appended
    assert len(glob.glob(os.path.join(store, "*.parquet"))) >= n_files


def _retract_env(spark):
    from i2o_transform_spark.operators.reasoner import (
        rdfs_entail,
        rdfs_retract_delta,
    )

    subprop = spark.createDataFrame([("p", "q")], "sub string, sup string")
    subclass = spark.createDataFrame([("A", "B")], "sub string, sup string")
    domains = spark.createDataFrame([("q", "A")], "pred string, cls string")
    ranges = spark.createDataFrame([("q", "R")], "pred string, cls string")
    schema = (subclass, subprop, domains, ranges)

    def maintained(base_rows, delete_rows):
        base = spark.createDataFrame(
            base_rows, "subj string, pred string, obj string")
        delete = spark.createDataFrame(
            delete_rows, "subj string, pred string, obj string") \
            if delete_rows else base.limit(0)
        m = rdfs_entail(base, *schema)
        rem = rdfs_retract_delta(base, delete, *schema)
        got = m.join(rem, ["subj", "pred", "obj"], "left_anti")
        spo = ["subj", "pred", "obj"]
        remaining = base.join(delete.select(*spo), spo, "left_anti")
        want = rdfs_entail(remaining, *schema)
        return (sorted(map(tuple, got.collect())),
                sorted(map(tuple, want.collect())))

    return maintained


def test_retract_equals_recompute_shared_object(spark):
    maintained = _retract_env(spark)
    # two edges share the object o1: deleting ONE must keep o1's range
    # type alive via the survivor
    base = [("s1", "p", "o1"), ("s2", "p", "o1"), ("s1", "type", "A")]
    got, want = maintained(base, [("s1", "p", "o1")])
    assert got == want
    assert ("o1", "type", "R") in got          # rederived from s2's edge
    assert ("s1", "type", "B") in got          # rederived from type A
    assert ("s1", "q", "o1") not in got        # lift of deleted edge gone


def test_retract_everything_and_nothing(spark):
    maintained = _retract_env(spark)
    base = [("s1", "p", "o1"), ("s1", "type", "A")]
    got, want = maintained(base, base)
    assert got == want == []
    got2, want2 = maintained(base, [])
    assert got2 == want2 and len(got2) > 0


def test_retract_nonschema_pred_identity(spark):
    maintained = _retract_env(spark)
    base = [("s1", "zz", "o1"), ("s2", "zz", "o1")]
    got, want = maintained(base, [("s1", "zz", "o1")])
    assert got == want == [("s2", "zz", "o1")]


def test_retract_pred_lifting_into_type(spark):
    from i2o_transform_spark.operators.reasoner import (
        rdfs_entail,
        rdfs_retract_delta,
    )

    # legal rho-DF: a predicate that is a subproperty of rdf:type —
    # (s, isa, A) lifts to (s, type, A) then the class closure
    subprop = spark.createDataFrame([("isa", "type")],
                                    "sub string, sup string")
    subclass = spark.createDataFrame([("A", "B")], "sub string, sup string")
    empty = spark.createDataFrame([], "pred string, cls string")
    schema = (subclass, subprop, empty, empty)
    base = spark.createDataFrame(
        [("s1", "type", "A"), ("s1", "isa", "A")],
        "subj string, pred string, obj string")
    delete = base.where("pred = 'type'")
    m = rdfs_entail(base, *schema)
    rem = rdfs_retract_delta(base, delete, *schema)
    got = sorted(map(tuple, m.join(
        rem, ["subj", "pred", "obj"], "left_anti").collect()))
    # (s1,type,A) and (s1,type,B) both survive via the isa assertion
    assert ("s1", "type", "B") in got and ("s1", "type", "A") in got
