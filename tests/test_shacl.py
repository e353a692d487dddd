from __future__ import annotations

from i2o_transform_spark.operators.shacl import shacl_validate


def _shapes(spark):
    return spark.createDataFrame(
        [
            ("locatedIn", "Nation", "Region", "iri", None, None),
            ("inNation", "Customer", "Nation", "iri", None, 1),
            ("hasSegment", "Customer", None, "literal", 1, None),
        ],
        "pred string, domain_type string, range_type string, "
        "obj_kind string, min_card int, max_card int",
    )


def test_shacl_all_violation_kinds(spark):
    triples = spark.createDataFrame(
        [
            # good row: typed Nation subj -> typed Region obj
            ("N:1", "locatedIn", "R:1", True),
            # domain: subject X:9 carries no Nation type
            ("X:9", "locatedIn", "R:1", True),
            # range: object C:1 is a Customer, not a Region
            ("N:2", "locatedIn", "C:1", True),
            # kind: literal object where the shape demands an IRI
            ("N:1", "inNation", "oops", False),
            # max_card: C:1 asserts inNation twice (cap is 1)
            ("C:1", "inNation", "N:1", True),
            ("C:1", "inNation", "N:2", True),
            # C:1 has its required hasSegment; C:2 does NOT (min_card)
            ("C:1", "hasSegment", "BUILDING", False),
            # unconstrained predicate is ignored entirely
            ("C:1", "unconstrained", "zzz", False),
        ],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    types = spark.createDataFrame(
        [
            ("N:1", "Nation"),
            ("N:2", "Nation"),
            ("R:1", "Region"),
            ("C:1", "Customer"),
            ("C:2", "Customer"),
        ],
        "node string, type string",
    )
    got = {
        (r.node, r.pred, r.violation, r.n)
        for r in shacl_validate(triples, types, _shapes(spark)).collect()
    }
    assert got == {
        ("X:9", "locatedIn", "domain", 1),
        ("N:2", "locatedIn", "range", 1),
        # N:1 is not a Customer, so its bogus inNation row is ALSO a
        # domain violation, plus the literal-object kind violation.
        ("N:1", "inNation", "domain", 1),
        ("N:1", "inNation", "kind", 1),
        ("C:1", "inNation", "max_card", 2),
        ("C:2", "hasSegment", "min_card", 0),
    }


def test_shacl_clean_graph_is_empty(spark):
    triples = spark.createDataFrame(
        [
            ("N:1", "locatedIn", "R:1", True),
            ("C:1", "inNation", "N:1", True),
            ("C:1", "hasSegment", "AUTO", False),
        ],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    types = spark.createDataFrame(
        [("N:1", "Nation"), ("R:1", "Region"), ("C:1", "Customer")],
        "node string, type string",
    )
    assert shacl_validate(triples, types, _shapes(spark)).count() == 0


def test_shacl_multi_typed_node_satisfies_either_class(spark):
    # a node typed both Nation and Region satisfies either constraint
    triples = spark.createDataFrame(
        [("N:1", "locatedIn", "N:1", True)],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    types = spark.createDataFrame(
        [("N:1", "Nation"), ("N:1", "Region")], "node string, type string"
    )
    shapes = _shapes(spark).where("pred = 'locatedIn'")
    assert shacl_validate(triples, types, shapes).count() == 0
