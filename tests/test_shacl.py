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


def test_mine_shapes_statistics(spark):
    from i2o_transform_spark.operators.shacl import mine_shapes

    triples = spark.createDataFrame(
        [
            ("C:1", "inNation", "N:1", True),
            ("C:2", "inNation", "N:1", True),
            ("C:2", "inNation", "N:2", True),   # max_count 2
            ("C:1", "note", "hello", False),
            ("C:2", "note", "N:1", True),       # kind impurity 1/2
        ],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    types = spark.createDataFrame(
        [("C:1", "Customer"), ("C:2", "Customer"), ("C:3", "Customer"),
         ("N:1", "Nation"), ("N:2", "Nation")],
        "node string, type string",
    )
    got = {(r.domain_type, r.pred): r
           for r in mine_shapes(triples, types).collect()}
    inn = got[("Customer", "inNation")]
    assert (inn.n_subjects, inn.support_ppm) == (2, 666666)  # 2 of 3
    assert (inn.min_count, inn.max_count) == (1, 2)
    assert (inn.obj_kind, inn.kind_purity_ppm) == ("iri", 1_000_000)
    assert (inn.range_type, inn.range_purity_ppm) == ("Nation", 1_000_000)
    note = got[("Customer", "note")]
    assert (note.obj_kind, note.kind_purity_ppm) == ("iri", 500_000)
    assert (note.range_type, note.range_purity_ppm) == ("Nation", 1_000_000)


def test_mine_then_validate_loop(spark):
    """Shapes mined from a clean graph, thresholded, catch a later plant."""
    from pyspark.sql import functions as F

    from i2o_transform_spark.operators.shacl import (
        mine_shapes,
        shacl_validate,
    )

    clean = spark.createDataFrame(
        [("C:1", "inNation", "N:1", True), ("C:2", "inNation", "N:2", True)],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    types = spark.createDataFrame(
        [("C:1", "Customer"), ("C:2", "Customer"),
         ("N:1", "Nation"), ("N:2", "Nation"), ("R:1", "Region")],
        "node string, type string",
    )
    mined = mine_shapes(clean, types)
    shapes = mined.where(
        (F.col("support_ppm") == 1_000_000)
        & (F.col("kind_purity_ppm") == 1_000_000)
    ).select(
        "pred", "domain_type", "range_type", "obj_kind",
        F.col("min_count").cast("int").alias("min_card"),
        F.col("max_count").cast("int").alias("max_card"),
    )
    assert shacl_validate(clean, types, shapes).count() == 0
    dirty = clean.unionByName(spark.createDataFrame(
        [("C:1", "inNation", "R:1", True)],   # range violation + maxCount
        "subj string, pred string, obj string, obj_is_iri boolean",
    ))
    got = {(r.node, r.violation) for r in
           shacl_validate(dirty, types, shapes).collect()}
    assert got == {("C:1", "range"), ("C:1", "max_card")}


def test_facets_all_violation_kinds(spark):
    from i2o_transform_spark.operators.shacl import shacl_validate_facets

    t = spark.createDataFrame(
        [("s1", "price", "150", False), ("s2", "price", "abc", False),
         ("s3", "price", "5", False), ("s4", "price", "50", False),
         ("s1", "born", "2020-02-29", False),   # valid leap date
         ("s2", "born", "2021-02-30", False),   # regex ok, calendar bad
         ("s3", "born", "junk", False),
         ("s1", "code", "Clerk#12", False), ("s2", "code", "clerkX", False),
         ("s1", "note", "hi", False),
         ("s2", "note", "this is long enough", False),
         ("s3", "note", "just right", False),
         ("s1", "price", "77", True),           # IRI object: facets skip
         ("s1", "weird", "v", False)],          # unknown datatype: loud
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    facets = spark.createDataFrame(
        [("price", "integer", None, None, None, 10.0, 100.0),
         ("born", "date", None, None, None, None, None),
         ("code", None, "^Clerk#[0-9]+$", None, None, None, None),
         ("note", None, None, 3, 10, None, None),
         ("weird", "nonsense", None, None, None, None, None)],
        "pred string, datatype string, pattern string, min_length int, "
        "max_length int, min_inclusive double, max_inclusive double",
    )
    got = {(r.node, r.pred, r.violation)
           for r in shacl_validate_facets(t, facets).collect()}
    assert got == {
        ("s1", "price", "max_inclusive"),
        # non-numeric: datatype AND both bounds report
        ("s2", "price", "datatype"),
        ("s2", "price", "min_inclusive"), ("s2", "price", "max_inclusive"),
        ("s3", "price", "min_inclusive"),
        ("s2", "born", "datatype"), ("s3", "born", "datatype"),
        ("s2", "code", "pattern"),
        ("s1", "note", "min_length"), ("s2", "note", "max_length"),
        ("s1", "weird", "datatype"),
    }


def test_facets_pattern_is_find_not_fullmatch(spark):
    from i2o_transform_spark.operators.shacl import shacl_validate_facets

    t = spark.createDataFrame(
        [("a", "p", "xx-TAG-yy", False), ("b", "p", "no tag", False)],
        "subj string, pred string, obj string, obj_is_iri boolean",
    )
    facets = spark.createDataFrame(
        [("p", None, "TAG", None, None, None, None)],
        "pred string, datatype string, pattern string, min_length int, "
        "max_length int, min_inclusive double, max_inclusive double",
    )
    got = {(r.node, r.violation)
           for r in shacl_validate_facets(t, facets).collect()}
    assert got == {("b", "pattern")}   # substring find, SHACL semantics
