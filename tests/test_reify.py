from __future__ import annotations

from i2o_transform_spark.operators.reify import dereify, reify


def test_reify_shares_statement_across_qualifier_rows(spark):
    a = spark.createDataFrame(
        [
            ("O:1", "contains", "P:9", "17", "1"),
            ("O:1", "contains", "P:9", "3", "2"),   # same statement!
            ("O:2", "contains", "P:9", "5", None),  # null qualifier drops
        ],
        "subj string, pred string, obj string, quantity string, line string",
    )
    out = reify(a, ["quantity", "line"]).collect()
    stmts = {r.subj for r in out}
    assert len(stmts) == 2  # (O:1,P:9) collapses to one statement node
    by_stmt = {}
    for r in out:
        by_stmt.setdefault(r.subj, set()).add((r.pred, r.obj))
    s1 = next(s for s, t in by_stmt.items() if ("rdf:subject", "O:1") in t)
    assert {("quantity", "17"), ("quantity", "3"),
            ("line", "1"), ("line", "2")} <= by_stmt[s1]
    s2 = next(s for s, t in by_stmt.items() if ("rdf:subject", "O:2") in t)
    assert ("line", None) not in by_stmt[s2]
    assert not any(p == "line" for p, _ in by_stmt[s2])


def test_dereify_inverts_and_drops_malformed(spark):
    a = spark.createDataFrame(
        [("O:1", "contains", "P:9", "17")],
        "subj string, pred string, obj string, quantity string",
    )
    stmts = reify(a, ["quantity"])
    got = {(r.subj, r.pred, r.obj) for r in dereify(stmts).collect()}
    assert got == {("O:1", "contains", "P:9")}
    # a statement missing its rdf:object is malformed -> dropped
    broken = stmts.where("pred <> 'rdf:object'")
    assert dereify(broken).count() == 0
