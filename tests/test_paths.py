from __future__ import annotations

import pytest

from i2o_transform_spark.operators.paths import eval_path


def _triples(spark):
    return spark.createDataFrame(
        [
            ("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
            ("a", "q", "x"), ("x", "q", "a"),
            ("b", "r", "x"),
        ],
        "subj string, pred string, obj string",
    )


def _pairs(df):
    return {(r.src, r.dst) for r in df.collect()}


def test_path_pred_seq_inv(spark):
    t = _triples(spark)
    assert _pairs(eval_path(t, ("pred", "p"))) == {
        ("a", "b"), ("b", "c"), ("c", "d")
    }
    assert _pairs(eval_path(t, ("seq", ("pred", "p"), ("pred", "r")))) == {
        ("a", "x")
    }
    assert _pairs(eval_path(t, ("inv", ("pred", "r")))) == {("x", "b")}


def test_path_alt_dedups(spark):
    t = _triples(spark)
    got = _pairs(eval_path(t, ("alt", ("pred", "p"), ("pred", "p"))))
    assert got == {("a", "b"), ("b", "c"), ("c", "d")}


def test_path_plus_and_star(spark):
    t = _triples(spark)
    plus = _pairs(eval_path(t, ("plus", ("pred", "p"))))
    assert plus == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    }
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("z",)], "node string"
    )
    star = _pairs(eval_path(t, ("star", ("pred", "p")), nodes=nodes))
    # plus pairs + identity over the node universe (including edgeless z)
    assert star == plus | {(n, n) for n in "abcdz"}


def test_path_plus_on_cycle_is_bounded(spark):
    t = _triples(spark)
    # q forms the 2-cycle a->x->a: set semantics must yield exactly the
    # 4 reachability pairs, not loop forever
    got = _pairs(eval_path(t, ("plus", ("pred", "q"))))
    assert got == {("a", "x"), ("x", "a"), ("a", "a"), ("x", "x")}


def test_star_without_nodes_raises(spark):
    with pytest.raises(ValueError):
        eval_path(_triples(spark), ("star", ("pred", "p")))


def test_path_negated_property_set(spark):
    t = _triples(spark)
    got = _pairs(eval_path(t, ("npred", ["p", "q"])))
    assert got == {("b", "x")}  # only the r edge survives
    got2 = _pairs(eval_path(t, ("seq", ("pred", "p"), ("npred", ["p"]))))
    # p then not-p: b -r-> x after a -p-> b; c,d have no non-p out-edges
    assert got2 == {("a", "x")}


def test_path_cycle_early_fixpoint_and_max_depth(spark):
    """ADVICE r03: on cyclic graphs the pairs-only fixpoint must terminate
    EARLY (pair-count signature stabilizes — no level signature to chase),
    and the threaded max_depth must be honored: a 10-node directed cycle
    reaches everything under the default bound, but max_depth=2 truncates
    reach to 2 hops."""
    n = 10
    rows = [(f"n{i}", "p", f"n{(i + 1) % n}") for i in range(n)]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    full = _pairs(eval_path(t, ("plus", ("pred", "p"))))
    assert full == {(f"n{i}", f"n{j}") for i in range(n) for j in range(n)}
    capped = _pairs(eval_path(t, ("plus", ("pred", "p")), max_depth=2))
    assert capped == {
        (f"n{i}", f"n{(i + d) % n}") for i in range(n) for d in (1, 2)
    }


def test_zero_or_one_path(spark):
    from i2o_transform_spark.operators.paths import eval_path

    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")], "subj string, pred string, obj string"
    )
    nodes = spark.createDataFrame([("a",), ("b",), ("c",), ("d",)], "n string")
    got = {(r.src, r.dst) for r in
           eval_path(t, ("opt", ("pred", "p")), nodes=nodes).collect()}
    assert got == {("a", "a"), ("b", "b"), ("c", "c"), ("d", "d"),
                   ("a", "b"), ("b", "c")}
    # opt without the node universe is refused, like star
    import pytest
    with pytest.raises(ValueError, match="node universe"):
        eval_path(t, ("opt", ("pred", "p")))
