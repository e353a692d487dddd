"""Incremental BGP view maintenance (operators/viewmaint): delta rules
== recompute, DRed rederivation survival, scope refusals."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from i2o_transform_spark.operators.bgp import bgp_match
from i2o_transform_spark.operators.viewmaint import maintain_bgp_view

T = "subj string, pred string, obj string"
PATTERNS = [("?a", "link", "?b"), ("?b", "link", "?c")]


def rows(df):
    cols = sorted(df.columns)
    return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}


def tri(spark, triples):
    return spark.createDataFrame(triples, T)


def check(spark, base, ins, dels):
    """maintain over (base -> base+ins-dels) must equal full recompute."""
    t_old = tri(spark, base)
    t_new = tri(
        spark, [t for t in base if t not in dels] + list(ins)
    )
    got = maintain_bgp_view(
        bgp_match(t_old, PATTERNS),
        t_new,
        tri(spark, list(ins)),
        tri(spark, list(dels)),
        PATTERNS,
    )
    want = bgp_match(t_new, PATTERNS)
    assert rows(got) == rows(want)
    return rows(got)


def test_insert_only(spark):
    base = [("a", "link", "b"), ("b", "link", "c")]
    got = check(spark, base, [("c", "link", "d"), ("x", "link", "a")], [])
    # new answers use one inserted triple, and also BOTH inserted triples
    assert ("b", "c", "d") in got and ("x", "a", "b") in got


def test_delete_only(spark):
    base = [("a", "link", "b"), ("b", "link", "c"), ("b", "link", "d")]
    got = check(spark, base, [], [("b", "link", "c")])
    assert got == {("a", "b", "d")}


def test_rederivation_survives(spark):
    # (a,b,c) is derivable through the deleted edge AND independently;
    # the 2-hop view on a diamond: a->b, b->c stays because the pair
    # (a->b, b->c) uses no deleted triple — but candidate generation
    # flags every view row touching a deleted triple, so the rederive
    # step must rescue (a,b,c).
    base = [
        ("a", "link", "b"), ("b", "link", "c"),
        ("z", "link", "a"),  # makes (z,a,b) doomed when a->b dies? no:
    ]
    # delete z->a: (z,a,b) is doomed, (a,b,c) must survive untouched
    got = check(spark, base, [], [("z", "link", "a")])
    assert got == {("a", "b", "c")}


def test_mixed_insert_delete_same_batch(spark):
    base = [("a", "link", "b"), ("b", "link", "c"), ("c", "link", "d")]
    got = check(
        spark, base,
        [("d", "link", "e"), ("b", "link", "f")],
        [("b", "link", "c")],
    )
    assert ("c", "d", "e") in got
    assert ("a", "b", "f") in got          # old x new
    assert ("a", "b", "c") not in got      # killed by the delete
    assert ("b", "c", "d") not in got


def test_answer_using_deleted_triple_twice(spark):
    # self-loop: (s,s,s) uses s->s at BOTH positions; deleting it must
    # remove the answer even though each delta chain sees it separately
    base = [("s", "link", "s"), ("s", "link", "t")]
    got = check(spark, base, [], [("s", "link", "s")])
    assert got == set()


def test_disconnected_patterns_refused(spark):
    t = tri(spark, [("a", "link", "b")])
    view = bgp_match(t, [("?a", "link", "?b")]).withColumn(
        "c", F.lit("x")
    ).withColumn("d", F.lit("y"))
    with pytest.raises(ValueError, match="disconnected|variables"):
        maintain_bgp_view(
            view, t, t, t.limit(0),
            [("?a", "link", "?b"), ("?c", "link", "?d")],
        )


def test_view_schema_mismatch_refused(spark):
    t = tri(spark, [("a", "link", "b")])
    with pytest.raises(ValueError, match="view columns"):
        maintain_bgp_view(
            bgp_match(t, [("?a", "link", "?b")]), t, t, t, PATTERNS
        )


def test_path_pattern_refused(spark):
    t = tri(spark, [("a", "link", "b")])
    v = bgp_match(t, [("?a", "link", "?b")])
    with pytest.raises(ValueError, match="plain 3-term"):
        maintain_bgp_view(
            v, t, t, t, [("?a", ("pred", "link"), "?b")]
        )
