from __future__ import annotations

from i2o_transform_spark.operators.sameas import (
    canonicalize_triples,
    detect_ifps,
    ifp_sameas_pairs,
)


def _triples(spark):
    return spark.createDataFrame(
        [
            ("a1", "email", "x@y"), ("b1", "email", "x@y"),
            ("c1", "email", "z@y"),
            ("a1", "city", "nyc"), ("b1", "city", "nyc"),
            ("c1", "city", "nyc"),
            ("a1", "knows", "b1"),
        ],
        "subj string, pred string, obj string",
    )


def test_detect_ifps_ppm(spark):
    got = {r.pred: (r.n_objs, r.fanin1_ppm)
           for r in detect_ifps(_triples(spark)).collect()}
    assert got["email"] == (2, 500_000)  # x@y shared, z@y unique
    assert got["city"] == (1, 0)
    assert got["knows"] == (1, 1_000_000)


def test_ifp_pairs_star_and_fanin_cap(spark):
    pairs = {(r.src, r.dst)
             for r in ifp_sameas_pairs(_triples(spark), ["email"]).collect()}
    assert pairs == {("a1", "b1")}
    # city is shared by 3 subjects: fanin cap 2 drops it entirely
    capped = ifp_sameas_pairs(_triples(spark), ["city"], max_fanin=2)
    assert capped.count() == 0


def test_canonicalize_rewrites_subjects_and_objects(spark):
    pairs = ifp_sameas_pairs(_triples(spark), ["email"])
    got = {(r.subj, r.pred, r.obj)
           for r in canonicalize_triples(_triples(spark), pairs).collect()}
    # b1 collapses onto a1 everywhere — including as the OBJECT of knows,
    # which becomes the reflexive (a1, knows, a1)
    assert got == {
        ("a1", "email", "x@y"), ("c1", "email", "z@y"),
        ("a1", "city", "nyc"), ("c1", "city", "nyc"),
        ("a1", "knows", "a1"),
    }


def test_detect_fps_and_fp_pairs(spark):
    from i2o_transform_spark.operators.sameas import (
        detect_fps,
        fp_sameas_pairs,
    )

    rows = [
        ("s1", "bdate", "1990-01-01"),
        ("s1", "bdate", "1990-1-1"),      # alias spelling -> sameAs
        ("s2", "bdate", "1980-05-05"),
        ("s1", "tag", "a"), ("s1", "tag", "b"), ("s1", "tag", "c"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    d = {r["pred"]: r for r in detect_fps(t).collect()}
    assert d["bdate"]["fanout1_ppm"] == 500000  # 1 of 2 subjects clean
    assert d["tag"]["fanout1_ppm"] == 0
    pairs = fp_sameas_pairs(t, ["bdate"]).collect()
    assert [(p["src"], p["dst"]) for p in pairs] == [
        ("1990-01-01", "1990-1-1")
    ]
    # noise cap: a 3-valued group survives only if max_fanout allows
    assert fp_sameas_pairs(t, ["tag"], max_fanout=2).count() == 0
    assert fp_sameas_pairs(t, ["tag"], max_fanout=10).count() == 2
