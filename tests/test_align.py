from __future__ import annotations

from i2o_transform_spark.operators.align import (
    align_vocabularies,
    normalize_name,
)


def test_normalize_name(spark):
    df = spark.createDataFrame([("Brand#22  ACME-Widget!",)], "s string")
    got = df.select(normalize_name("s").alias("n")).collect()[0].n
    assert got == "brand 22 acme widget"


def test_align_exact_fuzzy_and_threshold(spark):
    left = spark.createDataFrame(
        [
            (1, "Small Ring Brand#2 ECONOMY"),   # exact (case-insensitive)
            (2, "red widget deluxe kit"),        # token-reversed on right
            (3, "blue bolt titan grade"),        # 2-of-6-union: below 0.5
            (4, "hot gear"),                     # no candidate at all
        ],
        "concept_id long, name string",
    )
    right = spark.createDataFrame(
        [
            (101, "small ring brand 2 economy"),
            (102, "kit deluxe widget red"),
            (103, "blue bolt steel mesh"),
            (104, "cold plate"),
        ],
        "concept_id long, name string",
    )
    got = {
        r.left_id: (r.right_id, r.method, r.score_ppm)
        for r in align_vocabularies(left, right).collect()
    }
    assert got[1] == (101, "exact", 1_000_000)
    assert got[2] == (102, "fuzzy", 1_000_000)  # same token SET
    # blue bolt vs {steel mesh}: J = 2/6 < 0.5 -> excluded; no row for 3/4
    assert 3 not in got and 4 not in got


def test_align_election_prefers_score_then_min_id(spark):
    left = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "concept_id long, name string"
    )
    right = spark.createDataFrame(
        [
            (300, "alpha beta gamma epsilon"),  # J = 3/5
            (200, "alpha beta gamma delta x"),  # J = 4/5 -> wins on score
            (100, "alpha beta gamma zeta"),     # J = 3/5
        ],
        "concept_id long, name string",
    )
    got = align_vocabularies(left, right).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.right_id, r.method, r.score_ppm) == (200, "fuzzy", 800_000)
    # tie case: two rights at the same score elect the smaller id
    right2 = spark.createDataFrame(
        [(300, "alpha beta gamma epsilon"), (100, "alpha beta gamma zeta")],
        "concept_id long, name string",
    )
    r2 = align_vocabularies(left, right2).collect()[0]
    assert (r2.right_id, r2.score_ppm) == (100, 600_000)


def test_align_prefix_filter_lossless_vs_bruteforce_random(spark):
    """The PPJoin positional+size-filtered candidate generation must find
    EXACTLY the pairs a brute-force all-pairs Jaccard finds — losslessness
    of the whole prefix pipeline on random dense vocabularies (the regime
    where a buggy filter would silently drop pairs)."""
    import random

    rng = random.Random(97)
    vocab = [f"t{i}" for i in range(12)]  # tiny vocab -> dense collisions

    def mk(n, base):
        out = []
        for i in range(n):
            k = rng.randint(2, 6)
            out.append((base + i, " ".join(rng.sample(vocab, k))))
        return out

    for trial in range(3):
        lrows, rrows = mk(25, 1000 * trial), mk(25, 500000 + 1000 * trial)
        left = spark.createDataFrame(lrows, "concept_id long, name string")
        right = spark.createDataFrame(rrows, "concept_id long, name string")
        got = {
            r.left_id: (r.right_id, r.method, r.score_ppm)
            for r in align_vocabularies(left, right).collect()
        }
        # brute force in python
        def toks(s):
            return frozenset(s.split())

        def norm(s):
            return " ".join(s.split())

        want = {}
        rn = [(rid, norm(nm)) for rid, nm in rrows]
        for lid, lnm in lrows:
            exact = sorted(rid for rid, nm in rn if nm == norm(lnm))
            if exact:
                want[lid] = (exact[0], "exact", 1_000_000)
                continue
            best = None
            for rid, nm in rn:
                a, b = toks(lnm), toks(nm)
                i = len(a & b)
                u = len(a | b)
                score = i * 1_000_000 // u
                if score >= 500_000:
                    cand = (-score, rid)
                    if best is None or cand < best:
                        best = cand
            if best is not None:
                want[lid] = (best[1], "fuzzy", -best[0])
        assert got == want, f"trial {trial}"


def test_plan_align_mode_both_directions():
    from i2o_transform_spark.operators.align import plan_align_mode

    assert plan_align_mode(1_000, 20_000_000) == "exact"
    assert plan_align_mode(20_000_000, 20_000_000) == "exact"  # at budget
    assert plan_align_mode(20_000_001, 20_000_000) == "banded"


def test_align_auto_switches_to_banded_and_stays_correct(spark):
    """Force the auto decision both ways on one fixture via
    max_candidate_pairs: a tiny budget must take the banded path and (on
    this small fixture) still elect the identical crosswalk; a large
    budget must take the lossless exact path."""
    left = spark.createDataFrame(
        [(i, f"alpha beta tok{i} delta gamma") for i in range(40)],
        "concept_id long, name string",
    )
    right = spark.createDataFrame(
        [(100 + i, f"gamma delta tok{i} beta omega") for i in range(40)],
        "concept_id long, name string",
    )
    exact = {
        (r.left_id, r.right_id, r.score_ppm)
        for r in align_vocabularies(
            left, right, max_candidate_pairs=10**9
        ).collect()
    }
    banded = {
        (r.left_id, r.right_id, r.score_ppm)
        for r in align_vocabularies(
            left, right, max_candidate_pairs=1
        ).collect()
    }
    assert exact == banded
    assert len(exact) == 40  # tok{i} pairs: J = 4/6 >= 0.5


def test_align_fingerprint_pass_equals_prefix_election(spark):
    """Set-identical (reordered) names elect through the fingerprint
    pre-pass; the result must be what the prefix path would elect —
    min right_id among ALL score-1e6 rights."""
    left = spark.createDataFrame(
        [(1, "red blue green gold")], "concept_id long, name string"
    )
    right = spark.createDataFrame(
        [
            (300, "gold green blue red"),
            (200, "blue red gold green"),   # also J=1.0 -> min id wins
            (100, "red blue green lead"),   # J=0.6, must lose to 1e6
        ],
        "concept_id long, name string",
    )
    r = align_vocabularies(left, right).collect()[0]
    assert (r.right_id, r.method, r.score_ppm) == (200, "fuzzy", 1_000_000)


def test_align_packed_election_guard_and_struct_fallback(spark):
    """ADVICE r03: right ids outside [0, 2^40) must fail LOUDLY on the
    packed-long path, and non-integral id types must silently take the
    min-struct election (same semantics)."""
    import pytest

    left = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "concept_id long, name string"
    )
    bad_right = spark.createDataFrame(
        [(1 << 41, "alpha beta gamma zeta")], "concept_id long, name string"
    )
    with pytest.raises(Exception, match="packed-election range"):
        align_vocabularies(left, bad_right).collect()
    neg_right = spark.createDataFrame(
        [(-5, "alpha beta gamma zeta")], "concept_id long, name string"
    )
    with pytest.raises(Exception, match="packed-election range"):
        align_vocabularies(left, neg_right).collect()
    # string ids: struct election, same winner rules (score then min id)
    sleft = spark.createDataFrame(
        [("L1", "alpha beta gamma delta")], "concept_id string, name string"
    )
    sright = spark.createDataFrame(
        [
            ("R300", "alpha beta gamma epsilon"),
            ("R200", "alpha beta gamma delta x"),
            ("R100", "alpha beta gamma zeta"),
        ],
        "concept_id string, name string",
    )
    r = align_vocabularies(sleft, sright).collect()[0]
    assert (r.right_id, r.score_ppm) == ("R200", 800_000)
