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
