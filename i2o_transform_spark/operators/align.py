"""Ontology alignment: construct a cross-vocabulary concept crosswalk.

The reference CONSUMES its i2b2->OMOP concept crosswalk as a shipped
mapping table (the ontology CSVs + 'Maps to' joins,
MSSQL/OMOPLoader.sql:288-site); building a KG from scratch means BUILDING
that crosswalk: given two concept vocabularies (id, name), emit the best
right-concept for each left-concept with a method and an integer score.

Two passes, mirroring how production aligners (LogMap/AML-style lexical
stages) stage their work:

1. **exact** — normalized-string equality (lowercase, non-alphanumerics
   collapsed to single spaces).  Ties elect the smallest right id.
2. **fuzzy** — token-set Jaccard >= threshold for the still-unmatched
   lefts, with LOSSLESS prefix filtering (AllPairs/PPJoin) for candidate
   generation: tokens are globally ordered rarest-first over the UNION
   document frequencies, each side indexes only its first
   ``|x| - ceil(t*|x|) + 1`` tokens, and any pair with J >= t provably
   shares a prefix token under a common global order.  Verification is
   one ``array_intersect`` per candidate; scores are integer
   parts-per-million (``(i * 1e6) div u``) so cross-engine comparison is
   bit-exact.  Election per left concept packs ``(1e6 - score, right_id)``
   into ONE long — the aggregation stays a map-side-combining
   HashAggregate (UnsafeRow-mutable), never a struct SortAggregate
   (same trick as operators/fuzzy.py; requires right ids < 2^40).

Scale shape (10^8-concept vocabularies): the df count, per-concept
re-aggregation, prefix join, and verify joins are all hash-partitioned
equi-joins — no cartesian anywhere; the hottest (stopword) tokens sort to
the END of every token list under rarest-first order and are never
indexed, which is exactly the skew that kills naive inverted-index joins.
A PPJoin positional filter prunes candidates further (lossless — see the
inline proof sketch at the candidate join).

Cost model, honestly: the prefix join materializes ~Σ_w df_L(w)·df_R(w)
rows over indexed tokens before filtering.  With realistic vocabularies
(thousands of distinct tokens, hottest at ~1% df) that is near-linear;
the repo's sf0.1 bench fixture is ADVERSARIALLY dense (145 distinct
tokens across 20k names, hottest at 27% df).  Three profile-driven
design rules keep even that fixture fast (r04; each backed by a stage
timing in PLANS.md):

* **fingerprint pre-pass** — J=1.0 matches (set-identical names) elect
  through one md5-of-sorted-set equi-join and never enter the token
  index (~half the fuzzy lefts on reordering-heavy vocabularies);
* **no candidate distinct** — duplicate candidate pairs cannot change a
  min-election, and the pair-dedup exchange was the single most
  expensive stage in the r03 profile (57s of 88s);
* **broadcast the posting list when it fits** — a broadcast candidate
  join has NO key-partition skew (probe rows spread evenly), which
  removes the hot-token straggler that dominated the shuffled plan;
  above ``broadcast_threshold_rows`` the shuffle plan returns.

Against a genuinely quadratic fan-out the operator also protects ITSELF
(VERDICT r03 "What's wrong #2"): ``mode="auto"`` estimates the
prefix-join fan-out from the per-token prefix frequencies it already
builds (Σ over indexed tokens of df_L·df_R — the exact row count the
candidate join would materialize) and, above ``max_candidate_pairs``,
switches candidate generation to minhash-band blocking over the SAME
rarest-first token arrays (signature banding per
functions/hashing.minhash_signature).  Verification and election are
identical in both modes — exact integer-ppm Jaccard on every candidate —
so banded mode trades only RECALL (banding is probabilistic), never
precision; measure it with the recall-check companion
(`kg_align_recall_check`), same pattern as dd_minhash_recall_check.
Below the threshold the lossless exact path runs unchanged, so sparse
vocabularies are bit-identical to the always-exact behavior.  The auto
decision is a driver-side scalar (one bounded collect), precedent
operators/joins.plan_salt_buckets.

Measured caveat the default respects (r04, PLANS.md): on the repo's
LOW-CARDINALITY dense fixture, banding is WORSE than the fast exact
path — with only 145 distinct tokens the per-seed global-minimum token
is shared by a large fraction of names, so band buckets concentrate
(the same failure mode as hot prefix tokens) and candidates explode.
Banding wins when token cardinality is high enough that signature
collisions track similarity (realistic web vocabularies); hence
``max_candidate_pairs`` defaults high (200M) so the fallback engages on
true quadratic blowups, not on fixtures the exact path already handles
in seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK = 1 << 40  # right ids must fit in 40 bits


def estimate_prefix_fanout(lpre: DataFrame, rpre: DataFrame) -> int:
    """Exact row count the prefix candidate join would materialize:
    Σ over tokens of (left prefix df) × (right prefix df).  Two small
    per-token aggregations + one scalar — cheap relative to the join it
    sizes, and computed on the SAME prefix frames the exact path indexes,
    so the estimate is the true fan-out, not a proxy."""
    lc = lpre.groupBy("tok").agg(F.count(F.lit(1)).alias("_dl"))
    rc = rpre.groupBy("tok").agg(F.count(F.lit(1)).alias("_dr"))
    row = (
        lc.join(rc, "tok")
        .agg(
            F.coalesce(
                F.sum(F.col("_dl") * F.col("_dr")), F.lit(0)
            ).alias("fanout")
        )
        .collect()[0]
    )
    return int(row["fanout"])


def plan_align_mode(fanout: int, max_candidate_pairs: int) -> str:
    """'exact' (lossless prefix filter) when the measured fan-out fits the
    budget, else 'banded' (minhash-band candidates).  Split out so the
    decision is unit-testable both directions (precedent:
    operators/joins.plan_salt_buckets)."""
    return "banded" if fanout > max_candidate_pairs else "exact"


def normalize_name(col):
    """lowercase; collapse runs of non-alphanumerics to single spaces."""
    return F.trim(
        F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    )


def align_vocabularies(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "concept_id",
    name_col: str = "name",
    threshold_ppm: int = 500_000,
    mode: str = "auto",
    max_candidate_pairs: int = 200_000_000,
    num_hashes: int = 32,
    bands: int = 16,
    broadcast_threshold_rows: int = 2_000_000,
) -> DataFrame:
    """Return (left_id, right_id, method, score_ppm): the elected best
    right concept per left concept — method 'exact' (normalized string
    equality, score 1e6) or 'fuzzy' (token-set Jaccard in ppm).

    ``mode``: 'exact' = lossless prefix-filter candidates always;
    'banded' = minhash-band candidates always; 'auto' (default) measures
    the prefix-join fan-out and switches to 'banded' above
    ``max_candidate_pairs`` (see module docstring).  Precision is exact
    in every mode; only candidate RECALL can drop in 'banded'."""
    ln = left.select(
        F.col(id_col).alias("left_id"),
        normalize_name(F.col(name_col)).alias("_norm"),
    )
    rn = right.select(
        F.col(id_col).alias("right_id"),
        normalize_name(F.col(name_col)).alias("_norm"),
    )

    exact = (
        ln.join(rn, "_norm")
        .groupBy("left_id")
        .agg(F.min("right_id").alias("right_id"))
        .select(
            "left_id",
            "right_id",
            F.lit("exact").alias("method"),
            F.lit(1_000_000).cast("long").alias("score_ppm"),
        )
        # consumed twice (output union + fuzzy-pass anti-join): materialize
        # once instead of re-running the match join
        .localCheckpoint(eager=True)
    )

    # fuzzy pass over the lefts the exact pass missed
    lrest = ln.join(exact.select("left_id"), "left_id", "left_anti")
    ltoks_all = lrest.select(
        "left_id", F.explode(F.split("_norm", " ")).alias("tok")
    ).distinct()
    rtoks = rn.select(
        "right_id", F.explode(F.split("_norm", " ")).alias("tok")
    ).distinct()

    # Token-SET fingerprint pre-pass: J = 1.0 iff the distinct-token sets
    # are equal iff their sorted fingerprints collide, so every left with a
    # set-identical right elects min(right_id) at score 1e6 through ONE
    # equi-join — exactly what the prefix pass would elect (score 1e6 is
    # the packed-long minimum, ties break on right_id), at none of its
    # fan-out.  On vocabularies where a big share of fuzzy matches are
    # reorderings/normalization twins (the common crosswalk case) this
    # removes them from the expensive pass losslessly.
    def _fp(toks, idc):
        return toks.groupBy(idc).agg(
            F.md5(F.concat_ws(" ", F.array_sort(F.collect_set("tok"))))
            .alias("_fp")
        )

    fp_elect = (
        _fp(ltoks_all, "left_id")
        .join(_fp(rtoks, "right_id"), "_fp")
        .groupBy("left_id")
        .agg(F.min("right_id").alias("right_id"))
        .select(
            "left_id",
            "right_id",
            F.lit("fuzzy").alias("method"),
            F.lit(1_000_000).cast("long").alias("score_ppm"),
        )
        .localCheckpoint(eager=True)
    )
    ltoks = ltoks_all.join(
        fp_elect.select("left_id"), "left_id", "left_anti"
    )
    dfreq = (
        ltoks.select("tok")
        .unionAll(rtoks.select("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_c"))
    )

    def _per(toks, idc):
        # rarest-first sorted token array + lossless prefix length
        return (
            toks.join(dfreq, "tok")
            .groupBy(idc)
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_c", "tok"))),
                    lambda x: x["tok"],
                ).alias("_toks")
            )
            .select(
                idc,
                "_toks",
                F.size("_toks").alias("_sz"),
                (
                    F.size("_toks")
                    - F.expr(
                        f"cast(ceil(size(_toks) * {threshold_ppm} / 1000000.0)"
                        " as int)"
                    )
                    + 1
                ).alias("_p"),
            )
        )

    # each side feeds BOTH candidate generation and verification: checkpoint
    # so the df-join + sort-aggregation runs once per side, not twice
    lp = _per(ltoks, "left_id").localCheckpoint(eager=True)
    rp = _per(rtoks, "right_id").localCheckpoint(eager=True)
    # PPJoin-style candidate generation: probe prefix tokens WITH their
    # position and keep a pair only if some shared prefix token still
    # leaves room for the required overlap — 1 + min(|x|-i, |y|-j) >=
    # alpha(|x|,|y|) with alpha = ceil(t/(1+t) * (|x|+|y|)).  Lossless
    # (take the first shared token in global order: every other shared
    # token sits after it on both sides), and it is what kills the
    # quadratic fan-out of merely-warm tokens late in dense prefixes —
    # a pair whose ONLY shared prefix token is a hot token near the
    # prefix end cannot reach the overlap bound and never materializes.
    # The size filter (t*|x| <= |y| <= |x|/t) rides along for free.
    def _prefix(per, idc):
        return per.select(
            idc,
            F.col("_sz"),
            F.posexplode(F.slice("_toks", 1, F.col("_p")))
            .alias("_pos", "tok"),
        )

    lpre = _prefix(lp, "left_id").withColumnsRenamed(
        {"_sz": "_lsz", "_pos": "_lpos"}
    )
    rpre = _prefix(rp, "right_id").withColumnsRenamed(
        {"_sz": "_rsz", "_pos": "_rpos"}
    )
    tppm = threshold_ppm
    if mode == "auto":
        chosen = plan_align_mode(
            estimate_prefix_fanout(lpre, rpre), max_candidate_pairs
        )
    elif mode in ("exact", "banded"):
        chosen = mode
    else:
        raise ValueError(f"unknown align mode: {mode!r}")
    # Bounded planning action (precedent: skew_aware_join): the per-side
    # frames are vocabulary-sized and already materialized (checkpointed),
    # so counting them is free; below the row bound the prefix index and
    # the verify arrays are broadcast — the candidate stream then never
    # shuffles AT ALL (probe rows spread evenly over partitions, so the
    # hot-token skew that straggles a key-partitioned join can't exist)
    # and elections aggregate map-side.  Above the bound (10^8-concept
    # vocabularies) everything falls back to shuffle equi-joins.
    n_lp, n_rp = lp.count(), rp.count()
    can_bcast = max(n_lp, n_rp) <= broadcast_threshold_rows

    def _b(df):
        return F.broadcast(df) if can_bcast else df

    if chosen == "exact":
        alpha = F.expr(
            f"cast(ceil((_lsz + _rsz) * {tppm} / (1000000.0 + {tppm})) as int)"
        )
        # broadcast mode: spread the probe rows evenly first (one tiny
        # exchange of the posting list) so the candidate fan-out — the real
        # work — is balanced across every core regardless of token skew.
        # The partition count MUST be explicit: the probe frame is tiny in
        # BYTES (ids + smallints) while its join OUTPUT is the whole
        # operator's work, so AQE's byte-based advisory coalescing would
        # shrink a bare repartition to a handful of tasks (measured: 3
        # tasks / 50s vs 32 tasks / 4s at sf0.1).
        if can_bcast:
            nparts = 2 * int(
                left.sparkSession.sparkContext.defaultParallelism
            )
            probe = lpre.repartition(nparts, "left_id")
        else:
            probe = lpre
        cand = (
            probe.join(_b(rpre), "tok")
            .where(
                (F.col("_rsz") * F.lit(1_000_000)
                 >= F.col("_lsz") * F.lit(tppm))
                & (F.col("_lsz") * F.lit(1_000_000)
                   >= F.col("_rsz") * F.lit(tppm))
            )
            .where(
                F.lit(1)
                + F.least(
                    F.col("_lsz") - F.col("_lpos") - 1,
                    F.col("_rsz") - F.col("_rpos") - 1,
                )
                >= alpha
            )
            .select("left_id", "right_id")
        )
    else:
        # minhash-band candidates over the SAME token arrays: signature is
        # a pure column expression (no shuffle), banding is one equi-join
        # keyed on band buckets — never all-pairs; the size filter still
        # applies (it is implied by the exact-score threshold at verify).
        from i2o_transform_spark.functions.hashing import (
            minhash_bands,
            minhash_signature,
        )

        rows_per_band = max(1, num_hashes // bands)

        def _banded(per, idc):
            return per.select(
                idc,
                F.explode(
                    minhash_bands(
                        minhash_signature(F.col("_toks"), num_hashes),
                        bands,
                        rows_per_band,
                    )
                ).alias("_bucket"),
            )

        cand = (
            _banded(lp, "left_id")
            .join(_b(_banded(rp, "right_id")), "_bucket")
            .select("left_id", "right_id")
            # band multiplicity is up to `bands` per pair (vs ~1 for the
            # positional prefix filter) — dedup before the verify joins
            .dropDuplicates(["left_id", "right_id"])
        )
    # Verify every candidate with the exact integer-ppm Jaccard.  NO
    # distinct before this in exact mode and no distinct after: duplicate
    # candidate pairs produce duplicate scored rows, and a duplicate can
    # never change a min-election — the r03 profile showed the 25M-pair
    # distinct was the single most expensive exchange in the operator,
    # all of it spent deduplicating rows whose duplicates were harmless.
    scored = (
        cand.join(_b(lp.select("left_id", F.col("_toks").alias("_la"),
                               F.col("_sz").alias("_lsz"))), "left_id")
        .join(_b(rp.select("right_id", F.col("_toks").alias("_ra"),
                           F.col("_sz").alias("_rsz"))), "right_id")
        .withColumn(
            "_i", F.expr("cast(size(array_intersect(_la, _ra)) as long)")
        )
        .select(
            "left_id",
            "right_id",
            F.expr("_i * 1000000 div (_lsz + _rsz - _i)").alias("score_ppm"),
        )
        .where(F.col("score_ppm") >= threshold_ppm)
    )
    # Election. The packed-long trick ((1e6-score)*2^40 + right_id) keeps
    # the aggregation a map-side-combining HashAggregate, but it is only
    # valid for integral right ids in [0, 2^40) — so it is GATED on the id
    # dtype, with an in-expression raise_error on out-of-range values
    # (ADVICE r03: violations previously elected a wrong match silently).
    # Non-integral id types take the min-struct election instead — same
    # semantics, SortAggregate cost.
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    rid_integral = isinstance(
        right.schema[id_col].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )
    if rid_integral:
        rid_guarded = F.when(
            (F.col("right_id") >= 0) & (F.col("right_id") < _PACK),
            F.col("right_id"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("right_id outside packed-election range"
                          " [0, 2^40): "),
                    F.col("right_id").cast("string"),
                )
            )
        )
        fuzzy = (
            scored.groupBy("left_id")
            .agg(
                F.min(
                    (F.lit(1_000_000) - F.col("score_ppm")) * F.lit(_PACK)
                    + rid_guarded
                ).alias("_pk")
            )
            .select(
                "left_id",
                (F.col("_pk") % F.lit(_PACK)).alias("right_id"),
                F.lit("fuzzy").alias("method"),
                # integer div — float division loses precision past 2^53
                (F.lit(1_000_000) - F.expr(f"_pk div {_PACK}"))
                .alias("score_ppm"),
            )
        )
    else:
        fuzzy = (
            scored.groupBy("left_id")
            .agg(
                F.min(
                    F.struct(
                        (F.lit(1_000_000) - F.col("score_ppm"))
                        .alias("_ns"),
                        F.col("right_id").alias("_rid"),
                    )
                ).alias("_pk")
            )
            .select(
                "left_id",
                F.col("_pk._rid").alias("right_id"),
                F.lit("fuzzy").alias("method"),
                (F.lit(1_000_000) - F.col("_pk._ns")).alias("score_ppm"),
            )
        )
    return exact.unionByName(fp_elect).unionByName(fuzzy)
