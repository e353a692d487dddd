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
tokens across 20k names, hottest at 27% df), which is why
`kg_ontology_align` is the slowest row in BENCH — that is the real price
of exactness at that density, not a plan defect.  When the vocabulary is
genuinely that dense, swap candidate generation for minhash-band blocking
(operators/dedup.minhash_lsh_pairs) and measure recall with the
recall-check pattern instead of paying the exact-join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PACK = 1 << 40  # right ids must fit in 40 bits


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
) -> DataFrame:
    """Return (left_id, right_id, method, score_ppm): the elected best
    right concept per left concept — method 'exact' (normalized string
    equality, score 1e6) or 'fuzzy' (token-set Jaccard in ppm)."""
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
    ltoks = lrest.select(
        "left_id", F.explode(F.split("_norm", " ")).alias("tok")
    ).distinct()
    rtoks = rn.select(
        "right_id", F.explode(F.split("_norm", " ")).alias("tok")
    ).distinct()
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
    alpha = F.expr(
        f"cast(ceil((_lsz + _rsz) * {tppm} / (1000000.0 + {tppm})) as int)"
    )
    cand = (
        lpre.join(rpre, "tok")
        .where(
            (F.col("_rsz") * F.lit(1_000_000) >= F.col("_lsz") * F.lit(tppm))
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
        .distinct()
    )
    inter = F.size(F.array_intersect("_la", "_ra"))
    scored = (
        cand.join(lp.select("left_id", F.col("_toks").alias("_la"),
                            F.col("_sz").alias("_lsz")), "left_id")
        .join(rp.select("right_id", F.col("_toks").alias("_ra"),
                        F.col("_sz").alias("_rsz")), "right_id")
        .select(
            "left_id",
            "right_id",
            F.expr(
                "cast(size(array_intersect(_la, _ra)) as long) * 1000000 "
                "div (_lsz + _rsz - size(array_intersect(_la, _ra)))"
            ).alias("score_ppm"),
        )
        .where(F.col("score_ppm") >= threshold_ppm)
    )
    # packed-long election: min (1e6 - score) * 2^40 + right_id
    fuzzy = (
        scored.groupBy("left_id")
        .agg(
            F.min(
                (F.lit(1_000_000) - F.col("score_ppm")) * F.lit(_PACK)
                + F.col("right_id")
            ).alias("_pk")
        )
        .select(
            "left_id",
            (F.col("_pk") % F.lit(_PACK)).alias("right_id"),
            F.lit("fuzzy").alias("method"),
            # integer div — float division would lose precision past 2^53
            (F.lit(1_000_000) - F.expr(f"_pk div {_PACK}"))
            .alias("score_ppm"),
        )
    )
    return exact.unionByName(fuzzy)
