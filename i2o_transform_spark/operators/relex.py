"""Distant-supervision relation extraction — the KG population loop.

Given (a) sentences with detected entity-mention PAIRS and the text
between them, and (b) a seed KB of (subj, pred, obj) triples, mine the
textual patterns that EXPRESS each predicate (a sentence whose mention
pair matches a KB pair is a positive example of that pair's predicate —
Mintz et al.'s distant-supervision hypothesis), then apply the
confident patterns back to the corpus to propose NEW triples the KB
does not yet hold.  The sibling of the corpus-statistics extractors
already in the repo (kg_hearst_hypernyms mines IS-A from fixed
lexico-syntactic templates; here the templates themselves are LEARNED
from KB alignment).

Scale shape (10^12 sentences):

* alignment is ONE equi-join of mention pairs against the KB on
  (subj, obj) — the KB is dictionary-sized next to the corpus and
  broadcasts; skewed hot entities fall back to the repo's salted join
  if not.
* pattern statistics are a (pattern, pred) HashAggregate plus a
  pattern-keyed total — integer ppm confidence per the repo rule.
* application is a map-side broadcast join of the corpus against the
  (tiny) confident-pattern table, one (subj, pred, obj) aggregate for
  support counts, and one KB anti-join so only NEW knowledge emerges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["normalize_pattern", "mine_patterns", "apply_patterns"]


def normalize_pattern(col):
    """Lowercase, collapse whitespace runs, trim — the pattern key must
    be spelling-stable across sentences."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def mine_patterns(
    pairs: DataFrame,
    kb: DataFrame,
    min_support: int = 2,
) -> DataFrame:
    """(pattern, pred, n_support, n_pattern, conf_ppm) from KB-aligned
    mention pairs.

    pairs: (subj, obj, between) — one row per detected mention pair.
    kb:    (subj, pred, obj) seed triples.

    n_support counts aligned sentences for (pattern, pred); n_pattern
    counts ALL aligned sentences with that pattern (any pred), so
    conf_ppm = n_support / n_pattern is the pattern's precision against
    the seed KB — an ambiguous pattern expressing two predicates splits
    its ppm.  Patterns below ``min_support`` are dropped (one aligned
    sentence is noise, not evidence)."""
    p = pairs.select(
        "subj", "obj", normalize_pattern(F.col("between")).alias("pattern")
    )
    aligned = p.join(F.broadcast(kb.select("subj", "pred", "obj")),
                     ["subj", "obj"], "inner")
    per = aligned.groupBy("pattern", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_support")
    )
    tot = per.groupBy("pattern").agg(
        F.sum("n_support").cast("long").alias("n_pattern")
    )
    return (
        per.join(tot, "pattern")
        .where(F.col("n_support") >= min_support)
        .select(
            "pattern", "pred", "n_support", "n_pattern",
            F.expr("n_support * 1000000 div n_pattern").alias("conf_ppm"),
        )
    )


def apply_patterns(
    pairs: DataFrame,
    patterns: DataFrame,
    kb: DataFrame,
    min_conf_ppm: int = 500_000,
) -> DataFrame:
    """Propose NEW triples: corpus mention pairs whose between-text
    matches a confident mined pattern, aggregated to (subj, pred, obj,
    n_mentions), minus everything the KB already asserts.  The pattern
    table is mined-vocabulary-sized and broadcasts; the KB anti-join's
    build side is the (small) proposal set."""
    pat = patterns.where(F.col("conf_ppm") >= min_conf_ppm).select(
        "pattern", "pred"
    )
    p = pairs.select(
        "subj", "obj", normalize_pattern(F.col("between")).alias("pattern")
    )
    proposed = (
        p.join(F.broadcast(pat), "pattern", "inner")
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    )
    return proposed.join(
        kb.select("subj", "pred", "obj"), ["subj", "pred", "obj"],
        "left_anti",
    )
