"""Identity resolution from inverse-functional properties (IFPs).

The web-KG identity story in three composable steps:

1. :func:`detect_ifps` — find predicates that BEHAVE inverse-functionally
   in the data (an object value identifies at most one subject — email,
   ISBN, tax id), reported as integer-ppm statistics rather than assumed
   from a schema, because crawled schemas lie.
2. :func:`ifp_sameas_pairs` — for chosen IFPs, subjects sharing an object
   value are the same entity: emit sameAs edges as a STAR per shared
   value (min subject is the hub), never the quadratic clique.
3. :func:`canonicalize_triples` — close the sameAs edges into components
   (hash-min label propagation) and rewrite every triple onto canonical
   ids — the owl:sameAs smushing step of KG construction.  The
   reference's analogue is its fixed-preference merge/dedup procedures
   (MSSQL/OMOPLoader.sql group-max elections); here identity is DERIVED
   from key evidence instead of hard-coded.

Scale shape (10^12 triples): detection is one (pred, obj) HashAggregate
plus a vocabulary-sized re-aggregation; pair generation aggregates per
(pred, obj) — star edges bound output by fan-in, and a ``max_fanin`` cap
drops pathological shared values (the empty-string email shared by 10^6
pages is NOISE, not identity — exactly the hub-guard the CC operator
wants); canonicalization inherits label_propagation_components' O(log
diameter) rounds, and the rewrite is two broadcast-or-shuffle joins on
the map (components are usually tiny; AQE broadcasts the map when it
fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_ifps(triples: DataFrame) -> DataFrame:
    """Per predicate: how inverse-functional is it in the data?

    Returns (pred, n_objs, fanin1_ppm) — distinct object values and the
    integer-ppm share of them with exactly ONE subject."""
    per_obj = triples.groupBy("pred", "obj").agg(
        F.countDistinct("subj").alias("_fanin")
    )
    return per_obj.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_objs"),
        F.expr(
            "sum(cast(_fanin = 1 as long)) * 1000000 div count(1)"
        ).alias("fanin1_ppm"),
    )


def ifp_sameas_pairs(
    triples: DataFrame,
    ifp_preds: list[str],
    max_fanin: int = 100,
) -> DataFrame:
    """sameAs edges (src, dst) from shared IFP values: per (pred, obj)
    with 2..``max_fanin`` subjects, a star from the min subject to each
    other subject.  Values above ``max_fanin`` are junk keys (empty
    strings, placeholder emails) and are dropped — a fan-in cap, not a
    recall loss, because a value shared by thousands of entities is not
    identifying anything."""
    t = triples.where(F.col("pred").isin(ifp_preds))
    grouped = (
        t.groupBy("pred", "obj")
        .agg(F.collect_set("subj").alias("_subjs"))
        .where(
            (F.size("_subjs") >= 2) & (F.size("_subjs") <= max_fanin)
        )
    )
    return (
        grouped.select(
            F.array_min("_subjs").alias("src"),
            F.explode("_subjs").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def canonicalize_triples(
    triples: DataFrame, sameas: DataFrame
) -> DataFrame:
    """Rewrite subj/obj onto canonical (component-min) ids and dedup —
    owl:sameAs smushing.  ``sameas``: (src, dst) identity edges."""
    from i2o_transform_spark.operators.graph import (
        label_propagation_components,
    )

    comp = label_propagation_components(sameas)
    smap = comp.where(F.col("node") != F.col("root"))
    s_subj = smap.select(F.col("node").alias("subj"),
                         F.col("root").alias("_cs"))
    s_obj = smap.select(F.col("node").alias("obj"),
                        F.col("root").alias("_co"))
    return (
        triples.join(s_subj, "subj", "left")
        .join(s_obj, "obj", "left")
        .select(
            F.coalesce(F.col("_cs"), F.col("subj")).alias("subj"),
            "pred",
            F.coalesce(F.col("_co"), F.col("obj")).alias("obj"),
        )
        .distinct()
    )


def detect_fps(triples: DataFrame) -> DataFrame:
    """Dual of :func:`detect_ifps` — per predicate: how FUNCTIONAL it
    behaves in the data (a subject carries at most one object value —
    birth date, canonical homepage).  Returns (pred, n_subjs,
    fanout1_ppm): distinct subjects and the integer-ppm share with
    exactly ONE object value.  Same scale shape as detection over
    objects: one (pred, subj) HashAggregate + a vocabulary-sized
    rollup."""
    per_subj = triples.groupBy("pred", "subj").agg(
        F.countDistinct("obj").alias("_fanout")
    )
    return per_subj.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_subjs"),
        F.expr(
            "sum(cast(_fanout = 1 as long)) * 1000000 div count(1)"
        ).alias("fanout1_ppm"),
    )


def fp_sameas_pairs(
    triples: DataFrame,
    fp_preds: list[str],
    max_fanout: int = 100,
) -> DataFrame:
    """OWL 2 RL prp-fp as data: for FUNCTIONAL predicates, two object
    values asserted for the SAME subject must name the same entity —
    sameAs edges (src, dst) as a STAR per (pred, subj) group from the
    min object (never the quadratic clique), the object-side mirror of
    :func:`ifp_sameas_pairs`.  Groups above ``max_fanout`` distinct
    objects are dropped as noise (a 'functional' predicate with 500
    values on one subject is a broken extraction, not 500-way
    identity)."""
    t = triples.where(F.col("pred").isin(fp_preds))
    grouped = (
        t.groupBy("pred", "subj")
        .agg(F.collect_set("obj").alias("_objs"))
        .where((F.size("_objs") >= 2) & (F.size("_objs") <= max_fanout))
    )
    return (
        grouped.select(
            F.array_min("_objs").alias("src"),
            F.explode("_objs").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
