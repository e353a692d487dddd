"""SHACL-lite shape validation over (subj, pred, obj) triples.

A web-scale KG builder needs a *declarative* integrity gate between triple
emission and graph materialization — the KG analogue of the reference's
QA/validation report procedures (MSSQL/OMOPLoader.sql:1996-2097 `omopReport`
orphan/count checks, and the FK discipline its per-table loads rely on).
This module implements the core of W3C SHACL as pure DataFrame algebra:

* ``sh:class`` on the subject  (domain check),
* ``sh:class`` on the object   (range check),
* ``sh:nodeKind``              (IRI vs literal object),
* ``sh:minCount``/``sh:maxCount`` per (focus node, predicate).

Inputs
------
``triples``     (subj, pred, obj, obj_is_iri) — the emitted graph.
``node_types``  (node, type) — possibly several types per node (the KG's
                rdf:type assertions, or derived from id namespaces).
``shapes``      (pred, domain_type, range_type, obj_kind, min_card,
                max_card) — one row per constrained predicate; NULL fields
                are unconstrained.  Vocabulary-sized -> broadcast.

Output: (node, pred, violation, n) where ``violation`` is one of
``domain | range | kind | min_card | max_card`` and ``n`` is the observed
count (triples for cardinality, offending objects for range/kind, and the
actual count — possibly 0 — for min_card).

Scale shape (10^12 triples)
---------------------------
* ``shapes`` joins everywhere as a broadcast hash join (one row per
  constrained predicate — vocabulary-sized by construction).
* the only triples-scale exchange is ONE hash aggregation per check family
  on (subj, pred) — map-side partial combine applies, and all downstream
  joins (against ``node_types``) run on the *aggregated* frame, never on
  the raw triples.
* ``min_card`` is the one check that must scan the target-class nodes
  (nodes with zero assertions are violations too — an anti-join cannot see
  them from the triples side); it costs one additional join keyed on the
  node id, the graph's natural partitioning key, so a co-partitioned
  layout (bucketed by node) makes it exchange-free.
* nothing is ever collected to the driver; output is violation rows only
  (the well-formed 99.99% of the graph never leaves the executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shacl_validate(
    triples: DataFrame,
    node_types: DataFrame,
    shapes: DataFrame,
) -> DataFrame:
    """Validate ``triples`` against ``shapes``; return violation rows.

    See module docstring for the contract.  Column names are fixed
    (``subj/pred/obj/obj_is_iri``, ``node/type``, ``pred/domain_type/
    range_type/obj_kind/min_card/max_card``).
    """
    sh = F.broadcast(shapes)
    t = triples.join(sh, "pred")  # unconstrained predicates drop out

    # ONE triples-scale aggregation: per (subj, pred) assertion count,
    # carrying the (constant-per-pred) shape fields through the groupBy so
    # no re-join is needed afterwards.
    pairs = t.groupBy(
        "subj", "pred", "domain_type", "min_card", "max_card"
    ).agg(F.count(F.lit(1)).alias("n"))

    types = node_types.select("node", "type")

    # domain: subject must carry domain_type.
    dom = (
        pairs.where(F.col("domain_type").isNotNull())
        .join(
            types,
            (F.col("subj") == F.col("node"))
            & (F.col("type") == F.col("domain_type")),
            "left_anti",
        )
        .select("subj", "pred", F.lit("domain").alias("violation"), "n")
    )

    # range: IRI objects must carry range_type.  Aggregate offending
    # objects back to the focus node so output granularity matches.
    robj = t.where(F.col("range_type").isNotNull() & F.col("obj_is_iri"))
    rng = (
        robj.join(
            types,
            (F.col("obj") == F.col("node"))
            & (F.col("type") == F.col("range_type")),
            "left_anti",
        )
        .groupBy("subj", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("subj", "pred", F.lit("range").alias("violation"), "n")
    )

    # nodeKind: obj_is_iri must match obj_kind ('iri' | 'literal').
    kind = (
        t.where(
            F.col("obj_kind").isNotNull()
            & (
                F.col("obj_is_iri")
                != (F.col("obj_kind") == F.lit("iri"))
            )
        )
        .groupBy("subj", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("subj", "pred", F.lit("kind").alias("violation"), "n")
    )

    # maxCount: observed assertion count above the cap.
    maxc = (
        pairs.where(
            F.col("max_card").isNotNull() & (F.col("n") > F.col("max_card"))
        )
        .select("subj", "pred", F.lit("max_card").alias("violation"), "n")
    )

    # minCount: every node of the shape's target class (= domain_type) must
    # have >= min_card assertions — including nodes with ZERO, which only
    # the class side can see.
    min_shapes = sh.where(
        F.col("min_card").isNotNull() & F.col("domain_type").isNotNull()
    ).select("pred", "domain_type", "min_card")
    targets = types.join(
        F.broadcast(min_shapes),
        F.col("type") == F.col("domain_type"),
    ).select(F.col("node").alias("subj"), "pred", "min_card")
    minc = (
        targets.join(
            pairs.select("subj", "pred", "n"), ["subj", "pred"], "left"
        )
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .where(F.col("n") < F.col("min_card"))
        .select("subj", "pred", F.lit("min_card").alias("violation"), "n")
    )

    out = dom.unionByName(rng).unionByName(kind).unionByName(maxc)
    out = out.unionByName(minc)
    return out.select(
        F.col("subj").alias("node"),
        "pred",
        "violation",
        F.col("n").cast("long").alias("n"),
    )
