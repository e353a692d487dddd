"""SHACL-lite shape validation over (subj, pred, obj) triples.

A web-scale KG builder needs a *declarative* integrity gate between triple
emission and graph materialization — the KG analogue of the reference's
QA/validation report procedures (MSSQL/OMOPLoader.sql:1996-2097 `omopReport`
orphan/count checks, and the FK discipline its per-table loads rely on).
This module implements the core of W3C SHACL as pure DataFrame algebra:

* ``sh:class`` on the subject  (domain check),
* ``sh:class`` on the object   (range check),
* ``sh:nodeKind``              (IRI vs literal object),
* ``sh:minCount``/``sh:maxCount`` per (focus node, predicate),
* ``sh:in``                    (object in an enumerated allowed set,
                                the RDF-collection-encoded constraint —
                                see ``in_values`` on shacl_validate),
* literal value facets (:func:`shacl_validate_facets`): ``sh:datatype``
  (lexical-form validation of the plain-string store), ``sh:pattern``,
  ``sh:minLength``/``sh:maxLength``, ``sh:minInclusive``/
  ``sh:maxInclusive``.

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
    in_values: DataFrame | None = None,
) -> DataFrame:
    """Validate ``triples`` against ``shapes``; return violation rows.

    See module docstring for the contract.  Column names are fixed
    (``subj/pred/obj/obj_is_iri``, ``node/type``, ``pred/domain_type/
    range_type/obj_kind/min_card/max_card``).

    ``in_values`` adds ``sh:in`` (value enumeration): a (pred, allowed)
    frame — real shapes graphs encode it as an RDF collection, so the
    caller typically derives it with
    ``operators/rdflist.unroll_collections`` and joins members to the
    shape's list head.  Every assertion on an enumerated predicate whose
    object is not in the allowed set is a ``violation = 'in'`` row;
    the allowed set is shape-sized and joins as a broadcast anti-join
    on (pred, obj), aggregated to the focus node like range/kind.
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
    if in_values is not None:
        allowed = in_values.select(
            "pred", F.col("allowed").alias("obj")
        )
        enum_preds = F.broadcast(allowed.select("pred").distinct())
        inv = (
            triples.join(enum_preds, "pred", "left_semi")
            .join(F.broadcast(allowed), ["pred", "obj"], "left_anti")
            .groupBy("subj", "pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("subj", "pred", F.lit("in").alias("violation"), "n")
        )
        out = out.unionByName(inv)
    return out.select(
        F.col("subj").alias("node"),
        "pred",
        "violation",
        F.col("n").cast("long").alias("n"),
    )


# sh:datatype lexical-form tests over the plain-string object column.
# Each is a pure JVM expression on `obj`; `date` additionally try-casts so
# calendar-invalid strings (2021-02-30) fail like the XSD value space says.
_DATATYPE_OK = {
    "integer": "obj RLIKE '^[+-]?[0-9]+$'",
    "decimal": r"obj RLIKE '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$'",
    "date": (
        r"obj RLIKE '^[0-9]{4}-[0-9]{2}-[0-9]{2}$' "
        "AND try_cast(obj AS date) IS NOT NULL"
    ),
    "boolean": "obj IN ('true', 'false', '0', '1')",
    "string": "true",
}


def shacl_validate_facets(triples: DataFrame, facets: DataFrame) -> DataFrame:
    """SHACL literal value facets: validate LITERAL objects against
    per-predicate constraints.  ``facets`` has one row per constrained
    predicate with NULL = unconstrained:

    * ``datatype``       lexical-form check (``integer | decimal | date |
      boolean | string``) — the store holds plain strings, so
      ``sh:datatype`` means "does the string belong to the XSD lexical
      space", the malformed-value gate a web-extraction pipeline needs
      most (reference analogue: the value-type discipline of
      MSSQL/OMOPLoader.sql's typed target columns, e.g. the
      measurement/observation value casts around :1696-1758),
    * ``pattern``        regex the full value must be matchable by
      (``sh:pattern`` semantics: an unanchored find — anchor in the
      pattern itself for full-match),
    * ``min_length`` / ``max_length``        string length bounds,
    * ``min_inclusive`` / ``max_inclusive``  numeric range; a non-numeric
      value under a numeric bound violates it (SPARQL/SHACL comparison
      failure eliminates, i.e. reports).

    Output matches :func:`shacl_validate`: (node, pred, violation, n)
    with violation in ``datatype | pattern | min_length | max_length |
    min_inclusive | max_inclusive``.

    Scale shape: ``facets`` is vocabulary-sized and broadcasts; the check
    itself is ONE pass over the constrained literal triples — every facet
    evaluates as a whole-stage-codegen JVM expression into an array of
    fired violation labels (constant fan-out explode, no per-facet
    re-scan), then one (subj, pred, violation) hash aggregation with
    map-side combining.  Nothing collects to the driver; well-formed
    triples never leave the executors."""
    # Unknown datatype names flag EVERY constrained assertion (loud config
    # error, never a silent pass).
    bad_dt = F.lit(True)
    for name, ok in _DATATYPE_OK.items():
        bad_dt = F.when(
            F.col("datatype") == name, ~F.expr(ok)
        ).otherwise(bad_dt)

    num = F.expr("try_cast(obj AS double)")
    checks = [
        ("datatype", F.col("datatype").isNotNull() & bad_dt),
        ("pattern",
         F.col("pattern").isNotNull()
         & ~F.expr("regexp_like(obj, pattern)")),
        ("min_length",
         F.col("min_length").isNotNull()
         & (F.length("obj") < F.col("min_length"))),
        ("max_length",
         F.col("max_length").isNotNull()
         & (F.length("obj") > F.col("max_length"))),
        ("min_inclusive",
         F.col("min_inclusive").isNotNull()
         & (num.isNull() | (num < F.col("min_inclusive")))),
        ("max_inclusive",
         F.col("max_inclusive").isNotNull()
         & (num.isNull() | (num > F.col("max_inclusive")))),
    ]
    fired = F.array_compact(F.array(*[
        F.when(cond, F.lit(name)) for name, cond in checks
    ]))
    return (
        triples.where(~F.col("obj_is_iri"))
        .join(F.broadcast(facets), "pred")
        .select("subj", "pred", F.explode(fired).alias("violation"))
        .groupBy("subj", "pred", "violation")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("subj").alias("node"), "pred", "violation", "n")
    )


def mine_shapes(triples: DataFrame, node_types: DataFrame) -> DataFrame:
    """The INVERSE of :func:`shacl_validate`: propose shapes from data.

    For every (domain_type, pred) observed in the graph, emit the
    statistics a shape author (or an automated constraint miner, RDF2SHACL
    style) needs:

    * ``n_subjects``      distinct subjects of the type asserting pred
    * ``support_ppm``     n_subjects vs all nodes of the type (integer ppm)
    * ``obj_kind``        majority object kind ('iri' | 'literal'),
      ``kind_purity_ppm`` its share of assertions
    * ``min_count``/``max_count``  per-subject assertion count range
      (max_count == 1 => a candidate ``sh:maxCount 1``)
    * ``range_type``      majority class among TYPED IRI objects (NULL when
      no typed IRI object exists), ``range_purity_ppm`` its share

    Multi-typed nodes contribute one row per type (a shape is proposed per
    class, as in SHACL targets).  Untyped subjects are out of scope — a
    shape needs a target class; untyped OBJECTS are excluded from the
    range-purity denominator (they carry no class evidence).

    All ratios are integer parts-per-million via SQL ``div`` — exact and
    engine-portable.  Scale shape: one (type, pred, subj) aggregation
    (map-side combining) carries everything except the range election,
    which re-aggregates the already-small (type, pred, obj_class) tally;
    the only sort-agg is the majority election over that tally frame
    (struct min — one row per class per predicate per type, vocabulary-
    sized).  Feed the mined rows back into :func:`shacl_validate` (after
    thresholding support/purity) to close the mine -> gate loop.
    """
    types = node_types.select("node", "type")
    t = triples.join(
        types.withColumnRenamed("node", "subj"), "subj"
    ).withColumnRenamed("type", "domain_type")

    per_subj = t.groupBy("domain_type", "pred", "subj").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("obj_is_iri").cast("long")).alias("_iri"),
    )
    base = per_subj.groupBy("domain_type", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.min("_n").cast("long").alias("min_count"),
        F.max("_n").cast("long").alias("max_count"),
        F.sum("_n").alias("_total"),
        F.sum("_iri").alias("_iri_total"),
    )
    base = base.select(
        "domain_type", "pred", "n_subjects", "min_count", "max_count",
        F.when(
            F.col("_iri_total") * 2 >= F.col("_total"), F.lit("iri")
        ).otherwise(F.lit("literal")).alias("obj_kind"),
        F.expr(
            "greatest(_iri_total, _total - _iri_total) * 1000000 div _total"
        ).alias("kind_purity_ppm"),
        "_total",
    )

    type_sizes = types.groupBy(F.col("type").alias("domain_type")).agg(
        F.count(F.lit(1)).alias("_tn")
    )
    base = base.join(type_sizes, "domain_type").select(
        "domain_type", "pred", "n_subjects",
        F.expr("n_subjects * 1000000 div _tn").alias("support_ppm"),
        "obj_kind", "kind_purity_ppm", "min_count", "max_count",
    )

    # range election over typed IRI objects
    obj_cls = (
        t.where(F.col("obj_is_iri"))
        .join(types.withColumnRenamed("node", "obj"), "obj")
        .withColumnRenamed("type", "obj_class")
        .groupBy("domain_type", "pred", "obj_class")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    rng = (
        obj_cls.groupBy("domain_type", "pred")
        .agg(
            F.min(F.struct((-F.col("_c")).alias("_nc"), "obj_class"))
            .alias("_top"),
            F.sum("_c").alias("_ct"),
        )
        .select(
            "domain_type", "pred",
            F.col("_top.obj_class").alias("range_type"),
            F.expr("(-_top._nc) * 1000000 div _ct")
            .alias("range_purity_ppm"),
        )
    )
    return base.join(rng, ["domain_type", "pred"], "left").select(
        "domain_type", "pred", "n_subjects", "support_ppm", "obj_kind",
        "kind_purity_ppm", "min_count", "max_count", "range_type",
        F.col("range_purity_ppm").cast("long").alias("range_purity_ppm"),
    )
