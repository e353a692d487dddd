"""VoID-style dataset statistics for a triple store (W3C VoID: Vocabulary
of Interlinked Datasets — the standard "describe what you built" summary a
KG-construction pipeline publishes next to the graph).

The reference ships a hand-written per-table count-reconciliation report
(MSSQL/OMOPLoader.sql:1996-2097 ``omopReport`` — row counts, orphan
checks); its graph-world analogue is the VoID partition report this module
mines from the triples themselves:

* one **dataset** row — void:triples, void:distinctSubjects,
  void:properties, void:distinctObjects;
* one **property partition** row per predicate — void:triples plus the
  per-predicate distinct subject/object counts (the fan-in/fan-out
  profile that tells a consumer which predicates are functional-ish);
* one **class partition** row per ``type_pred`` object — void:entities
  per class (n_subjects) and the class-assertion triple count.

Output schema (one frame, fixed 6 columns so the report is UNION-able
and diffable across builds):

    partition     'dataset' | 'property' | 'class'
    key           '' | predicate | class IRI
    n_triples     triples in the partition
    n_subjects    distinct subjects (class rows: void:entities)
    n_objects     distinct objects (class rows: 1 — the class itself)
    n_predicates  distinct predicates (property/class rows: 1)

Scale shape (10^12-triple stores)
---------------------------------
Three independent single-pass aggregations over a 3-column projection
(column-pruned at the scan): the property partition is ONE hash
aggregation keyed on pred; the class partition scans only the pushed-down
``pred = type_pred`` slice.  The dataset row's multiple COUNT(DISTINCT)
compile to Catalyst's Expand (3x row multiplication) + two-level partial
aggregation — map-side combined, no driver-side state.  For stores where
exact global distincts are not worth the exchange, ``exact=False``
switches every distinct to ``approx_count_distinct`` (HyperLogLog++,
relative error ~2.3%) — same schema, one pass, no Expand.  The report
itself is at most |predicates| + |classes| + 1 rows: broadcast-sized by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def void_statistics(
    triples: DataFrame,
    type_pred: str = "rdf:type",
    exact: bool = True,
) -> DataFrame:
    """Mine the VoID dataset / property-partition / class-partition report
    from a (subj, pred, obj[, ...]) triples frame.  Extra columns (graph,
    obj_lang, ...) are ignored — statistics are over the lexical S/P/O.

    ``exact=False`` uses HyperLogLog++ sketches for every distinct count
    (scale path; the exact path is the oracle-checked default)."""
    spo = triples.select("subj", "pred", "obj")
    d = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    one = F.lit(1).cast("long")

    dataset = spo.agg(
        F.count("*").alias("n_triples"),
        d("subj").alias("n_subjects"),
        d("obj").alias("n_objects"),
        d("pred").alias("n_predicates"),
    ).select(
        F.lit("dataset").alias("partition"),
        F.lit("").alias("key"),
        "n_triples", "n_subjects", "n_objects", "n_predicates",
    )

    prop = (
        spo.groupBy("pred")
        .agg(
            F.count("*").alias("n_triples"),
            d("subj").alias("n_subjects"),
            d("obj").alias("n_objects"),
        )
        .select(
            F.lit("property").alias("partition"),
            F.col("pred").alias("key"),
            "n_triples", "n_subjects", "n_objects",
            one.alias("n_predicates"),
        )
    )

    cls = (
        spo.where(F.col("pred") == type_pred)
        .groupBy("obj")
        .agg(
            F.count("*").alias("n_triples"),
            d("subj").alias("n_subjects"),
        )
        .select(
            F.lit("class").alias("partition"),
            F.col("obj").alias("key"),
            "n_triples", "n_subjects",
            one.alias("n_objects"),
            one.alias("n_predicates"),
        )
    )

    return dataset.unionByName(prop).unionByName(cls)


def void_graph_statistics(
    quads: DataFrame,
    exact: bool = True,
) -> DataFrame:
    """Per-NAMED-GRAPH VoID — the quad-lake companion of
    :func:`void_statistics`: dataset totals and property partitions
    keyed by the ``graph`` column (NULL = the default graph), the report
    a crawl-provenanced store publishes per source graph.

    Schema (fixed, UNION-able): (graph, partition, key, n_triples,
    n_subjects, n_objects) — partition='dataset' rows carry key=NULL,
    partition='property' rows carry key=pred.  Two aggregations over a
    pruned 4-column scan; on the quad lake layout (write.partitionBy
    ("graph")) the graph key is the partition column, so both
    aggregations are map-side-combinable within graph partitions.
    ``exact=False`` switches distincts to HyperLogLog++."""
    q = quads.select("graph", "subj", "pred", "obj")
    d = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c))
    )
    dataset = q.groupBy("graph").agg(
        F.count("*").cast("long").alias("n_triples"),
        d("subj").cast("long").alias("n_subjects"),
        d("obj").cast("long").alias("n_objects"),
    ).select(
        "graph", F.lit("dataset").alias("partition"),
        F.lit(None).cast("string").alias("key"),
        "n_triples", "n_subjects", "n_objects",
    )
    props = q.groupBy("graph", "pred").agg(
        F.count("*").cast("long").alias("n_triples"),
        d("subj").cast("long").alias("n_subjects"),
        d("obj").cast("long").alias("n_objects"),
    ).select(
        "graph", F.lit("property").alias("partition"),
        F.col("pred").alias("key"),
        "n_triples", "n_subjects", "n_objects",
    )
    return dataset.unionByName(props)
