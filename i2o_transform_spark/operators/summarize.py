"""k-bisimulation graph summarization — structural schema discovery.

Two nodes are k-bisimilar if they have the same type and, recursively, the
same SET of (predicate, (k-1)-bisimulation class of neighbor) out-edges.
Partitioning a graph by k-bisimulation class and contracting each class to
one summary node yields the *quotient graph*: the data-driven "schema" of a
heterogeneous web KG (Kaushik et al. A(k)-index, Consens et al. graph
summaries).  The reference gets its schema for free (fixed warehouse DDL);
a KG built from crawled pages must DISCOVER it, and the summary — thousands
of class-nodes for 10^12 instance-nodes — is what query planners, shape
miners (operators/shacl.py feeds on exactly these classes), and data-quality
dashboards actually consume.

Class ids are content-addressed: ``md5`` of the node's previous class plus
the sorted distinct list of ``pred>neighbor_class`` tokens.  Content
addressing makes ids deterministic across engines, cluster sizes, and
partitionings — the same property functions/hashing.content_id relies on —
so the DuckDB oracle re-derives the exact hex ids.

Scale shape (10^12 edges)
-------------------------
* each refinement round = ONE join keyed on dst (attach neighbor classes)
  + ONE aggregation keyed on src (sorted distinct token list) + ONE
  broadcast-or-shuffle join back to labels: all hash-partitioned on node
  id, the graph's natural key; a bucketed layout makes the label joins
  exchange-free.
* ``collect_set`` per src is bounded by out-degree; degree-skewed hub
  nodes are exactly the nodes whose token lists are LONG — cap with an
  upstream degree cut if hubs exceed memory (the summary of a hub is
  rarely interesting: it touches every class).
* k is small by construction (k=2..3 stabilizes real graphs; A(k)-index
  literature): the loop is driver-bounded, no fixpoint detection needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bisimulation_classes(
    edges: DataFrame,
    node_types: DataFrame,
    k: int = 2,
    max_out_degree: int | None = 100_000,
) -> DataFrame:
    """Return (node, cls) after ``k`` refinement rounds.

    ``edges``: (src, pred, dst); ``node_types``: (node, type) — ONE type
    row per node (pre-concatenate multi-types upstream so class 0 is
    well-defined).

    ``max_out_degree`` is the hub guard: a node whose out-degree exceeds
    it gets the sentinel token ``*HUB*`` instead of its (enormous) sorted
    neighbor-token list — its per-round state stays O(1) instead of
    O(degree), and all over-cap hubs of the same type/history collapse
    into one well-defined "hub" class.  A 10^7-out-degree portal page
    would otherwise materialize a 10^7-element collect_set in one
    aggregation buffer.  ``None`` disables the cap (exact semantics, as
    the oracle-checked fixture uses).
    """
    labels = node_types.select(
        "node", F.md5(F.col("type")).alias("cls")
    )
    e = edges.select("src", "pred", "dst")
    if max_out_degree is not None:
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        hubs = deg.where(F.col("_deg") > max_out_degree).select("src")
        hub_nodes = hubs.select(F.col("src").alias("node")).localCheckpoint(
            eager=True
        )
        e = e.join(hubs, "src", "left_anti")
    else:
        hub_nodes = None
    for _ in range(k):
        nb = (
            e.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("cls").alias("_dcls")
                ),
                "dst",
            )
            .select(
                F.col("src").alias("node"),
                F.concat(F.col("pred"), F.lit(">"), F.col("_dcls")).alias(
                    "_tok"
                ),
            )
            .groupBy("node")
            .agg(
                F.array_join(
                    F.array_sort(F.collect_set("_tok")), ","
                ).alias("_nb")
            )
        )
        if hub_nodes is not None:
            nb = nb.unionByName(
                hub_nodes.withColumn("_nb", F.lit("*HUB*"))
            )
        labels = (
            labels.join(nb, "node", "left")
            .select(
                "node",
                F.md5(
                    F.concat(
                        F.col("cls"),
                        F.lit("|"),
                        F.coalesce(F.col("_nb"), F.lit("")),
                    )
                ).alias("cls"),
            )
        )
    # consumers join labels at least twice (src + dst contraction):
    # materialize the k-round chain once instead of replaying it per join
    return labels.localCheckpoint(eager=True)


def summary_graph(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Contract ``edges`` by class: (src_class, pred, dst_class, n_edges)."""
    return (
        edges.join(
            labels.select(
                F.col("node").alias("src"), F.col("cls").alias("src_class")
            ),
            "src",
        )
        .join(
            labels.select(
                F.col("node").alias("dst"), F.col("cls").alias("dst_class")
            ),
            "dst",
        )
        .groupBy("src_class", "pred", "dst_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
