"""SPARQL 1.1 property-path evaluation over (subj, pred, obj) triples.

Path expressions are the KG query feature the reference hand-writes as
fixed join chains (MSSQL/OMOPLoader.sql two-hop 'Maps to' walks and
concept_ancestor rollups are literally ``mapsTo/mapsTo`` and
``subsumes+`` paths); this module evaluates them compositionally.

Expression AST (plain tuples, no classes — picklable and printable):

    ("pred", p)        edges labeled p
    ("npred", [p...])  edges labeled anything EXCEPT the listed predicates
                       (SPARQL negated property set  !(p1|p2))
    ("inv", e)         inverse path  (^e)
    ("seq", e1, e2)    sequence      (e1 / e2)
    ("alt", e1, e2)    alternative   (e1 | e2)
    ("plus", e)        one-or-more   (e+)   — via graph.transitive_closure
    ("star", e)        zero-or-more  (e*)   — plus ∪ identity over ``nodes``

Every combinator returns a DISTINCT (src, dst) pair set — SPARQL path
semantics are set-based (no duplicate solutions for ``+``/``*``), which is
also what keeps evaluation bounded: intermediate frames never exceed
|V|^2 regardless of path multiplicity.

Scale shape: ``pred`` is a pushed-down filter on the predicate column —
on a predicate-partitioned triple store each atom prunes to its own
partitions; ``seq`` is one equi-join on the mid node; ``alt`` a union +
hash dedup; ``plus`` delegates to the log-round semiring closure
(operators/graph.transitive_closure) and inherits its bounds — closures
over planet-scale predicates (e.g. ``sameAs*``) should be bounded with
its ``max_depth``.  ``star`` needs the node universe for the identity
pairs; pass the (deduped) node frame, not the triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PathExpr = tuple


def eval_path(
    triples: DataFrame,
    expr: PathExpr,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Evaluate ``expr`` against ``triples`` (subj, pred, obj); returns a
    distinct (src, dst) frame.  ``nodes`` — single-column frame of the
    node universe — is required by any ``star`` subexpression (identity
    pairs must cover nodes with no edges)."""
    op = expr[0]
    if op == "pred":
        return (
            triples.where(F.col("pred") == F.lit(expr[1]))
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct()
        )
    if op == "npred":
        return (
            triples.where(~F.col("pred").isin(list(expr[1])))
            .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
            .distinct()
        )
    if op == "inv":
        inner = eval_path(triples, expr[1], nodes)
        return inner.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if op == "seq":
        left = eval_path(triples, expr[1], nodes)
        right = eval_path(triples, expr[2], nodes)
        return (
            left.join(
                right.withColumnRenamed("src", "_mid"),
                left["dst"] == F.col("_mid"),
            )
            .select(left["src"].alias("src"), right["dst"].alias("dst"))
            .distinct()
        )
    if op == "alt":
        return (
            eval_path(triples, expr[1], nodes)
            .union(eval_path(triples, expr[2], nodes))
            .distinct()
        )
    if op == "plus":
        from i2o_transform_spark.operators.graph import transitive_closure

        inner = eval_path(triples, expr[1], nodes)
        return transitive_closure(
            inner, child="src", parent="dst"
        ).select(
            F.col("descendant").alias("src"), F.col("ancestor").alias("dst")
        )
    if op == "star":
        if nodes is None:
            raise ValueError("star path needs the node universe")
        ident = nodes.select(
            F.col(nodes.columns[0]).alias("src"),
            F.col(nodes.columns[0]).alias("dst"),
        ).distinct()
        return eval_path(triples, ("plus", expr[1]), nodes).union(
            ident
        ).distinct()
    raise ValueError(f"unknown path op: {op!r}")
