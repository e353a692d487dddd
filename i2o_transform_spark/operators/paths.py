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
    ("plus", e)        one-or-more   (e+)   — pairs-only reachability fixpoint
    ("star", e)        zero-or-more  (e*)   — plus ∪ identity over ``nodes``
    ("opt", e)         zero-or-one   (e?)   — pairs ∪ identity over ``nodes``

Every combinator returns a DISTINCT (src, dst) pair set — SPARQL path
semantics are set-based (no duplicate solutions for ``+``/``*``), which is
also what keeps evaluation bounded: intermediate frames never exceed
|V|^2 regardless of path multiplicity.

Scale shape: ``pred`` is a pushed-down filter on the predicate column —
on a predicate-partitioned triple store each atom prunes to its own
partitions; ``seq`` is one equi-join on the mid node; ``alt`` a union +
hash dedup; ``plus`` runs a pairs-only pointer-doubling reachability
fixpoint (``_reach_closure``) — unlike the min/max-levels semiring
closure in operators/graph.transitive_closure (whose level signature
never stabilizes on cycles), the pair-set is monotone-growing and finite
even on cyclic predicate graphs (sameAs, symmetric relations), so the
pair-count signature alone detects the true fixpoint and cyclic inputs
terminate early and correctly.  ``max_depth`` bounds reach to 2^rounds
hops and is threaded through every combinator.  ``star`` needs the node
universe for the identity pairs; pass the (deduped) node frame, not the
triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PathExpr = tuple


def _reach_closure(pairs: DataFrame, max_depth: int) -> DataFrame:
    """Distinct reachability closure of a (src, dst) pair set by matrix
    squaring: round k covers every path of length <= 2^k, so
    ceil(log2(max_depth)) shuffles reach depth ``max_depth``.  Fixpoint
    detection is the pair COUNT alone — the set only grows and is bounded
    by |V|^2, so count equality is a true fixpoint; this holds on cyclic
    graphs where any path-length signature would keep rising forever.
    Each round is localCheckpoint-ed eagerly so round r never replays
    rounds 0..r-1 (same discipline as graph.transitive_closure)."""
    c = pairs.select("src", "dst").distinct().localCheckpoint(eager=True)
    n = c.count()
    rounds = 0
    while (1 << rounds) < max_depth:
        rounds += 1
        composed = (
            c.select("src", F.col("dst").alias("_mid"))
            .join(c.select(F.col("src").alias("_mid"), "dst"), "_mid")
            .select("src", "dst")
        )
        c2 = c.union(composed).distinct().localCheckpoint(eager=True)
        n2 = c2.count()
        c = c2
        if n2 == n:
            break
        n = n2
    return c


def eval_path(
    triples: DataFrame,
    expr: PathExpr,
    nodes: DataFrame | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """Evaluate ``expr`` against ``triples`` (subj, pred, obj); returns a
    distinct (src, dst) frame.  ``nodes`` — single-column frame of the
    node universe — is required by any ``star`` subexpression (identity
    pairs must cover nodes with no edges).  ``max_depth`` bounds the hop
    reach of every ``plus``/``star`` subexpression (reachability beyond
    it is truncated); raise it for deep hierarchies — rounds grow only
    logarithmically."""
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
        inner = eval_path(triples, expr[1], nodes, max_depth)
        return inner.select(
            F.col("dst").alias("src"), F.col("src").alias("dst")
        )
    if op == "seq":
        left = eval_path(triples, expr[1], nodes, max_depth)
        right = eval_path(triples, expr[2], nodes, max_depth)
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
            eval_path(triples, expr[1], nodes, max_depth)
            .union(eval_path(triples, expr[2], nodes, max_depth))
            .distinct()
        )
    if op == "plus":
        inner = eval_path(triples, expr[1], nodes, max_depth)
        return _reach_closure(inner, max_depth)
    if op in ("star", "opt"):
        if nodes is None:
            raise ValueError(f"zero-or-{'more' if op == 'star' else 'one'} "
                             "path needs the node universe")
        ident = nodes.select(
            F.col(nodes.columns[0]).alias("src"),
            F.col(nodes.columns[0]).alias("dst"),
        ).distinct()
        inner = (
            eval_path(triples, ("plus", expr[1]), nodes, max_depth)
            if op == "star"
            else eval_path(triples, expr[1], nodes, max_depth)
        )
        return inner.union(ident).distinct()
    raise ValueError(f"unknown path op: {op!r}")
