"""RDFS entailment materialization — forward-chain the standard ruleset.

The reference gets its inferred hierarchy for free (OMOP's
`concept_ancestor` ships precomputed and its loaders join it,
MSSQL/OMOPLoader.sql:1567-1630); a KG built from crawled assertions must
MATERIALIZE what its schema entails.  This implements the ρDF core of RDFS:

    rdfs5/7   subPropertyOf closure; (s p o), p ⊑* q  =>  (s q o)
    rdfs2     (s p o), domain(p, C)                   =>  (s type C)
    rdfs3     (s p o), range(p, C)                    =>  (o type C)
    rdfs9/11  subClassOf closure; (s type C), C ⊑* D  =>  (s type D)

The ruleset STRATIFIES — property closure feeds domain/range, which feed
the class closure, and nothing feeds back — so the fixpoint is reached in
one pass over that order plus two transitive closures; there is no
Datalog-style iteration over the instance data at all.

Scale shape (10^12 instance triples, vocabulary-sized schema):

* both closures (subPropertyOf, subClassOf) run on SCHEMA edges via
  :func:`..graph.transitive_closure` — log-round squaring over thousands
  of rows, then broadcast;
* every instance-scale step is a broadcast hash join against a closed
  schema table followed by one distinct (the entailed graph is a SET);
  the instance data is never shuffled except for that final dedup, which
  shares the (subj, pred, obj) key a bucketed triple store already has;
* entailment EXPANDS data (each triple emits up to |closure(p)| copies) —
  the expansion factor is bounded by the schema depth, not the data.

Schema frame columns: ``subclass``/``subprop`` are (sub, sup) direct
edges; ``domains``/``ranges`` are (pred, cls).  Instance ``triples`` are
(subj, pred, obj) with rdf:type spelled as ``pred = 'type'``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TYPE_PRED = "type"


# Schema frames are vocabulary-sized BY DEFINITION — they broadcast into
# every instance-scale join below, so they must fit on the driver anyway.
# Closing them driver-side replaces two distributed log-round fixpoints
# (each round = a join + distinct + checkpoint of scheduling overhead on a
# few-thousand-row frame) with one bounded collect + an in-memory BFS.
MAX_SCHEMA_EDGES = 2_000_000


def _reflexive_closure(edges: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Transitive closure of schema edges PLUS the identity pairs over
    every mentioned vertex — (x, x) for x in sub ∪ sup.

    Computed DRIVER-SIDE: the edge set is collected under a hard
    MAX_SCHEMA_EDGES bound (it is broadcast downstream regardless, so the
    bound is the broadcastability requirement made explicit, not a new
    limit) and closed with an in-memory BFS — cycles terminate naturally
    because the reachable set is monotone."""
    rows = edges.select(col_a, col_b).limit(MAX_SCHEMA_EDGES + 1).collect()
    if len(rows) > MAX_SCHEMA_EDGES:
        raise ValueError(
            f"schema edge set exceeds MAX_SCHEMA_EDGES={MAX_SCHEMA_EDGES}; "
            "a schema this large cannot broadcast — partition the ontology"
        )
    adj: dict[str, set[str]] = {}
    verts: set[str] = set()
    for r in rows:
        a, b = r[0], r[1]
        adj.setdefault(a, set()).add(b)
        verts.add(a)
        verts.add(b)
    pairs: list[tuple[str, str]] = []
    for v in verts:
        seen = {v}
        frontier = [v]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in seen:
                        seen.add(w)
                        nxt.append(w)
            frontier = nxt
        pairs.extend((v, s) for s in seen)
    return edges.sparkSession.createDataFrame(
        pairs, "sub string, sup string"
    )


def rdfs_entail(
    triples: DataFrame,
    subclass: DataFrame,
    subprop: DataFrame,
    domains: DataFrame,
    ranges: DataFrame,
) -> DataFrame:
    """Return the entailed graph: input triples plus every RDFS-derived
    triple, as a distinct (subj, pred, obj) set."""
    pclo = F.broadcast(_reflexive_closure(subprop, "sub", "sup"))
    cclo = F.broadcast(_reflexive_closure(subclass, "sub", "sup"))

    t = triples.select("subj", "pred", "obj")
    # rdfs5/7 — lift every triple through the property closure (identity
    # pairs keep the original predicate, so no separate union needed)
    lifted = (
        t.join(pclo, t["pred"] == pclo["sub"])
        .select("subj", F.col("sup").alias("pred"), "obj")
    )
    # original triples whose predicate has no schema entry still count
    lifted = lifted.unionByName(
        t.join(pclo, t["pred"] == pclo["sub"], "left_anti")
    )

    # rdfs2/3 — domain/range type assertions from the lifted graph
    dom_t = (
        lifted.join(F.broadcast(domains), "pred")
        .select("subj", F.lit(TYPE_PRED).alias("pred"),
                F.col("cls").alias("obj"))
    )
    rng_t = (
        lifted.where(F.col("pred") != TYPE_PRED)
        .join(F.broadcast(ranges), "pred")
        .select(F.col("obj").alias("subj"), F.lit(TYPE_PRED).alias("pred"),
                F.col("cls").alias("obj"))
    )

    typed = (
        lifted.where(F.col("pred") == TYPE_PRED)
        .unionByName(dom_t)
        .unionByName(rng_t)
    )
    # rdfs9/11 — class closure over all type assertions
    typed_clo = (
        typed.join(cclo, typed["obj"] == cclo["sub"])
        .select("subj", "pred", F.col("sup").alias("obj"))
    )
    typed_clo = typed_clo.unionByName(
        typed.join(cclo, typed["obj"] == cclo["sub"], "left_anti")
    )

    return (
        lifted.where(F.col("pred") != TYPE_PRED)
        .unionByName(typed_clo)
        .distinct()
    )
