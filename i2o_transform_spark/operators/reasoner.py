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

* both closures (subPropertyOf, subClassOf) close DRIVER-SIDE under an
  explicit MAX_SCHEMA_EDGES bound (the schema broadcasts into every rule
  join below, so driver-fit is already a requirement), then broadcast;
  cyclic schemas (legal RDFS) terminate naturally in the BFS;
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


def _closure_pairs(edges: DataFrame, col_a: str, col_b: str) -> set[tuple]:
    """Driver-side reflexive-transitive closure of schema edges as a pair
    set — (x, x) for every mentioned vertex plus every reachable (x, y).

    The edge set is collected under a hard MAX_SCHEMA_EDGES bound (it is
    broadcast downstream regardless, so the bound is the broadcastability
    requirement made explicit, not a new limit) and closed with an
    in-memory BFS — cycles terminate naturally because the reachable set
    is monotone."""
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
    pairs: set[tuple] = set()
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
        pairs.update((v, s) for s in seen)
    return pairs


def _reflexive_closure(edges: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """:func:`_closure_pairs` as a (sub, sup) frame for the broadcast
    rule joins."""
    return edges.sparkSession.createDataFrame(
        sorted(_closure_pairs(edges, col_a, col_b)), "sub string, sup string"
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


def rdfs_entail_delta(
    materialized: DataFrame,
    delta: DataFrame,
    subclass: DataFrame,
    subprop: DataFrame,
    domains: DataFrame,
    ranges: DataFrame,
) -> DataFrame:
    """Incremental maintenance, INSTANCE delta: the new entailed triples
    contributed by ``delta`` against an existing materialization — the
    caller appends them (``materialized`` stays immutable, snapshot
    style, like operators/graph.incremental_components for CC).

    Why this is exact and not an approximation: every ρDF rule above
    consumes ONE instance triple plus schema — there are no
    instance-instance joins — so entailment distributes over union:
    ``entail(G ∪ Δ) = entail(G) ∪ entail(Δ)``.  The increment is
    therefore ``entail(Δ) \\ materialized``: the full stratified pass runs
    on the DELTA ONLY (delta-sized broadcast joins), and the single
    store-scale operation is one left-anti join whose build side is the
    entailed delta — broadcast under AQE, the 10^12-triple
    materialization is never re-shuffled.  Compare a full recompute,
    which pays the instance-scale joins AND the global distinct every
    batch."""
    spo = ["subj", "pred", "obj"]
    new = rdfs_entail(delta, subclass, subprop, domains, ranges)
    return new.join(materialized.select(*spo), on=spo, how="left_anti")


def rdfs_entail_schema_delta(
    materialized: DataFrame,
    old_subclass: DataFrame,
    old_subprop: DataFrame,
    old_domains: DataFrame,
    old_ranges: DataFrame,
    subclass: DataFrame,
    subprop: DataFrame,
    domains: DataFrame,
    ranges: DataFrame,
) -> DataFrame:
    """Incremental maintenance, SCHEMA delta (new subclass/subproperty/
    domain/range axioms arrive — the common case when crawled ontology
    mappings grow): the new entailed triples, WITHOUT touching instance
    triples whose schema didn't change.

    Soundness/completeness argument: entailment is monotone and
    idempotent, so ``entail_new(materialized) = entail_new(G)`` for the
    original graph G.  Any NEW triple derives through a rule chain using
    at least one changed schema row, and the chain's instance input must
    be a materialized triple whose predicate's property-closure GREW
    (P_aff), whose predicate gained a domain/range row, or a type
    assertion whose class's closure GREW (C_aff).  The full stratified
    pass over exactly that slice (all three filters are pushed-down scans
    of the materialization; the affected sets are computed DRIVER-SIDE by
    diffing the old/new closures, schema-sized by the broadcast bound)
    plus one anti-join yields the increment.  An unchanged schema yields
    an empty slice and an empty increment at one scan's cost."""
    p_old = _closure_pairs(old_subprop, "sub", "sup")
    p_new = _closure_pairs(subprop, "sub", "sup")
    c_old = _closure_pairs(old_subclass, "sub", "sup")
    c_new = _closure_pairs(subclass, "sub", "sup")
    p_aff = sorted({a for a, b in p_new - p_old})
    c_aff = sorted({a for a, b in c_new - c_old})
    dr_old = {
        (r[0], r[1])
        for df in (old_domains, old_ranges)
        for r in df.limit(MAX_SCHEMA_EDGES + 1).collect()
    }
    dr_new_preds = sorted(
        {
            r[0]
            for df in (domains, ranges)
            for r in df.limit(MAX_SCHEMA_EDGES + 1).collect()
            if (r[0], r[1]) not in dr_old
        }
    )
    spo = ["subj", "pred", "obj"]
    m = materialized.select(*spo)
    cond = F.lit(False)
    if p_aff or dr_new_preds:
        cond = cond | F.col("pred").isin(
            sorted(set(p_aff) | set(dr_new_preds))
        )
    if c_aff:
        cond = cond | (
            (F.col("pred") == TYPE_PRED) & F.col("obj").isin(c_aff)
        )
    affected = m.where(cond)
    new = rdfs_entail(affected, subclass, subprop, domains, ranges)
    return new.join(m, on=spo, how="left_anti")


def owl_property_entail(
    triples: DataFrame,
    inverse_of: DataFrame | None = None,
    symmetric: DataFrame | None = None,
    transitive: DataFrame | None = None,
    max_depth: int = 32,
) -> DataFrame:
    """OWL-lite property-characteristic entailment: owl:inverseOf
    (``inverse_of`` is a (p, q) frame, q inverse of p),
    owl:SymmetricProperty (``symmetric``, one ``pred`` column) and
    owl:TransitiveProperty (``transitive``, one ``pred`` column) —
    the property half of OWL RL, composing with :func:`rdfs_entail`
    (run this first, then RDFS lifts the derived edges).

    Semantics honored jointly: an inverse PAIR is canonicalized first —
    every q-oriented edge flips into the canonical predicate, so the two
    names are one edge set; characteristics are INHERITED across the pair
    (the inverse of a transitive/symmetric property is transitive/
    symmetric); a self-inverse (p, p) IS a symmetry declaration.
    Symmetric predicates symmetrize before closure, so a symmetric
    transitive property correctly entails its whole undirected reachable
    set.  After closure, every canonical edge re-emits through the
    inverse name.

    Scale shape: the characteristic tables are schema-sized (driver-side
    under MAX_SCHEMA_EDGES, same bound as the closures above);
    canonicalize/symmetrize/inverse-emit are single map-side projections;
    and ALL transitive predicates close in ONE shared matrix-squaring
    fixpoint keyed on (pred, node) — per-predicate reachability with one
    exchange per round for the whole batch, count-only fixpoint so
    cycles terminate (paths._reach_closure discipline), eager
    localCheckpoint per round."""
    spo = ["subj", "pred", "obj"]

    def _bounded(df: DataFrame, what: str) -> list:
        rows = df.limit(MAX_SCHEMA_EDGES + 1).collect()
        if len(rows) > MAX_SCHEMA_EDGES:
            raise ValueError(
                f"{what} table exceeds MAX_SCHEMA_EDGES={MAX_SCHEMA_EDGES}"
            )
        return rows

    sym: set[str] = (
        {r[0] for r in _bounded(symmetric, "symmetric")}
        if symmetric is not None else set()
    )
    trans: set[str] = (
        {r[0] for r in _bounded(transitive, "transitive")}
        if transitive is not None else set()
    )
    canon: dict[str, str] = {}  # non-canonical name -> canonical name
    if inverse_of is not None:
        for p, q in [tuple(r)[:2] for r in _bounded(inverse_of,
                                                    "inverse_of")]:
            if p == q:
                sym.add(p)
                continue
            c, o = min(p, q), max(p, q)
            if canon.get(o, c) != c:
                raise ValueError(f"predicate {o!r} has two inverses")
            canon[o] = c
            if p in sym or q in sym:
                sym.update((p, q))
            if p in trans or q in trans:
                trans.update((p, q))
    sym_c = sorted({canon.get(p, p) for p in sym})
    trans_c = sorted({canon.get(p, p) for p in trans})

    t = triples.select(*spo)
    noncanon = sorted(canon)
    if noncanon:
        mapping = F.create_map(
            *[F.lit(x) for kv in canon.items() for x in kv]
        )
        flip = F.col("pred").isin(noncanon)
        edges = t.select(
            F.when(flip, F.col("obj")).otherwise(F.col("subj"))
            .alias("subj"),
            F.when(flip, mapping[F.col("pred")]).otherwise(F.col("pred"))
            .alias("pred"),
            F.when(flip, F.col("subj")).otherwise(F.col("obj"))
            .alias("obj"),
        )
    else:
        edges = t
    if sym_c:
        edges = edges.unionByName(
            edges.where(F.col("pred").isin(sym_c)).select(
                F.col("obj").alias("subj"), "pred",
                F.col("subj").alias("obj"),
            )
        )
    if trans_c:
        c = (
            edges.where(F.col("pred").isin(trans_c))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = c.count()
        rounds = 0
        while (1 << rounds) < max_depth:
            rounds += 1
            composed = (
                c.select("subj", "pred", F.col("obj").alias("_mid"))
                .join(
                    c.select(F.col("subj").alias("_mid"), "pred", "obj"),
                    on=["pred", "_mid"],
                )
                .select("subj", "pred", "obj")
            )
            c2 = c.union(composed).distinct().localCheckpoint(eager=True)
            n2 = c2.count()
            c = c2
            if n2 == n:
                break
            n = n2
        edges = edges.unionByName(c)
    if canon:
        back = {}
        for o, cn in canon.items():
            if cn in back:
                raise ValueError(f"predicate {cn!r} has two inverses")
            back[cn] = o
        mapping2 = F.create_map(
            *[F.lit(x) for kv in back.items() for x in kv]
        )
        edges = edges.unionByName(
            edges.where(F.col("pred").isin(sorted(back))).select(
                F.col("obj").alias("subj"),
                mapping2[F.col("pred")].alias("pred"),
                F.col("subj").alias("obj"),
            )
        )
    return t.unionByName(edges).distinct()


def owl_class_entail(
    triples: DataFrame,
    type_pred: str = "rdf:type",
    oneof_pred: str = "owl:oneOf",
    intersection_pred: str = "owl:intersectionOf",
    union_pred: str = "owl:unionOf",
    max_rounds: int = 16,
    strict_lists: bool = True,
) -> DataFrame:
    """OWL 2 RL class-expression entailment over RDF-collection-encoded
    boolean expressions — the CLASS half that complements
    :func:`owl_property_entail`.  Rules (OWL 2 RL table 6 names):

    * **cls-oo**   (C owl:oneOf L), m in L            -> (m type C)
    * **cls-uni**  (C owl:unionOf L), x type m, m in L -> (x type C)
    * **cls-int2** (C owl:intersectionOf L), x type C  -> (x type m) all m
    * **cls-int1** (C owl:intersectionOf L), x type m for ALL m in L
                                                       -> (x type C)

    Returns the full (node, cls) type closure (asserted + entailed),
    set semantics.  The reference's OMOP ontology is flat relational
    rows (MSSQL/OMOPLoader.sql concept_relationship), so it never meets
    collection-encoded class expressions; real OWL ontologies encode
    every n-ary class constructor this way.

    Scale shape: collections and axiom rows are ontology-sized — the
    member table is bounded-checked and BROADCAST into every rule, so
    the instance-scale frame never shuffles for uni/int2/oo.  cls-int1
    is the one aggregation rule: per round ONE hash aggregation on
    (node, cls) with map-side combine, counting DISTINCT satisfied
    members against the expression's arity.  Expressions nest (a union
    member may be an intersection class), so rules iterate to fixpoint;
    rounds are bounded by the NESTING DEPTH of the ontology's class
    graph (schema-sized, typically < 5), never by instance data.  Each
    round anti-joins to the accumulated closure and eagerly
    localCheckpoints, so round r never replays rounds 0..r-1.
    """
    from i2o_transform_spark.operators.rdflist import unroll_collections

    spo = ("subj", "pred", "obj")
    t = triples.select(*spo)
    expr_preds = [oneof_pred, intersection_pred, union_pred]
    axioms = t.where(F.col("pred").isin(expr_preds)).select(
        F.col("subj").alias("cls"), F.col("pred").alias("kind"),
        F.col("obj").alias("head"),
    )
    # Only cells reachable from class-expression axioms matter; the
    # unroll itself is global (all lists resolve together) and the join
    # to axiom heads prunes to the ontology-sized slice.
    mem = (
        unroll_collections(t, strict=strict_lists)
        .join(axioms.select("head").distinct(), "head")
        .select("head", "member")
    )
    nrows = mem.limit(MAX_SCHEMA_EDGES + 1).count()
    if nrows > MAX_SCHEMA_EDGES:
        raise ValueError(
            "class-expression member table exceeds "
            f"MAX_SCHEMA_EDGES={MAX_SCHEMA_EDGES}"
        )
    ax_mem = axioms.join(mem, "head").select("cls", "kind", "member")
    arity = (
        ax_mem.where(F.col("kind") == intersection_pred)
        .groupBy("cls").agg(F.countDistinct("member").alias("_n"))
    )
    # localCheckpoint first (cut the unroll lineage ONCE), broadcast-hint
    # at the join sites — a hint placed before the checkpoint would be
    # discarded with the rebuilt logical plan.
    uni_m = (
        ax_mem.where(F.col("kind") == union_pred)
        .select("cls", "member").localCheckpoint(eager=True)
    )
    int_m = (
        ax_mem.where(F.col("kind") == intersection_pred)
        .join(arity, "cls").select("cls", "member", "_n")
        .localCheckpoint(eager=True)
    )

    # cls-oo is data-free: enumerated members are typed by the axiom.
    oo = ax_mem.where(F.col("kind") == oneof_pred).select(
        F.col("member").alias("node"), F.col("cls")
    )
    closure = (
        t.where(F.col("pred") == type_pred)
        .select(F.col("subj").alias("node"), F.col("obj").alias("cls"))
        .unionByName(oo)
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        uni = closure.join(
            F.broadcast(
                uni_m.withColumnsRenamed({"cls": "_sup", "member": "cls"})
            ),
            "cls",
        ).select("node", F.col("_sup").alias("cls"))
        int2 = closure.join(
            F.broadcast(int_m.select("cls", "member")), "cls"
        ).select("node", F.col("member").alias("cls"))
        int1 = (
            closure.join(
                F.broadcast(int_m.withColumnsRenamed(
                    {"cls": "_sup", "member": "cls"})),
                "cls",
            )
            .groupBy("node", "_sup", "_n")
            .agg(F.countDistinct("cls").alias("_got"))
            .where(F.col("_got") == F.col("_n"))
            .select("node", F.col("_sup").alias("cls"))
        )
        new = (
            uni.unionByName(int2).unionByName(int1)
            .distinct()
            .join(closure, ["node", "cls"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            break
        closure = closure.unionByName(new).localCheckpoint(eager=True)
    return closure


def owl_chain_entail(
    triples: DataFrame,
    chain_pred: str = "owl:propertyChainAxiom",
    max_rounds: int = 8,
    strict_lists: bool = True,
) -> DataFrame:
    """OWL 2 RL property-chain entailment (rule prp-spo2): an axiom
    ``(p, owl:propertyChainAxiom, L)`` with L the cons list (p1 .. pn)
    asserts p1/p2/.../pn  ⊑  p — every chain of edges through the listed
    predicates entails one p edge.  rdfs:subPropertyOf is the n=1 case;
    the classic example is uncle = parent/brother.

    Returns the entailed graph (input plus derived edges), set
    semantics.  The reference's OMOP `concept_ancestor` table is a
    PRE-FLATTENED chain product shipped as data
    (MSSQL/OMOPLoader.sql:1567-1630 joins it instead of composing);
    a KG built from an ontology must compose the chains itself.

    Scale shape: the axiom list is ontology-sized — unrolled
    (operators/rdflist, pointer doubling) and collected under
    MAX_SCHEMA_EDGES.  Each chain evaluates as a LEFT-DEEP sequence of
    equi-joins over per-predicate pushed-down scans
    (operators/paths.eval_path "seq" composition — Catalyst/AQE pick
    broadcast vs shuffle per hop from observed sizes); all chains run
    per round, then ONE distinct + anti-join grows the graph.  Chains
    can feed each other (a derived p edge may be a link of another
    chain — including recursively, e.g. ancestor = parent/ancestor), so
    rounds iterate to a count fixpoint, bounded by the axiom DEPENDENCY
    depth for the non-recursive case and by graph diameter for
    recursive axioms; ``max_rounds`` caps the recursive case (raise it
    for deep hierarchies).  Eager localCheckpoint per round cuts
    lineage, same discipline as owl_property_entail's closure.
    """
    from i2o_transform_spark.operators.paths import eval_path
    from i2o_transform_spark.operators.rdflist import unroll_collections

    spo = ("subj", "pred", "obj")
    t = triples.select(*spo)
    axioms = t.where(F.col("pred") == chain_pred).select(
        F.col("subj").alias("sup"), F.col("obj").alias("head")
    )
    mem = (
        unroll_collections(t, strict=strict_lists)
        .join(axioms, "head")
        .select("sup", "head", "pos", "member")
    )
    rows = mem.limit(MAX_SCHEMA_EDGES + 1).collect()
    if len(rows) > MAX_SCHEMA_EDGES:
        raise ValueError(
            f"chain-axiom table exceeds MAX_SCHEMA_EDGES={MAX_SCHEMA_EDGES}"
        )
    # Key on (sup, head): a property may carry SEVERAL chain axioms
    # (e.g. anc ⊒ parent and anc ⊒ parent/anc — the recursive pair);
    # each list is its own composition, all emitting under sup.
    chains: dict[tuple, list] = {}
    for r in rows:
        chains.setdefault((r["sup"], r["head"]), []).append(
            (r["pos"], r["member"])
        )
    asts: list[tuple] = []
    for (sup, _), links in sorted(chains.items()):
        ordered = [m for _, m in sorted(links)]
        ast = ("pred", ordered[0])
        for m in ordered[1:]:
            ast = ("seq", ast, ("pred", m))
        asts.append((sup, ast))

    # The returned graph is DOMAIN edges: the axiom rows and their
    # rdf:first/rdf:rest encoding cells are reasoner input, not
    # entailment subject matter, so they are excluded (the n=1 "chain"
    # is the subPropertyOf case and works the same way).
    from i2o_transform_spark.operators.rdflist import RDF_FIRST, RDF_REST

    graph = t.where(
        ~F.col("pred").isin([chain_pred, RDF_FIRST, RDF_REST])
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        derived = None
        for sup, ast in asts:
            d = eval_path(graph, ast).select(
                F.col("src").alias("subj"),
                F.lit(sup).alias("pred"),
                F.col("dst").alias("obj"),
            )
            derived = d if derived is None else derived.unionByName(d)
        if derived is None:
            break
        new = derived.distinct().join(graph, on=list(spo), how="left_anti")
        new = new.localCheckpoint(eager=True)
        if new.limit(1).count() == 0:
            break
        graph = graph.unionByName(new).localCheckpoint(eager=True)
    return graph


def rdfs_retract_delta(
    base: DataFrame,
    delete: DataFrame,
    subclass: DataFrame,
    subprop: DataFrame,
    domains: DataFrame,
    ranges: DataFrame,
) -> DataFrame:
    """Incremental maintenance, RETRACTION delta (DRed for ρDF): the
    triples to REMOVE from a materialization when asserted triples
    ``delete`` ⊆ ``base`` are retracted — the caller's new store is
    ``materialized LEFT ANTI removals`` and equals
    ``rdfs_entail(base \\ delete)`` exactly (oracle-checked).

    Classic DRed is overdelete-then-rederive; ρDF's linearity (every
    rule consumes ONE instance triple + schema, see rdfs_entail_delta)
    makes both phases cheap and EXACT:

    * overdeletion D* = entail(delete) — delta-sized, schema-broadcast
      joins only;
    * rederivation: d ∈ D* survives iff SOME remaining asserted triple
      still derives it.  Because derivations are linear, the preimages
      of D* are enumerable as delta x schema-bounded candidate sets —
      exact triples through the inverse property closure, (subj, pred)
      patterns through the composed domain map, (pred, obj) patterns
      through the composed range map, and type-ancestor patterns
      through the inverse class closure — and each set probes the
      remaining store in ONE broadcast-build inner join (the store is
      scanned, never shuffled; one matching row rederives d, no
      counting books are kept, which is what makes DRed-for-linear-rules
      exact where general DRed needs support counts).

    The 10^12-triple shape: every join build side is delta- or
    schema-sized; the remaining store is read once per probe family (4
    narrow scans, or fewer after the planner shares them) and the final
    anti-join's build side is the (delta-sized) removal set."""
    spo = ["subj", "pred", "obj"]
    remaining = base.join(delete.select(*spo), spo, "left_anti")
    dstar = rdfs_entail(delete, subclass, subprop, domains, ranges)
    pclo = _reflexive_closure(subprop, "sub", "sup")
    cclo = _reflexive_closure(subclass, "sub", "sup")
    # composed schema maps: q asserts (s,q,o) => lifted q' ⊒ q =>
    # domain/range class => class closure; (cls, q) says "a remaining
    # triple with predicate q rederives type cls"
    def _pred_cls_map(axioms: DataFrame) -> DataFrame:
        """(q, cls): a remaining triple with predicate q derives type
        cls through lifting + this axiom family + the class closure.
        The class closure is reflexive only over schema-mentioned
        classes, so axiom classes absent from it keep themselves via
        the identity union (the same left-anti pattern rdfs_entail
        uses)."""
        lifted = pclo.join(axioms, pclo["sup"] == axioms["pred"]).select(
            pclo["sub"].alias("q"), axioms["cls"].alias("c0")
        )
        closed = lifted.join(cclo, lifted["c0"] == cclo["sub"]).select(
            "q", cclo["sup"].alias("cls")
        )
        ident = lifted.join(
            cclo, lifted["c0"] == cclo["sub"], "left_anti"
        ).select("q", F.col("c0").alias("cls"))
        return closed.unionByName(ident).distinct()

    dom_map = _pred_cls_map(domains)
    rng_map = _pred_cls_map(ranges)
    d_non = dstar.where(F.col("pred") != TYPE_PRED)
    d_typ = dstar.where(F.col("pred") == TYPE_PRED)

    # (a) non-type d=(s,p,o): remaining (s,q,o) with p ∈ pclo(q); the
    # reflexive closure covers schema preds, the identity union covers
    # preds with no schema entry
    cand_a = (
        d_non.alias("d")
        .join(pclo, F.col("d.pred") == pclo["sup"])
        .select(F.col("d.subj").alias("subj"), pclo["sub"].alias("q"),
                F.col("d.obj").alias("obj"), F.col("d.pred").alias("dp"))
        .unionByName(
            d_non.select("subj", F.col("pred").alias("q"), "obj",
                         F.col("pred").alias("dp"))
        )
        .distinct()
    )
    red_a = (
        remaining.alias("r")
        .join(
            F.broadcast(cand_a).alias("c"),
            (F.col("r.subj") == F.col("c.subj"))
            & (F.col("r.pred") == F.col("c.q"))
            & (F.col("r.obj") == F.col("c.obj")),
        )
        .select(F.col("c.subj").alias("subj"),
                F.col("c.dp").alias("pred"),
                F.col("c.obj").alias("obj"))
        .distinct()
    )

    # type assertions can enter the cascade through predicates that lift
    # INTO 'type' (legal ρDF) as well as through 'type' itself
    type_preds = (
        pclo.where(F.col("sup") == TYPE_PRED)
        .select(F.col("sub").alias("tp"))
        .unionByName(
            subprop.sparkSession.createDataFrame(
                [(TYPE_PRED,)], "tp string"
            )
        )
        .distinct()
    )
    rem_t = (
        remaining.join(
            F.broadcast(type_preds), remaining["pred"] == F.col("tp")
        )
        .select("subj", "obj")
    )

    # (b) type d=(s,type,C): remaining type assertion (s, C0) with
    # C ∈ cclo(C0); identity union covers classes with no schema entry
    cand_b = (
        d_typ.alias("d")
        .join(cclo, F.col("d.obj") == cclo["sup"])
        .select(F.col("d.subj").alias("subj"), cclo["sub"].alias("c0"),
                F.col("d.obj").alias("cls"))
        .unionByName(
            d_typ.select("subj", F.col("obj").alias("c0"),
                         F.col("obj").alias("cls"))
        )
        .distinct()
    )
    red_b = (
        rem_t.alias("r")
        .join(
            F.broadcast(cand_b).alias("c"),
            (F.col("r.subj") == F.col("c.subj"))
            & (F.col("r.obj") == F.col("c.c0")),
        )
        .select(F.col("c.subj").alias("subj"),
                F.lit(TYPE_PRED).alias("pred"),
                F.col("c.cls").alias("obj"))
        .distinct()
    )

    # (c) type d via domain: remaining (s, q, ?) for (cls, q) in dom_map
    cand_c = (
        d_typ.alias("d")
        .join(dom_map, F.col("d.obj") == dom_map["cls"])
        .select(F.col("d.subj").alias("subj"), "q",
                F.col("d.obj").alias("cls"))
        .distinct()
    )
    red_c = (
        remaining.alias("r")
        .join(
            F.broadcast(cand_c).alias("c"),
            (F.col("r.subj") == F.col("c.subj"))
            & (F.col("r.pred") == F.col("c.q")),
        )
        .select(F.col("c.subj").alias("subj"),
                F.lit(TYPE_PRED).alias("pred"),
                F.col("c.cls").alias("obj"))
        .distinct()
    )

    # (d) type d via range: remaining (?, q, s) for (cls, q) in rng_map
    cand_d = (
        d_typ.alias("d")
        .join(rng_map, F.col("d.obj") == rng_map["cls"])
        .select(F.col("d.subj").alias("node"), "q",
                F.col("d.obj").alias("cls"))
        .distinct()
    )
    red_d = (
        remaining.alias("r")
        .join(
            F.broadcast(cand_d).alias("c"),
            (F.col("r.obj") == F.col("c.node"))
            & (F.col("r.pred") == F.col("c.q")),
        )
        .select(F.col("c.node").alias("subj"),
                F.lit(TYPE_PRED).alias("pred"),
                F.col("c.cls").alias("obj"))
        .distinct()
    )

    rederived = (
        red_a.unionByName(red_b).unionByName(red_c).unionByName(red_d)
    )
    return dstar.join(rederived, spo, "left_anti")
