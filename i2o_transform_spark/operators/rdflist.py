"""RDF collections (rdf:first / rdf:rest cons lists) — distributed unroll.

OWL and SHACL encode every ORDERED argument vector as an RDF collection:
``owl:unionOf``, ``owl:intersectionOf``, ``owl:oneOf``, ``sh:in``,
``sh:languageIn`` all point at a linked list of cons cells
``(cell, rdf:first, member) + (cell, rdf:rest, next-or-nil)``.  A KG
construction pipeline that ingests real ontologies therefore needs to
turn cons chains back into ``(head, pos, member)`` rows before it can
expand the axioms (see queries ``kg_rdf_lists`` / ``kg_owl_unionof``).
The reference never faces this — its OMOP vocabulary ships relationally
(MSSQL/OMOPLoader.sql consumes flat concept_relationship rows) — which is
exactly why the KG recast has to build it.

Scale shape — POINTER DOUBLING, never a per-list walk:

* Every cell starts with a pointer at its PREDECESSOR (the cell whose
  ``rdf:rest`` names it; heads point at themselves, distance 0) and
  distance 1.  Each round composes pointers through one self-join —
  ``ptr <- ptr(ptr)``, ``d <- d + d(ptr)`` — so after r rounds a cell
  sees 2^r hops back.  List length L resolves in ceil(log2 L) rounds of
  ONE shuffle each, independent of HOW MANY lists the graph holds
  (millions of owl:unionOf axioms unroll together).
* Fixpoint probe is a single scalar (count of cells not yet anchored at
  a head); the frame is eagerly localCheckpoint-ed per round so round r
  never replays rounds 0..r-1 (same discipline as graph.transitive_closure).
* A CYCLIC rest-chain never anchors, so the unresolved count stops
  falling while still positive — detected at the fixpoint probe, no
  extra pass.

Well-formedness (RDF spec: each cell has exactly one first, one rest):

* duplicate rdf:first / rdf:rest per cell, a rest with no first (or the
  reverse), and STRUCTURE-SHARED TAILS (a cell named by two rests —
  legal RDF, but it makes list membership ambiguous per head) are all
  detected with bounded probes (``limit(1)``) and raise under
  ``strict=True`` (default) or are quarantined-out under
  ``strict=False``.  Shared tails at scale are served by the pair
  closure (operators/paths) instead — that is a different (quadratic
  per list) contract and must be chosen explicitly, not fallen into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_FIRST = "rdf:first"
RDF_REST = "rdf:rest"
RDF_NIL = "rdf:nil"


class MalformedCollection(ValueError):
    """Raised (strict mode) when the cons structure violates the RDF
    collection contract: duplicate first/rest, half cells, shared tails,
    or a cyclic rest chain."""


def _nonempty(df: DataFrame, what: str, strict: bool) -> bool:
    """Bounded existence probe (never collects more than one row)."""
    bad = df.limit(1).count() > 0
    if bad and strict:
        raise MalformedCollection(f"malformed RDF collection: {what}")
    return bad


def unroll_collections(
    triples: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    first_pred: str = RDF_FIRST,
    rest_pred: str = RDF_REST,
    nil: str = RDF_NIL,
    max_rounds: int = 40,
    strict: bool = True,
) -> DataFrame:
    """Unroll every RDF collection in ``triples`` into
    ``(head, pos, member)`` rows — ``head`` is the first cons cell (the
    node the owning axiom points at), ``pos`` is 0-based list position.

    ``max_rounds`` bounds the doubling rounds (lists up to length
    2^max_rounds resolve; 40 covers any physically storable list) — the
    loop exits at the scalar fixpoint long before that on real data.
    Under ``strict=False`` malformed cells (see module docstring) are
    dropped instead of raising; well-formed lists are unaffected.
    """
    t = triples.select(
        F.col(subj).alias("s"), F.col(pred).alias("p"), F.col(obj).alias("o")
    )
    firsts = (
        t.where(F.col("p") == first_pred)
        .select(F.col("s").alias("cell"), F.col("o").alias("member"))
    )
    rests = (
        t.where(F.col("p") == rest_pred)
        .select(F.col("s").alias("cell"), F.col("o").alias("nxt"))
    )

    dup_first = firsts.groupBy("cell").count().where(F.col("count") > 1)
    dup_rest = rests.groupBy("cell").count().where(F.col("count") > 1)
    half_a = rests.join(firsts, "cell", "left_anti")   # rest without first
    half_b = firsts.join(rests, "cell", "left_anti")   # first without rest
    bad_cells = None
    for frame, what in (
        (dup_first, "cell with multiple rdf:first"),
        (dup_rest, "cell with multiple rdf:rest"),
        (half_a, "cell with rdf:rest but no rdf:first"),
        (half_b, "cell with rdf:first but no rdf:rest"),
    ):
        if _nonempty(frame, what, strict):
            b = frame.select("cell")
            bad_cells = b if bad_cells is None else bad_cells.unionByName(b)

    # links: cell -> successor cell (nil is a terminator, not a cell)
    links = rests.where(F.col("nxt") != nil)
    shared = links.groupBy("nxt").count().where(F.col("count") > 1)
    if _nonempty(shared, "structure-shared tail (two rests name one cell)",
                 strict):
        b = links.join(
            shared.select("nxt"), "nxt"
        ).select(F.col("nxt").alias("cell"))
        bad_cells = b if bad_cells is None else bad_cells.unionByName(b)

    cells = firsts.join(rests.select("cell"), "cell", "left_semi")
    if bad_cells is not None:
        # quarantine-out the malformed cells AND everything downstream of
        # them would be ideal; the contract here is the cheaper one —
        # drop the offending cells, let their chains anchor or cycle out.
        bad = bad_cells.distinct()
        cells = cells.join(bad, "cell", "left_anti")
        links = (
            links.join(bad, "cell", "left_anti")
            .join(bad.withColumnRenamed("cell", "nxt"), "nxt", "left_anti")
        )

    # predecessor pointer: pred(nxt) = cell; heads (no predecessor) anchor
    # at themselves with distance 0.
    preds = links.select(
        F.col("nxt").alias("cell"), F.col("cell").alias("ptr")
    )
    state = (
        cells.select("cell")
        .join(preds, "cell", "left")
        .select(
            "cell",
            F.coalesce(F.col("ptr"), F.col("cell")).alias("ptr"),
            F.when(F.col("ptr").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("d"),
            F.col("ptr").isNull().alias("anchored"),
        )
        .localCheckpoint(eager=True)
    )

    def _unresolved(df: DataFrame) -> int:
        return df.where(~F.col("anchored")).count()

    pending = _unresolved(state)
    for _ in range(max_rounds):
        if pending == 0:
            break
        hop = state.select(
            F.col("cell").alias("_ptr"),
            F.col("ptr").alias("_ptr2"),
            F.col("d").alias("_d2"),
            F.col("anchored").alias("_anchored2"),
        )
        state = (
            state.alias("x")
            .join(hop, F.col("x.ptr") == F.col("_ptr"), "inner")
            .select(
                F.col("x.cell").alias("cell"),
                F.when(F.col("x.anchored"), F.col("x.ptr"))
                .otherwise(F.col("_ptr2"))
                .alias("ptr"),
                F.when(F.col("x.anchored"), F.col("x.d"))
                .otherwise(F.col("x.d") + F.col("_d2"))
                .alias("d"),
                (F.col("x.anchored") | F.col("_anchored2")).alias("anchored"),
            )
            .localCheckpoint(eager=True)
        )
        now = _unresolved(state)
        if now == pending:
            # no progress while unresolved cells remain: cyclic rest chain
            _nonempty(
                state.where(~F.col("anchored")),
                "cyclic rdf:rest chain",
                strict,
            )
            state = state.where(F.col("anchored"))
            break
        pending = now

    return (
        state.where(F.col("anchored"))
        .select(F.col("ptr").alias("head"), F.col("d").alias("pos"), "cell")
        .join(firsts, "cell")
        .select("head", "pos", "member")
    )


def expand_unionof(
    triples: DataFrame,
    union_pred: str = "owl:unionOf",
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    **unroll_kwargs,
) -> DataFrame:
    """Expand ``(C, owl:unionOf, L)`` axioms into the subClassOf
    entailments they denote: every member M of the collection L satisfies
    ``M rdfs:subClassOf C`` (OWL 2 RL cls-uni).  Composes
    :func:`unroll_collections` with ONE broadcast-able equi-join from the
    axiom row to the unrolled heads — the axiom table is schema-sized.

    Returns (sub, sup) pairs, set semantics.
    """
    members = unroll_collections(
        triples, subj=subj, pred=pred, obj=obj, **unroll_kwargs
    )
    axioms = (
        triples.where(F.col(pred) == union_pred)
        .select(F.col(subj).alias("cls"), F.col(obj).alias("head"))
    )
    return (
        members.join(axioms, "head")
        .select(F.col("member").alias("sub"), F.col("cls").alias("sup"))
        .distinct()
    )
