"""RDF-star (N-Triples-star) interchange — statements about statements.

RDF-star is the W3C path for qualified assertions (Wikidata qualifiers,
provenance, confidence scores): a *quoted triple* ``<< s p o >>`` used as
the subject of an annotation triple.  The reference models qualified
facts relationally — modifier columns riding on fact rows, joined back
by key (MSSQL/OMOPLoader.sql modifier joins) — and operators/reify.py
already re-expresses that as RDF reification.  This module adds the
modern wire format and the loss-free bridge between the two models, so
an RDF-star crawl dump loads straight into the reified store and the
reified store publishes back as RDF-star:

* :func:`to_ntriples_star_lines` — serialize annotation rows as
  ``<< <s> <p> o >> <pred> obj .`` lines (object terms IRI or escaped
  literal, same contract as sources/ntriples);
* :func:`parse_ntriples_star_lines` — JVM-only anchored-regex parse of
  star lines (FAILFAST / PERMISSIVE quarantine, mirroring
  parse_ntriples_lines);
* :func:`rdfstar_to_reified` — annotation rows -> reification triples
  over content-addressed statement nodes (operators/reify.statement_id),
  so dereify()/qualifier queries work unchanged;
* :func:`reified_to_rdfstar` — the inverse: a reified store's statement
  nodes back to annotation rows (one hash aggregation + one join).

Scope (documented, FAILFAST-enforced): quoted triples appear in SUBJECT
position only and do not nest — the annotation pattern, which is what
qualifier data actually is.  Nested quoting (an annotation about an
annotation) round-trips through the reified model instead, where the
statement node of the inner annotation is just another subject; the
line grammar rejects it loudly rather than mis-parsing.

Scale shape: serialize and parse are pure line-parallel maps (zero
shuffle); the model bridges are one explode (to reified) and one
map-side-combining aggregation + equi-join (from reified) — identical
cost to reify/dereify themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from i2o_transform_spark.operators.reify import statement_id
from i2o_transform_spark.sources.ntriples import (
    escape_literal,
    unescape_literal,
)

_BAD_IRI = "[<>\"{}|^`\\\\ \t\n\r]"

# Anchored star-line grammar: quoted triple (groups 1-4) as subject, then
# annotation predicate (5) and object (6 IRI xor 7 literal).  A quoted
# triple's own object is group 3 (IRI) xor group 4 (literal).  `<<` inside
# the quoted object cannot occur: IRIs exclude '<' and literal escaping
# covers '"' only — nesting therefore fails the grammar (by design).
_STAR_RE = (
    r'^<< <([^>]*)> <([^>]*)> '
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)") >> '
    r'<([^>]*)> '
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)")'
    r' \.\s*$'
)


def _iri(c: Column) -> Column:
    return F.when(~c.rlike(_BAD_IRI), c).otherwise(
        F.raise_error(F.concat(F.lit("invalid IRI characters in: "), c))
    )


def _term(val: Column, is_iri: Column | None) -> Column:
    lit = F.concat(F.lit('"'), escape_literal(val.cast("string")),
                   F.lit('"'))
    if is_iri is None:
        return lit
    return F.when(is_iri, F.concat(F.lit("<"), _iri(val), F.lit(">"))) \
            .otherwise(lit)


def to_ntriples_star_lines(
    df: DataFrame,
    q_subj: str = "q_subj",
    q_pred: str = "q_pred",
    q_obj: str = "q_obj",
    pred: str = "pred",
    obj: str = "obj",
    q_obj_is_iri: str | None = None,
    obj_is_iri: str | None = None,
) -> DataFrame:
    """Annotation rows -> one-column ``line`` N-Triples-star."""
    qo = _term(
        F.col(q_obj),
        None if q_obj_is_iri is None else F.col(q_obj_is_iri),
    )
    ao = _term(
        F.col(obj), None if obj_is_iri is None else F.col(obj_is_iri)
    )
    return df.select(
        F.concat(
            F.lit("<< <"), _iri(F.col(q_subj)), F.lit("> <"),
            _iri(F.col(q_pred)), F.lit("> "), qo, F.lit(" >> <"),
            _iri(F.col(pred)), F.lit("> "), ao, F.lit(" ."),
        ).alias("line")
    )


def parse_ntriples_star_lines(
    lines: DataFrame, col: str = "line", mode: str = "FAILFAST"
) -> DataFrame:
    """Star lines -> (q_subj, q_pred, q_obj, q_obj_is_iri, pred, obj,
    obj_is_iri).  FAILFAST raises on any non-matching line (including
    nested quoting); PERMISSIVE quarantines it in ``_corrupt_line``."""
    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    data = lines.where(~F.col(col).rlike(r"^\s*(#|$)"))
    m = lambda g: F.regexp_extract(F.col(col), _STAR_RE, g)  # noqa: E731
    ok = F.col(col).rlike(_STAR_RE)
    first = (
        F.when(ok, m(1)) if mode == "PERMISSIVE"
        else F.when(ok, m(1)).otherwise(
            F.raise_error(F.concat(
                F.lit("malformed N-Triples-star line: "), F.col(col)))
        )
    )
    parsed = data.select(
        first.alias("q_subj"),
        F.when(ok, m(2)).alias("q_pred"),
        F.when(ok, m(3)).alias("_qo_iri"),
        F.when(ok, m(4)).alias("_qo_lit"),
        F.when(ok, m(5)).alias("pred"),
        F.when(ok, m(6)).alias("_o_iri"),
        F.when(ok, m(7)).alias("_o_lit"),
        *(
            [F.when(~ok, F.col(col)).alias("_corrupt_line")]
            if mode == "PERMISSIVE"
            else []
        ),
    )
    qo_iri = parsed["_qo_iri"] != ""
    o_iri = parsed["_o_iri"] != ""
    keep = (
        ["_corrupt_line"] if mode == "PERMISSIVE" else []
    )
    return parsed.select(
        "q_subj",
        "q_pred",
        F.when(qo_iri, F.col("_qo_iri"))
        .otherwise(unescape_literal(F.col("_qo_lit")))
        .alias("q_obj"),
        F.when(F.col("q_subj").isNotNull(), qo_iri).alias("q_obj_is_iri"),
        "pred",
        F.when(o_iri, F.col("_o_iri"))
        .otherwise(unescape_literal(F.col("_o_lit")))
        .alias("obj"),
        F.when(F.col("q_subj").isNotNull(), o_iri).alias("obj_is_iri"),
        *keep,
    )


def rdfstar_to_reified(ann: DataFrame) -> DataFrame:
    """Annotation rows -> reification triples over statement nodes.

    Per row: the three rdf:subject/predicate/object core triples of the
    quoted triple's content-addressed statement node, plus
    (stmt, pred, obj) for the annotation itself.  Output is distinct —
    many annotations of one quoted triple share one set of core triples,
    exactly like operators/reify.reify over a multi-qualifier row.

    Shuffle shape: dedup happens BEFORE the core explode — distinct
    quoted triples (annotation-count rows) explode to already-distinct
    core triples, and qualifier triples dedup on the un-exploded rows —
    so no exchange ever carries the 4x exploded stream (it would be the
    largest frame in the chain for exactly zero information)."""
    sid = statement_id("q_subj", "q_pred", "q_obj").alias("_sid")
    cores = (
        ann.select("q_subj", "q_pred", "q_obj")
        .distinct()
        .select(sid, "q_subj", "q_pred", "q_obj")
        .select(
            F.col("_sid").alias("subj"),
            F.explode(
                F.array(
                    F.struct(F.lit("rdf:subject").alias("p"),
                             F.col("q_subj").alias("o")),
                    F.struct(F.lit("rdf:predicate").alias("p"),
                             F.col("q_pred").alias("o")),
                    F.struct(F.lit("rdf:object").alias("p"),
                             F.col("q_obj").alias("o")),
                )
            ).alias("t"),
        )
        .select("subj", F.col("t.p").alias("pred"), F.col("t.o").alias("obj"))
    )
    # reserved-predicate contract (raises in-expression, same device as
    # ntriples' IRI guard): an annotation predicate named like a core
    # reification predicate would be indistinguishable from the
    # statement's own structure in the store — refuse it loudly rather
    # than silently merging (the pre-dedup split relies on cores and
    # qualifiers being disjoint).
    guarded_pred = F.when(
        F.col("pred").isin("rdf:subject", "rdf:predicate", "rdf:object"),
        F.raise_error(F.concat(
            F.lit("reserved reification predicate used as an annotation: "),
            F.col("pred"),
        )),
    ).otherwise(F.col("pred"))
    quals = (
        ann.select(sid, guarded_pred.alias("pred"), "obj")
        .distinct()
        .select(
            F.col("_sid").alias("subj"), "pred", "obj"
        )
    )
    return cores.unionByName(quals)


def reified_to_rdfstar(stmt_triples: DataFrame) -> DataFrame:
    """Reified store -> annotation rows (q_subj, q_pred, q_obj, pred, obj).

    One aggregation reassembles each statement node's quoted triple; one
    equi-join attaches its non-core triples as annotations.  Statements
    with no qualifier triples yield no rows (a bare reification asserts
    nothing *about* the statement), mirroring dereify's well-formedness
    drop for incomplete cores."""
    core_preds = ("rdf:subject", "rdf:predicate", "rdf:object")
    wide = (
        stmt_triples.where(F.col("pred").isin(*core_preds))
        .groupBy(F.col("subj").alias("_sid"))
        .agg(
            F.max(F.when(F.col("pred") == "rdf:subject", F.col("obj")))
            .alias("q_subj"),
            F.max(F.when(F.col("pred") == "rdf:predicate", F.col("obj")))
            .alias("q_pred"),
            F.max(F.when(F.col("pred") == "rdf:object", F.col("obj")))
            .alias("q_obj"),
        )
        .where(
            F.col("q_subj").isNotNull()
            & F.col("q_pred").isNotNull()
            & F.col("q_obj").isNotNull()
        )
    )
    quals = stmt_triples.where(~F.col("pred").isin(*core_preds))
    return (
        quals.join(wide, quals["subj"] == wide["_sid"])
        .select("q_subj", "q_pred", "q_obj", "pred", "obj")
        .distinct()
    )
