"""Statement reification — qualified assertions as first-class nodes.

Web KGs need statements ABOUT statements (Wikidata qualifiers, RDF-star,
n-ary relations): "order O contains part P" *with quantity 17 on line 3*.
The reference models this relationally (modifier columns riding on fact
rows, MSSQL/OMOPLoader.sql modifier joins); a triple store must REIFY:
mint a statement node per (subj, pred, obj) assertion and hang the
qualifiers off it.

Statement ids are content-addressed — ``md5(subj|pred|obj)`` with an
escape-free separator contract (see :data:`SEP`) — the same determinism
device as functions/hashing.content_id: ids agree across engines, runs,
partitionings, and cluster sizes, so the DuckDB oracle re-derives them
and incremental loads re-mint identical ids (dedup by id = dedup by
content).

Scale shape: reification is a pure map (one md5 + explode per assertion,
zero shuffle); de-reification groups the 3 core triples of each statement
back together — ONE map-side-combining aggregation keyed on the statement
id.  Qualifier fan-out is bounded by the qualifier count per assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # US control char: forbidden in node ids by contract


def statement_id(subj, pred, obj):
    """Content-addressed statement node id."""
    return F.md5(
        F.concat_ws(SEP, F.col(subj), F.col(pred), F.col(obj))
    )


def reify(
    assertions: DataFrame,
    qualifier_cols: list[str],
) -> DataFrame:
    """(subj, pred, obj, q1, q2, ...) -> reified triple stream:

    per assertion, four core triples — (stmt, 'rdf:subject', subj),
    ('rdf:predicate', pred), ('rdf:object', obj) — plus one
    (stmt, qualifier_name, qualifier_value) per non-null qualifier
    column.  Output: (subj, pred, obj) triples over statement nodes."""
    sid = statement_id("subj", "pred", "obj").alias("_sid")
    base = assertions.select(
        sid, "subj", "pred", "obj",
        *[F.col(c).cast("string").alias(c) for c in qualifier_cols],
    )
    core = base.select(
        "_sid",
        F.explode(
            F.array(
                F.struct(F.lit("rdf:subject").alias("p"),
                         F.col("subj").alias("o")),
                F.struct(F.lit("rdf:predicate").alias("p"),
                         F.col("pred").alias("o")),
                F.struct(F.lit("rdf:object").alias("p"),
                         F.col("obj").alias("o")),
                *[
                    F.struct(F.lit(c).alias("p"), F.col(c).alias("o"))
                    for c in qualifier_cols
                ],
            )
        ).alias("t"),
    )
    return (
        core.where(F.col("t.o").isNotNull())
        .select(
            F.col("_sid").alias("subj"),
            F.col("t.p").alias("pred"),
            F.col("t.o").alias("obj"),
        )
        .distinct()
    )


def dereify(stmt_triples: DataFrame) -> DataFrame:
    """Invert :func:`reify`'s core triples: statement nodes back to plain
    (subj, pred, obj) assertions (qualifiers drop — they have nowhere to
    live on a plain triple).  One aggregation keyed on the statement id;
    statements missing any of the three core triples are dropped (they
    are not well-formed reifications)."""
    core = stmt_triples.where(
        F.col("pred").isin("rdf:subject", "rdf:predicate", "rdf:object")
    )
    wide = core.groupBy(F.col("subj").alias("_sid")).agg(
        F.max(F.when(F.col("pred") == "rdf:subject", F.col("obj")))
        .alias("subj"),
        F.max(F.when(F.col("pred") == "rdf:predicate", F.col("obj")))
        .alias("pred"),
        F.max(F.when(F.col("pred") == "rdf:object", F.col("obj")))
        .alias("obj"),
    )
    return (
        wide.where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        .select("subj", "pred", "obj")
        .distinct()
    )
