"""N-Triples (W3C RDF 1.1) sink + source — the KG interchange format.

The reference materializes its mapped output into warehouse tables
(MSSQL/OMOPLoader.sql per-table INSERT loads); a web-scale KG additionally
needs a *portable* serialization so emitted (subj, pred, obj) triples can be
exchanged with external graph stores (Jena/Virtuoso/Neptune bulk loaders all
ingest N-Triples).  N-Triples is line-oriented — exactly one triple per
line — which makes it the one RDF format that is trivially splittable and
therefore the right 100 TB choice: ``spark.read.text`` gives line-level
parallelism with no record-boundary scanning, and the writer is a plain
partitioned text sink.

Everything here is JVM-side column expressions (concat / regexp_extract /
higher-order functions) — zero Python in the row path:

* serialization escapes literals per the spec's ECHAR set
  (``\\ \" \n \r \t \b \f``) with an ordered replace chain
  (backslash FIRST, so later escapes never double-escape),
* parsing splits lines with a single anchored regex (IRI object vs literal
  object alternatives) and un-escapes literals exactly:
  split on ``\\\\`` first (so escaped backslashes can never be confused
  with escape introducers), per-piece replace of the simple escapes via
  ``transform``, then ``array_join`` with a single backslash.  This is the
  standard two-level unescape trick made lazy/vectorized — correct for any
  spec-valid line, not just ones this writer produced.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ECHAR escape table, serialization order: backslash must come first.
_ESCAPES: list[tuple[str, str]] = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
    ("\b", "\\b"),
    ("\f", "\\f"),
]


def escape_literal(col: Column) -> Column:
    """Escape a string column per N-Triples STRING_LITERAL_QUOTE rules."""
    out = col
    for raw, esc in _ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def unescape_literal(col: Column) -> Column:
    """Exact inverse of :func:`escape_literal` for spec-valid input.

    Splitting on the *escaped-backslash* pair first means every backslash
    remaining inside a piece introduces exactly one simple escape, so the
    per-piece replace chain cannot misread ``\\\\n`` (backslash + 'n') as a
    newline.  ``split`` takes a Java regex, hence the 4-backslash pattern
    (two escaped backslashes)."""
    pieces = F.split(col, "\\\\\\\\", -1)
    simple = [p for p in _ESCAPES if p[0] != "\\"]

    def _un(piece: Column) -> Column:
        out = piece
        for raw, esc in simple:
            out = F.replace(out, F.lit(esc), F.lit(raw))
        return out

    return F.array_join(F.transform(pieces, _un), "\\")


def to_ntriples_lines(
    df: DataFrame,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
    obj_is_iri: str | None = None,
) -> DataFrame:
    """Serialize (subj, pred, obj) rows to one-column ``line`` N-Triples.

    ``subj`` / ``pred`` must hold absolute IRIs (caller-validated; this
    asserts the cheap spec invariant that they contain no ``<>`` or
    whitespace via a raise-on-violation filter).  ``obj`` is written as an
    IRI where ``obj_is_iri`` (boolean column) is true, else as an escaped
    plain literal."""
    bad_iri = "[<>\"{}|^`\\\\ \t\n\r]"

    # The check rides inside the emitted expression (a pruned side-column
    # would be optimized away and never evaluated).
    def _iri(c: str) -> Column:
        return F.when(~F.col(c).rlike(bad_iri), F.col(c)).otherwise(
            F.raise_error(
                F.concat(F.lit("invalid IRI characters in: "), F.col(c))
            )
        )
    obj_term = (
        F.concat(F.lit('"'), escape_literal(F.col(obj).cast("string")),
                 F.lit('"'))
        if obj_is_iri is None
        else F.when(
            F.col(obj_is_iri),
            F.concat(F.lit("<"), F.col(obj), F.lit(">")),
        ).otherwise(
            F.concat(F.lit('"'), escape_literal(F.col(obj).cast("string")),
                     F.lit('"'))
        )
    )
    return df.select(
        F.concat(
            F.lit("<"), _iri(subj), F.lit("> <"), _iri(pred), F.lit("> "),
            obj_term, F.lit(" ."),
        ).alias("line")
    )


# Anchored line grammar: IRI object (group 3) XOR literal object (group 4);
# an optional ^^<datatype> suffix is accepted and ignored.
_LINE_RE = (
    r'^<([^>]*)> <([^>]*)> (?:<([^>]*)>|"((?:[^"\\]|\\.)*)")'
    r"(?:\^\^<[^>]*>)? \.\s*$"
)


def parse_ntriples_lines(
    lines: DataFrame, col: str = "line", mode: str = "FAILFAST"
) -> DataFrame:
    """Parse N-Triples lines -> (subj, pred, obj, obj_is_iri).

    ``mode`` mirrors Spark's datasource semantics:

    * ``FAILFAST`` (default) — a malformed line (no grammar match) raises,
      so silent data loss is impossible;
    * ``PERMISSIVE`` — malformed lines are emitted with NULL parse columns
      and the offending raw text in ``_corrupt_line`` (well-formed rows
      carry NULL there), so a 10^12-line crawl ingest routes junk to a
      quarantine (``WHERE _corrupt_line IS NOT NULL``) instead of dying
      at line 10^11.  Same single anchored-regex pass either way.

    Comment/blank lines are dropped first per spec."""
    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    data = lines.where(
        ~F.col(col).rlike(r"^\s*(#|$)")
    )
    m = lambda g: F.regexp_extract(F.col(col), _LINE_RE, g)  # noqa: E731
    if mode == "PERMISSIVE":
        ok = F.col(col).rlike(_LINE_RE)
        parsed = data.select(
            F.when(ok, m(1)).alias("subj"),
            F.when(ok, m(2)).alias("pred"),
            F.when(ok, m(3)).alias("_obj_iri"),
            F.when(ok, m(4)).alias("_obj_lit"),
            F.when(~ok, F.col(col)).alias("_corrupt_line"),
        )
        is_iri = parsed["_obj_iri"] != ""
        return parsed.select(
            "subj",
            "pred",
            F.when(is_iri, F.col("_obj_iri"))
            .otherwise(unescape_literal(F.col("_obj_lit")))
            .alias("obj"),
            F.when(F.col("subj").isNotNull(), is_iri).alias("obj_is_iri"),
            "_corrupt_line",
        )
    parsed = data.select(
        F.when(
            F.col(col).rlike(_LINE_RE), m(1)
        ).otherwise(
            F.raise_error(F.concat(F.lit("malformed N-Triples line: "),
                                   F.col(col)))
        ).alias("subj"),
        m(2).alias("pred"),
        m(3).alias("_obj_iri"),
        m(4).alias("_obj_lit"),
    )
    is_iri = parsed["_obj_iri"] != ""
    return parsed.select(
        "subj",
        "pred",
        F.when(is_iri, F.col("_obj_iri"))
        .otherwise(unescape_literal(F.col("_obj_lit")))
        .alias("obj"),
        is_iri.alias("obj_is_iri"),
    )


def write_ntriples(df: DataFrame, path: str, **kwargs) -> None:
    """Materialize serialized lines as a partitioned ``.nt`` text dataset.

    One output file per partition — at crawl scale the caller sizes
    partitions upstream (repartition on subj hash keeps a bulk loader's
    per-file dedup window warm)."""
    to_ntriples_lines(df, **kwargs).write.mode("overwrite").text(path)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Line-parallel N-Triples scan: spark.read.text + the JVM parse above."""
    return parse_ntriples_lines(spark.read.text(path), col="value")
