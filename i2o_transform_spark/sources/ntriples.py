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


def _hex4_to_char(hex4: Column) -> Column:
    """BMP codepoint (4 hex digits) -> its character, JVM-side: the hex IS
    the UTF-16BE byte pair, so unhex + decode does it with no arithmetic.
    Spec-valid input never encodes surrogate code points (RDF strings are
    Unicode scalar values), so every 4-digit UCHAR decodes standalone."""
    return F.decode(F.unhex(hex4), "UTF-16BE")


def _hex8_to_char(hex8: Column) -> Column:
    """Any codepoint (8 hex digits) -> its character: BMP codepoints take
    the 4-digit path; supplementary ones are converted to their UTF-16
    surrogate pair arithmetically, then decoded as UTF-16BE."""
    cp = F.conv(hex8, 16, 10).cast("long")
    bmp = F.unhex(F.lpad(F.hex(cp), 4, "0"))
    hi = F.lit(0xD800) + F.floor((cp - 0x10000) / 1024).cast("long")
    lo = F.lit(0xDC00) + ((cp - 0x10000) % 1024)
    supp = F.unhex(
        F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0"))
    )
    return F.decode(F.when(cp < 0x10000, bmp).otherwise(supp), "UTF-16BE")


def unescape_literal(col: Column) -> Column:
    """Exact inverse of :func:`escape_literal` for spec-valid input,
    including UCHAR numeric escapes (``\\uXXXX`` / ``\\UXXXXXXXX``) that
    externally-produced files may carry even though this writer never
    emits them (it writes UTF-8 directly).

    Splitting on the *escaped-backslash* pair first means every backslash
    remaining inside a piece introduces exactly one escape — UCHAR or
    simple ECHAR — so the chain cannot misread ``\\\\n`` (backslash + 'n')
    as a newline.  Within each piece, UCHAR introducers are consumed by a
    further split (case-sensitive ``\\U`` before ``\\u``) and the hex
    prefix of each sub-piece becomes its character; only then do the
    simple ECHAR replaces run, so they can never touch hex digits.
    ``split`` takes a Java regex, hence the doubled-backslash patterns."""
    pieces = F.split(col, "\\\\\\\\", -1)
    simple = [p for p in _ESCAPES if p[0] != "\\"]

    def _decode_uchar(piece: Column, intro: str, width: int) -> Column:
        subs = F.split(piece, "\\\\" + intro, -1)
        to_char = _hex8_to_char if width == 8 else _hex4_to_char
        return F.concat(
            F.element_at(subs, 1),
            F.array_join(
                F.transform(
                    F.slice(subs, 2, F.greatest(F.size(subs) - 1, F.lit(0))),
                    lambda p: F.concat(
                        to_char(F.substring(p, 1, width)),
                        F.substring(p, width + 1, 2_000_000_000),
                    ),
                ),
                "",
            ),
        )

    def _un(piece: Column) -> Column:
        out = _decode_uchar(piece, "U", 8)
        out = _decode_uchar(out, "u", 4)
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
    obj_datatype: str | None = None,
    obj_lang: str | None = None,
    graph: str | None = None,
) -> DataFrame:
    """Serialize (subj, pred, obj) rows to one-column ``line`` N-Triples.

    ``subj`` / ``pred`` must hold absolute IRIs (caller-validated; this
    asserts the cheap spec invariant that they contain no ``<>`` or
    whitespace via a raise-on-violation filter).  ``obj`` is written as an
    IRI where ``obj_is_iri`` (boolean column) is true, else as an escaped
    literal, optionally tagged: a non-null ``obj_datatype`` column value
    appends ``^^<dt>``, a non-null ``obj_lang`` appends ``@lang`` (LANGTAG
    grammar enforced in-expression).  RDF 1.1 allows at most one tag per
    literal and none on an IRI — violations raise inside the expression,
    never serialize wrong.

    ``graph`` names an IRI column to emit as the N-QUADS 4th term; a
    NULL graph value writes a plain triple line (the default graph, per
    the N-Quads spec), so one frame serializes a mixed quad store."""
    bad_iri = "[<>\"{}|^`\\\\ \t\n\r]"

    # The check rides inside the emitted expression (a pruned side-column
    # would be optimized away and never evaluated).
    def _iri(c: str) -> Column:
        return F.when(~F.col(c).rlike(bad_iri), F.col(c)).otherwise(
            F.raise_error(
                F.concat(F.lit("invalid IRI characters in: "), F.col(c))
            )
        )

    lit_term = F.concat(
        F.lit('"'), escape_literal(F.col(obj).cast("string")), F.lit('"')
    )
    if obj_datatype is not None or obj_lang is not None:
        dt = F.col(obj_datatype) if obj_datatype is not None else F.lit(None)
        lang = F.col(obj_lang) if obj_lang is not None else F.lit(None)
        tag = (
            F.when(
                dt.isNotNull() & lang.isNotNull(),
                F.raise_error(F.concat(
                    F.lit("literal with BOTH datatype and lang tag: "),
                    F.col(obj).cast("string"),
                )),
            )
            .when(dt.isNotNull(),
                  F.concat(F.lit("^^<"),
                           F.when(~dt.rlike(bad_iri), dt).otherwise(
                               F.raise_error(F.concat(
                                   F.lit("invalid datatype IRI: "), dt))),
                           F.lit(">")))
            .when(lang.isNotNull(),
                  F.concat(F.lit("@"),
                           F.when(
                               lang.rlike("^[A-Za-z]+(-[A-Za-z0-9]+)*$"),
                               lang,
                           ).otherwise(F.raise_error(F.concat(
                               F.lit("invalid LANGTAG: "), lang)))))
            .otherwise(F.lit(""))
        )
        lit_term = F.concat(lit_term, tag)
        # the guard must live in the IRI branch — `when` evaluates
        # lazily, so a check inside the literal branch would be dead
        # code exactly on the rows that violate
        iri_side = F.when(
            dt.isNotNull() | lang.isNotNull(),
            F.raise_error(F.concat(
                F.lit("IRI object cannot carry a literal tag: "),
                F.col(obj).cast("string"),
            )),
        ).otherwise(F.concat(F.lit("<"), F.col(obj), F.lit(">")))
    else:
        iri_side = F.concat(F.lit("<"), F.col(obj), F.lit(">"))
    obj_term = (
        lit_term
        if obj_is_iri is None
        else F.when(F.col(obj_is_iri), iri_side).otherwise(lit_term)
    )
    gterm = (
        F.lit("")
        if graph is None
        else F.when(
            F.col(graph).isNotNull(),
            F.concat(F.lit(" <"), _iri(graph), F.lit(">")),
        ).otherwise(F.lit(""))
    )
    return df.select(
        F.concat(
            F.lit("<"), _iri(subj), F.lit("> <"), _iri(pred), F.lit("> "),
            obj_term, gterm, F.lit(" ."),
        ).alias("line")
    )


# Anchored line grammar: IRI object (group 3) XOR literal object (group 4),
# the literal optionally tagged with ^^<datatype> (group 5) XOR @lang
# (group 6, spec LANGTAG grammar) — RDF 1.1 allows at most one of the two.
_LINE_RE = (
    r'^<([^>]*)> <([^>]*)> '
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
    r'(?:\^\^<([^>]*)>|@([A-Za-z]+(?:-[A-Za-z0-9]+)*))?'
    r') \.\s*$'
)

# N-Quads: the same grammar with an optional 4th IRI term (group 7)
# before the dot; its absence = the default graph.
_QUAD_RE = (
    r'^<([^>]*)> <([^>]*)> '
    r'(?:<([^>]*)>|"((?:[^"\\]|\\.)*)"'
    r'(?:\^\^<([^>]*)>|@([A-Za-z]+(?:-[A-Za-z0-9]+)*))?'
    r')(?: <([^>]*)>)? \.\s*$'
)


def parse_ntriples_lines(
    lines: DataFrame,
    col: str = "line",
    mode: str = "FAILFAST",
    keep_tags: bool = False,
    quads: bool = False,
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

    ``keep_tags=True`` appends ``obj_datatype`` / ``obj_lang`` columns
    preserving a literal's ``^^<datatype>`` / ``@lang`` tag (NULL when
    absent or the object is an IRI) — full RDF 1.1 literal fidelity for
    interchange roundtrips.  The default (False) keeps the 4-column
    schema and documents the loss: tags are accepted by the grammar but
    dropped, which is the right mode when downstream stores hold plain
    lexical forms (operators/sparql's documented store convention).

    ``quads=True`` parses the N-Quads grammar instead: an optional 4th
    IRI term lands in a ``graph`` column (NULL = the default graph).

    Comment/blank lines are dropped first per spec."""
    if mode not in ("FAILFAST", "PERMISSIVE"):
        raise ValueError(f"mode must be FAILFAST or PERMISSIVE, got {mode!r}")
    rx = _QUAD_RE if quads else _LINE_RE
    data = lines.where(
        ~F.col(col).rlike(r"^\s*(#|$)")
    )
    m = lambda g: F.regexp_extract(F.col(col), rx, g)  # noqa: E731

    def _tag_cols(is_lit) -> list:
        if not keep_tags:
            return []
        return [
            F.when(is_lit & (F.col("_dt") != ""), F.col("_dt"))
            .alias("obj_datatype"),
            F.when(is_lit & (F.col("_lang") != ""), F.col("_lang"))
            .alias("obj_lang"),
        ]

    def _graph_cols(ok_row) -> list:
        if not quads:
            return []
        return [
            F.when(ok_row & (F.col("_g") != ""), F.col("_g")).alias("graph")
        ]

    if mode == "PERMISSIVE":
        ok = F.col(col).rlike(rx)
        parsed = data.select(
            F.when(ok, m(1)).alias("subj"),
            F.when(ok, m(2)).alias("pred"),
            F.when(ok, m(3)).alias("_obj_iri"),
            F.when(ok, m(4)).alias("_obj_lit"),
            F.when(ok, m(5)).alias("_dt"),
            F.when(ok, m(6)).alias("_lang"),
            *([F.when(ok, m(7)).alias("_g")] if quads else []),
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
            *_tag_cols(F.col("subj").isNotNull() & ~is_iri),
            *_graph_cols(F.col("subj").isNotNull()),
            "_corrupt_line",
        )
    parsed = data.select(
        F.when(
            F.col(col).rlike(rx), m(1)
        ).otherwise(
            F.raise_error(F.concat(F.lit("malformed N-Triples line: "),
                                   F.col(col)))
        ).alias("subj"),
        m(2).alias("pred"),
        m(3).alias("_obj_iri"),
        m(4).alias("_obj_lit"),
        m(5).alias("_dt"),
        m(6).alias("_lang"),
        *([m(7).alias("_g")] if quads else []),
    )
    is_iri = parsed["_obj_iri"] != ""
    return parsed.select(
        "subj",
        "pred",
        F.when(is_iri, F.col("_obj_iri"))
        .otherwise(unescape_literal(F.col("_obj_lit")))
        .alias("obj"),
        is_iri.alias("obj_is_iri"),
        *_tag_cols(~is_iri),
        *_graph_cols(F.lit(True)),
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
