"""HTML ``<table>`` extraction — the web-tables feedstock.

Relational data on the web overwhelmingly ships as HTML tables
(Cafarella's WebTables line of work), and a schema-mapping KG builder
mines them for the entity/attribute relations the reference gets as
clean source tables.  This source turns a crawl frame's ``html`` column
into a long cell frame ``(table_idx, row_idx, col_idx, is_header,
cell)`` per input row — the shape the relational profilers
(operators/profile: keys, FDs, unary INDs, type inference) consume
directly.

Implementation is JVM-only (regexp_extract_all + posexplode + entity
unescape): the html string never crosses into Python, the walk is
whole-stage-codegen'd, and the explode fan-out is bounded by cells per
page.  Scale shape: pure map + two posexplodes, zero shuffle.

Scope (documented): non-nested tables.  An inner ``<table>`` inside a
cell would end the non-greedy outer match early; real extraction
pipelines treat layout-nested tables as layout, not data.  Rows whose
cells are ragged (colspan tricks, missing ``</td>``) parse to however
many cells the grammar finds — the profilers' null handling absorbs
short rows; ``colspan`` widths are NOT expanded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (?i): real crawl HTML mixes tag case (<TABLE>, <Tr>); matching is
# case-insensitive throughout.  The optional attribute group requires a
# whitespace separator — ``<th(?:\s[^>]*)?>`` — so <thead>/<track> can
# never false-start a <th>/<tr> match.
_TABLE_RE = r"(?si)<table(?:\s[^>]*)?>(.*?)</table\s*>"
_ROW_RE = r"(?si)<tr(?:\s[^>]*)?>(.*?)</tr\s*>"
_CELL_RE = r"(?si)<t[dh](?:\s[^>]*)?>(.*?)</t[dh]\s*>"
_TH_START_RE = r"(?i)<th[\s>]"


def _clean_cell(c: Column) -> Column:
    """Strip nested markup and decode the five XML entities (amp last,
    so ``&amp;lt;`` decodes to the literal ``&lt;`` — same discipline as
    sources/sitemap)."""
    txt = F.trim(F.regexp_replace(c, r"<[^>]+>", ""))
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return txt


def extract_tables(
    pages: DataFrame,
    html: str = "html",
    keep: list[str] | None = None,
) -> DataFrame:
    """Pages -> one row per table cell.

    Output: ``keep`` columns (e.g. the url) + ``table_idx`` /
    ``row_idx`` / ``col_idx`` (0-based document order) + ``is_header``
    (the cell sits in a row containing any ``<th``) + ``cell`` (tag-
    stripped, entity-decoded text)."""
    keep = keep or []
    h = F.col(html).cast("string")
    tables = pages.select(
        *keep,
        F.posexplode(F.regexp_extract_all(h, F.lit(_TABLE_RE), F.lit(1)))
        .alias("table_idx", "_tbody"),
    )
    rows = tables.select(
        *keep,
        "table_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_tbody"), F.lit(_ROW_RE), F.lit(1))
        ).alias("row_idx", "_trow"),
    )
    return rows.select(
        *keep,
        "table_idx",
        "row_idx",
        F.posexplode(
            F.regexp_extract_all(F.col("_trow"), F.lit(_CELL_RE), F.lit(1))
        ).alias("col_idx", "_cell"),
        F.col("_trow").rlike(_TH_START_RE).alias("is_header"),
    ).select(
        *keep,
        "table_idx",
        "row_idx",
        "col_idx",
        "is_header",
        _clean_cell(F.col("_cell")).alias("cell"),
    )


def tables_to_attr_values(
    cells: DataFrame, keep: list[str] | None = None
) -> DataFrame:
    """Cell frame -> (attr, value) long frame for the profilers.

    The attribute name of a data cell is its column's elected header:
    the first header-row cell in the same (page, table, column).  Tables
    with no header row contribute nothing (an anonymous column is not an
    attribute — the honest drop, visible as a count delta).  One
    window-free aggregation (min header row per column) + one equi-join,
    both keyed on the (page, table, col) triple the explode already
    produced — no extra exchange beyond the join."""
    keep = keep or []
    key = [*keep, "table_idx", "col_idx"]
    headers = (
        cells.where(F.col("is_header"))
        .groupBy(*key)
        .agg(F.min_by("cell", "row_idx").alias("attr"))
    )
    data = cells.where(~F.col("is_header"))
    return data.join(headers, key).select(
        *keep, "table_idx", "attr", F.col("cell").alias("value")
    )


def infer_headers(
    cells: DataFrame,
    keep: list[str] | None = None,
    min_rows: int = 3,
) -> DataFrame:
    """Elect row 0 as the header of HEADERLESS tables by type contrast —
    the classic WebTables recovery heuristic for pages that mark headers
    with styling instead of ``<th>``.

    A headerless table's row 0 is promoted iff (a) the table has at
    least ``min_rows`` rows (1-2 row tables carry no evidence), and
    (b) for a MAJORITY of its columns the semantic class of the row-0
    cell (profile.classify_value) differs from the plurality class of
    the column's remaining cells — "Price" above a column of decimals
    votes yes; a text cell above text contributes nothing, so all-text
    layout tables are left alone.  Tables that already contain any
    ``<th>`` row pass through untouched.

    Output: same schema, with ``is_header`` rewritten on promoted rows.
    Scale shape: two hash aggregations keyed on the (page, table[, col])
    ids the walker already produced + one broadcast-scale join of the
    per-table verdicts — no window over the data."""
    from i2o_transform_spark.operators.profile import classify_value

    keep = keep or []
    tkey = [*keep, "table_idx"]
    ckey = [*tkey, "col_idx"]
    has_th = cells.groupBy(*tkey).agg(
        F.max(F.col("is_header").cast("int")).alias("_has_th"),
        (F.max("row_idx") + 1).alias("_n_rows"),
    )
    classed = cells.withColumn("_cls", classify_value(F.col("cell")))
    body_major = (
        classed.where(F.col("row_idx") > 0)
        .groupBy(*ckey, "_cls")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(*ckey)
        .agg(F.max(F.struct(F.col("_cnt"), F.col("_cls"))).alias("_w"))
        .select(*ckey, F.col("_w._cls").alias("_body_cls"))
    )
    head_cls = classed.where(F.col("row_idx") == 0).select(
        *ckey, F.col("_cls").alias("_head_cls")
    )
    verdict = (
        head_cls.join(body_major, ckey)
        .groupBy(*tkey)
        .agg(
            (
                F.sum(
                    (F.col("_head_cls") != F.col("_body_cls")).cast("int")
                )
                * 2
                > F.count(F.lit(1))
            ).alias("_contrast")
        )
    )
    flags = has_th.join(verdict, tkey, "left").select(
        *tkey,
        (
            (F.col("_has_th") == 0)
            & (F.col("_n_rows") >= F.lit(min_rows))
            & F.coalesce(F.col("_contrast"), F.lit(False))
        ).alias("_promote"),
    )
    return cells.join(F.broadcast(flags), tkey).select(
        *keep,
        "table_idx",
        "row_idx",
        "col_idx",
        (F.col("is_header") | (F.col("_promote") & (F.col("row_idx") == 0)))
        .alias("is_header"),
        "cell",
    )


def tables_to_triples(
    cells: DataFrame,
    keep: list[str] | None = None,
    key_col: int = 0,
) -> DataFrame:
    """Cell frame -> (subj, pred, obj) triples: each data row becomes an
    entity keyed by its ``key_col`` cell, each other column a property —
    the web-table-to-KG emission step (the reference's per-table load
    maps source rows to fact rows the same way, MSSQL/OMOPLoader.sql).

    ``key_col`` names the subject column explicitly (callers elect it
    with profile_keys' uniqueness report when it is not the conventional
    leftmost column).  Tables without a header row emit nothing, like
    tables_to_attr_values.  Scale shape: the header election aggregation
    plus TWO equi-joins, all keyed on the walker's own (page, table[,
    row/col]) ids — the join key is already co-partitioned with the
    explode output."""
    keep = keep or []
    ckey = [*keep, "table_idx", "col_idx"]
    rkey = [*keep, "table_idx", "row_idx"]
    headers = (
        cells.where(F.col("is_header"))
        .groupBy(*ckey)
        .agg(F.min_by("cell", "row_idx").alias("pred"))
    )
    data = cells.where(~F.col("is_header"))
    subjects = data.where(F.col("col_idx") == key_col).select(
        *rkey, F.col("cell").alias("subj")
    )
    return (
        data.where(F.col("col_idx") != key_col)
        .join(headers, ckey)
        .join(subjects, rkey)
        .select("subj", "pred", F.col("cell").alias("obj"))
    )


STITCH_SEP = "\x1f"  # control char: forbidden in header text by contract


def stitch_tables(
    cells: DataFrame, keep: list[str] | None = None
) -> DataFrame:
    """Group extracted tables by header-schema fingerprint — WebTables
    'stitching': the same listing template repeated across thousands of
    pages is ONE relation, and union-compatible tables are found by
    exact header-signature match, not pairwise comparison.

    Per fingerprint reports ``schema_sig`` (header cells in column
    order, ``\\x1f``-joined), ``fingerprint`` (md5 — content-addressed,
    so two crawls agree), ``n_tables``, and ``n_rows`` (data rows
    summed).  Scale shape: one per-table header assembly (hash agg over
    sorted structs), one per-table row count, one fingerprint-keyed
    aggregation — table-count-sized, never cell-sized, after the first
    two aggs."""
    keep = keep or []
    tkey = [*keep, "table_idx"]
    first_hdr = (
        cells.where(F.col("is_header"))
        .groupBy(*tkey)
        .agg(F.min("row_idx").alias("_hr"))
    )
    hdr_cells = cells.join(first_hdr, tkey).where(
        F.col("is_header") & (F.col("row_idx") == F.col("_hr"))
    )
    schema_per_table = hdr_cells.groupBy(*tkey).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("col_idx", "cell"))),
                lambda s: s["cell"],
            ),
            STITCH_SEP,
        ).alias("schema_sig")
    )
    rows_per_table = (
        cells.where(~F.col("is_header"))
        .groupBy(*tkey)
        .agg(F.countDistinct("row_idx").alias("_nr"))
    )
    return (
        schema_per_table.join(rows_per_table, tkey, "left")
        .groupBy("schema_sig")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tables"),
            F.sum(F.coalesce(F.col("_nr"), F.lit(0)))
            .cast("long")
            .alias("n_rows"),
        )
        .select(
            F.md5(F.col("schema_sig")).alias("fingerprint"),
            "schema_sig",
            "n_tables",
            "n_rows",
        )
    )


def extract_attr_values(
    pages: DataFrame,
    html: str = "html",
    keep: list[str] | None = None,
) -> DataFrame:
    """Pages -> (attr, value) pairs in ONE map pass — zero shuffle.

    ``extract_tables`` + ``tables_to_attr_values`` is the composable
    path, but its header join re-shuffles EVERY data cell on the
    (page, table, col) key — at crawl scale that exchange is the whole
    cost (measured: 0.45 scaling efficiency 4->16, dev/wt_scale_demo).
    Here the header map rides INSIDE the first generator, so the pairs
    stream out of a Generate chain with no exchange at all.

    The load-bearing trick (measured, see dev/wt_scale_demo.py): the
    per-table header map MUST be packed into the generator expression
    itself — ``explode(array(struct(th_cells, rows)))`` — because
    Catalyst evaluates a select's non-generator sibling expressions
    AFTER the Generate, once per OUTPUT row; a header expression left
    as a sibling re-runs its regex over the full table body per data
    row (quadratic in table size: 86s vs 0.3s on twenty 450 KB
    tables).  Packing also drops the table body immediately, so no
    downstream projection can re-derive from it.

    Row-identical to the composable path — pytest-pinned — including
    ragged rows (cells beyond the headers drop), entity decode,
    headerless tables (emit nothing), and MULTI-header-row tables: the
    per-column election (first header row covering that column, mixed
    <td>/<th> cells of a header row both count — exactly
    ``tables_to_attr_values``'s min-row-per-column semantics) runs as a
    nested transform/filter over the header-row arrays INSIDE the same
    packed struct, so grouped-header layouts no longer need the
    header-join path."""
    keep = keep or []
    h = F.col(html).cast("string")
    tables = pages.select(
        *keep,
        F.posexplode(F.regexp_extract_all(h, F.lit(_TABLE_RE), F.lit(1)))
        .alias("table_idx", "_tbody"),
    )
    rows_arr = F.regexp_extract_all(
        F.col("_tbody"), F.lit(_ROW_RE), F.lit(1)
    )

    def _is_th(r):
        return r.rlike(_TH_START_RE)

    # per-column header election in THREE chained packed generators, each
    # evaluated once per table.  Interpreted HOF trees get NO
    # common-subexpression elimination, so every reuse must go through a
    # materialized struct field: gen0 materializes the row array (one
    # row-regex pass — as a struct sibling it would be evaluated twice),
    # gen1 materializes the header rows' cell arrays from the field
    # (rlike + cell regex run exactly once — an election referencing the
    # raw chain would re-run the regexes PER COLUMN: measured 2.6x),
    # and gen2 elects from the materialized ``hc`` field, where every
    # access is O(1): for column c, the c-th cell of the FIRST header
    # row wide enough to cover it — min-header-row-per-column, the
    # composable election.  Net overhead vs the flat single-header-only
    # th regex: 5% on the demo corpus.
    gen0 = tables.select(
        *keep,
        "table_idx",
        F.explode(F.array(F.struct(rows_arr.alias("rs")))).alias("_r"),
    )
    rs0 = F.col("_r.rs")
    hdr_cells_expr = F.transform(
        F.filter(rs0, _is_th),
        lambda r: F.regexp_extract_all(r, F.lit(_CELL_RE), F.lit(1)),
    )
    packed1 = gen0.select(
        *keep,
        "table_idx",
        F.explode(
            F.array(F.struct(hdr_cells_expr.alias("hc"), rs0.alias("rs")))
        ).alias("_p"),
    )
    hc = F.col("_p.hc")
    n_cols = F.array_max(F.transform(hc, F.size))
    attrs = F.transform(
        F.sequence(F.lit(0), n_cols - 1),
        # F.get, not element_at: null-safe on the no-covering-row case
        # (ANSI mode errors element_at on an empty array)
        lambda c: F.get(
            F.get(F.filter(hc, lambda a: F.size(a) > c), F.lit(0)), c
        ),
    )
    packed = packed1.select(
        *keep,
        "table_idx",
        F.explode(
            F.array(F.struct(attrs.alias("h"), F.col("_p.rs").alias("rs")))
        ).alias("_t"),
    )
    with_rows = packed.select(
        *keep, "table_idx", F.col("_t.h").alias("_attrs"),
        F.explode("_t.rs").alias("_trow"),
    ).where(~_is_th(F.col("_trow")))
    cells = with_rows.select(
        *keep,
        "table_idx",
        "_attrs",
        F.posexplode(
            F.regexp_extract_all(F.col("_trow"), F.lit(_CELL_RE), F.lit(1))
        ).alias("col_idx", "_cell"),
    )
    # per-cell attribute lookup is a plain GetArrayItem against the
    # small header array (null out-of-bounds = uncovered column, drops)
    return (
        cells.select(
            *keep, "table_idx",
            _clean_cell(F.get(F.col("_attrs"), F.col("col_idx")))
            .alias("attr"),
            _clean_cell(F.col("_cell")).alias("value"),
        )
        .where(F.col("attr").isNotNull())
    )
