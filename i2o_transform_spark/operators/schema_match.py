"""Instance-based schema matching: value-overlap column correspondences.

The crosswalk the reference ships as static mapping tables (its i2b2->OMOP
column correspondences are hand-maintained configuration,
MSSQL/OMOPLoader.sql's per-table SELECT column lists) is exactly what a
web-scale schema-mapping KG builder must DISCOVER: given two extracted
relations with unknown headers, which column of one corresponds to which
column of the other?  The classic instance-based signal (Rahm & Bernstein's
schema-matching survey, VLDB J. 2001 — public literature) is value-domain
overlap: two columns that draw from the same value set almost surely denote
the same attribute, whatever their names.  This module mines that signal;
its output ranks candidate correspondences that feed the same broadcast
crosswalk joins the mapped pipeline already runs.

Semantics
---------
:func:`match_schemas` compares every column pair (one from each side) over
DISTINCT non-null lexical forms (values are cast to string — instance
matching is over lexical domains; the ``kind_*`` columns recover the type
signal).  Per pair with at least one shared value:

* ``n_left`` / ``n_right``     distinct non-null values per column
* ``n_shared``                 |V_left ∩ V_right|
* ``jaccard_ppm``              |∩| / |∪| as integer ppm
* ``contain_left_ppm``         |∩| / |V_left|  (right covers left)
* ``contain_right_ppm``        |∩| / |V_right| (left covers right)
* ``kind_left`` / ``kind_right`` majority lexical kind of the column's
  distinct values (``int`` / ``dec`` / ``date`` / ``text``; ties to the
  lexicographically smallest kind), plus ``kind_match``
* ``rank``                     1 = best right-column candidate for this
  left column, ordered by jaccard desc then right_col (total order)

Zero-overlap pairs are NOT emitted (they fall out of the value join, and
emitting |cols_L| x |cols_R| empty rows would be a cross join for nothing);
callers treat absence as "no correspondence".  Pre-normalize (trim/lower/
unit-strip) before calling if the domains need it — normalization policy
is the caller's, visibility into raw overlap is this operator's.

Scale shape (10^9-row relations)
--------------------------------
One melt per side (constant column fan-out via a single explode — no
re-scan per column) into (col, value), deduped by ONE exchange keyed on
(col, value) with map-side combine; the correspondence join is keyed on
the VALUE alone, so a hot lexical form ("0", "USA") fans out to at most
|cols_L| x |cols_R| rows per value — bounded by the schema sizes, never by
the data; the (left_col, right_col) rollup and the per-column stats frames
are schema-sized and broadcast back onto the pair frame.  Nothing collects
to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_INT_RE = "^-?[0-9]+$"
_DEC_RE = "^-?[0-9]+\\.[0-9]+$"
_DATE_RE = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"


def _kind(value):
    return (
        F.when(value.rlike(_INT_RE), F.lit("int"))
        .when(value.rlike(_DEC_RE), F.lit("dec"))
        .when(value.rlike(_DATE_RE), F.lit("date"))
        .otherwise(F.lit("text"))
    )


def _melt(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, value) over distinct non-null stringified values — one explode
    (constant fan-out |cols|), one distinct exchange keyed (col, value)."""
    pairs = F.array(*[
        F.struct(F.lit(c).alias("col"),
                 F.col(c).cast("string").alias("value"))
        for c in cols
    ])
    return (
        df.select(F.explode(pairs).alias("p"))
        .select("p.col", "p.value")
        .where(F.col("value").isNotNull())
        .distinct()
    )


def _col_stats(vals: DataFrame) -> DataFrame:
    """Per column: distinct-value count + majority lexical kind (ties to
    the lexicographically smallest kind) — schema-sized output."""
    kinds = (
        vals.select("col", _kind(F.col("value")).alias("kind"))
        .groupBy("col", "kind")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("col").orderBy(F.col("c").desc(), F.col("kind"))
    major = (
        kinds.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("col", "kind")
    )
    n = vals.groupBy("col").agg(F.count(F.lit(1)).alias("n"))
    return n.join(major, "col")


def match_schemas(
    left: DataFrame,
    right: DataFrame,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """Rank value-overlap correspondences between ``left`` and ``right``
    columns; see module docstring for the emitted columns and semantics."""
    lc = left_cols or list(left.columns)
    rc = right_cols or list(right.columns)
    lv = _melt(left, lc)
    rv = _melt(right, rc)
    shared = (
        lv.withColumnRenamed("col", "left_col")
        .join(rv.withColumnRenamed("col", "right_col"), "value")
        .groupBy("left_col", "right_col")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ls = _col_stats(lv).select(
        F.col("col").alias("left_col"),
        F.col("n").alias("n_left"),
        F.col("kind").alias("kind_left"),
    )
    rs = _col_stats(rv).select(
        F.col("col").alias("right_col"),
        F.col("n").alias("n_right"),
        F.col("kind").alias("kind_right"),
    )
    out = (
        shared.join(F.broadcast(ls), "left_col")
        .join(F.broadcast(rs), "right_col")
    )
    rank_w = Window.partitionBy("left_col").orderBy(
        F.col("jaccard_ppm").desc(), F.col("right_col")
    )
    return (
        out.select(
            "left_col",
            "right_col",
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            F.col("n_shared").cast("long").alias("n_shared"),
            F.expr(
                "n_shared * 1000000 div (n_left + n_right - n_shared)"
            ).alias("jaccard_ppm"),
            F.expr("n_shared * 1000000 div n_left")
            .alias("contain_left_ppm"),
            F.expr("n_shared * 1000000 div n_right")
            .alias("contain_right_ppm"),
            "kind_left",
            "kind_right",
            (F.col("kind_left") == F.col("kind_right")).alias("kind_match"),
        )
        .withColumn("rank", F.row_number().over(rank_w).cast("long"))
    )
