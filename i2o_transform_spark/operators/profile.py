"""Relational profiling for extracted tables: functional dependencies and
candidate keys.

A schema-mapping KG builder has to decide, per extracted relation, which
attributes identify entities (keys — they become node ids) and which
attributes are determined by them (functional dependencies — they become
single-valued properties, mergeable on conflict by election instead of
multi-valued union).  The reference encodes these decisions statically in
its per-table load discipline (primary keys and the FK/orphan checks of
MSSQL/OMOPLoader.sql:1996-2097 `omopReport`); a web-scale pipeline facing
unknown extracted tables must MINE them.  This module is the miner —
shape mining's (operators/shacl.mine_shapes) relational twin.

Semantics
---------
* :func:`mine_functional_deps` — for each candidate (lhs -> rhs) column
  pair, does lhs functionally determine rhs?  Rows with a NULL on either
  side are excluded (SQL FDs are defined over non-null projections; the
  null rate is visible in :func:`profile_keys`).  Reported per pair:

  - ``n_groups``            distinct lhs values
  - ``n_violating_groups``  lhs values mapping to >1 distinct rhs
  - ``holds``               n_violating_groups == 0
  - ``g3_confidence_ppm``   the classic g3 measure (TANE): the fraction
    of rows KEPT by the largest FD-satisfying subset — i.e. per lhs
    group keep the plurality rhs, drop the rest — as integer ppm.
    1_000_000 iff the FD holds exactly.

* :func:`profile_keys` — per column: row/non-null/distinct counts,
  ``uniqueness_ppm`` (distinct vs non-null), and ``is_key`` (no nulls,
  all distinct).  Composite candidates are profiled by passing a struct/
  concat expression under an alias.

Scale shape (10^9+-row relations)
---------------------------------
mine_functional_deps is ONE pass whatever the number of candidate pairs:
the row explodes into |pairs| (pair, lhs, rhs) tuples (constant fan-out,
no re-scan per pair), then a three-level aggregation cascade —
(pair, lhs, rhs) counts, (pair, lhs) group stats, (pair) rollup — each
level map-side combining and each strictly smaller than the last, so the
only data-scale exchange is the first, keyed on (pair, lhs): the same
cost as one groupBy on a skew-salted composite key.  A pathological lhs
(one value for the whole relation) concentrates its group on one
reducer; pairs with such lhs columns are poor FD candidates — prefilter
with :func:`profile_keys` (n_distinct must be a meaningful fraction) as
a TANE-style pruning pass.  profile_keys is one aggregation with no
grouping key (expand for the multi-column distincts) — no shuffle at
all beyond the final single-row combine per column set.  Nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_functional_deps(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Mine candidate FDs ``lhs -> rhs`` over ``df``.  ``pairs`` holds
    column-name tuples (expressions must be materialized as columns
    first).  Returns one row per pair: (lhs, rhs, n_groups,
    n_violating_groups, holds, g3_confidence_ppm) — see module
    docstring for semantics and the single-pass plan shape."""
    if not pairs:
        raise ValueError("no candidate pairs")
    structs = [
        F.struct(
            F.lit(l).alias("lhs_col"), F.lit(r).alias("rhs_col"),
            F.col(l).cast("string").alias("lhs"),
            F.col(r).cast("string").alias("rhs"),
        )
        for l, r in pairs
    ]
    exploded = (
        df.select(F.explode(F.array(*structs)).alias("_p"))
        .select("_p.lhs_col", "_p.rhs_col", "_p.lhs", "_p.rhs")
        .where(F.col("lhs").isNotNull() & F.col("rhs").isNotNull())
    )
    # level 1: the only data-scale exchange — (pair, lhs, rhs) counts
    lv1 = exploded.groupBy("lhs_col", "rhs_col", "lhs", "rhs").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # level 2: per lhs group — rows, distinct rhs, plurality-rhs rows
    lv2 = lv1.groupBy("lhs_col", "rhs_col", "lhs").agg(
        F.sum("_n").alias("_rows"),
        F.count(F.lit(1)).alias("_n_rhs"),
        F.max("_n").alias("_keep"),
    )
    # level 3: per pair rollup
    return lv2.groupBy("lhs_col", "rhs_col").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("_n_rhs") > 1).cast("long")).cast("long")
        .alias("n_violating_groups"),
        (F.sum((F.col("_n_rhs") > 1).cast("long")) == 0).alias("holds"),
        F.expr("sum(_keep) * 1000000 div sum(_rows)")
        .cast("long").alias("g3_confidence_ppm"),
    ).select(
        F.col("lhs_col").alias("lhs"), F.col("rhs_col").alias("rhs"),
        "n_groups", "n_violating_groups", "holds", "g3_confidence_ppm",
    )


def profile_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Candidate-key profile per column: (column, n_rows, n_nonnull,
    n_distinct, uniqueness_ppm, is_key).  ``uniqueness_ppm`` is distinct
    vs non-null (how repetitive the column is); ``is_key`` additionally
    requires zero nulls.  One aggregation, no grouping exchange."""
    if not cols:
        raise ValueError("no columns")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(F.count(c).cast("long").alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_nn_{c}").alias("n_nonnull"),
            F.col(f"_nd_{c}").alias("n_distinct"),
        )
        for c in cols
    ])
    return (
        row.select("n_rows", F.explode(per_col).alias("_c"))
        .select(
            F.col("_c.column").alias("column"), "n_rows",
            F.col("_c.n_nonnull").alias("n_nonnull"),
            F.col("_c.n_distinct").alias("n_distinct"),
            F.expr(
                "CASE WHEN _c.n_nonnull = 0 THEN 0 "
                "ELSE _c.n_distinct * 1000000 div _c.n_nonnull END"
            ).cast("long").alias("uniqueness_ppm"),
            ((F.col("_c.n_nonnull") == F.col("n_rows"))
             & (F.col("_c.n_distinct") == F.col("n_rows")))
            .alias("is_key"),
        )
    )


def mine_unary_inds(
    av: DataFrame,
    min_containment_ppm: int = 0,
    attr: str = "attr",
    value: str = "value",
) -> DataFrame:
    """Unary inclusion dependencies over an (attr, value) long frame —
    the foreign-key discovery step that completes the profiling trio
    (keys -> node ids, FDs -> single-valued properties, INDs -> the
    JOIN EDGES between extracted relations).  The reference declares its
    FKs statically (MSSQL/OMOPLoader.sql omopReport orphan checks); a
    schema-mapping pipeline over unknown extracted tables must mine
    which columns reference which.

    For every ordered attribute pair reports ``containment_ppm`` =
    floor(1e6 * |distinct(lhs) ∩ distinct(rhs)| / |distinct(lhs)|) —
    1_000_000 iff lhs ⊆ rhs exactly (an exact unary IND); partial
    containment survives down to ``min_containment_ppm`` (dirty webs:
    95%+ containment is still a join edge worth proposing, the rest is
    extraction noise).  NULL values are excluded (INDs are defined over
    non-null projections, same convention as the FD miner).

    Scale shape (the MIND/SPIDER aggregation recast as two hash aggs):
    distinct (attr, value) once; group by VALUE collecting the
    schema-bounded attribute set; explode ordered pairs per value (at
    most |schema|^2 per value — bounded by the schema, not the data);
    count per pair; broadcast-join per-attr distinct totals.  One
    value-keyed exchange over data that is already distinct-projected —
    the hot-value skew cap is the schema size itself."""
    pairs_per_value = (
        av.where(F.col(value).isNotNull())
        .select(F.col(attr).alias("_a"), F.col(value).alias("_v"))
        .distinct()
        .groupBy("_v")
        .agg(F.collect_set("_a").alias("_as"))
        .select(
            F.explode("_as").alias("lhs"), F.col("_as").alias("_rhss")
        )
        .select("lhs", F.explode("_rhss").alias("rhs"))
        .where(F.col("lhs") != F.col("rhs"))
        .groupBy("lhs", "rhs")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    totals = (
        av.where(F.col(value).isNotNull())
        .select(F.col(attr).alias("lhs"), F.col(value).alias("_v"))
        .distinct()
        .groupBy("lhs")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        pairs_per_value.join(F.broadcast(totals), "lhs")
        .select(
            "lhs",
            "rhs",
            F.floor(F.col("_common") * F.lit(1_000_000) / F.col("_n"))
            .cast("long")
            .alias("containment_ppm"),
        )
        .where(F.col("containment_ppm") >= F.lit(min_containment_ppm))
    )


# value-class regexes for semantic type inference; FIRST match wins, so
# classes are disjoint by construction and per-attr counts are exact.
# Order = specificity (a date is never an integer, a url never an email).
TYPE_CLASSES: list[tuple[str, str]] = [
    ("boolean", r"^(?i:true|false)$"),
    ("integer", r"^-?[0-9]+$"),
    ("decimal", r"^-?[0-9]+\.[0-9]+$"),
    ("date", r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
    ("url", r"^https?://\S+$"),
    ("email", r"^[^@\s]+@[^@\s]+\.[^@\s]+$"),
]


def classify_value(value) -> "F.Column":
    """First-match semantic class of a value Column (see TYPE_CLASSES;
    ``text`` is the fallback).  Pure expression — shared by the type
    miner and the web-table header-inference heuristic."""
    cls = F.lit("text")
    for name, rx in reversed(TYPE_CLASSES):
        cls = F.when(value.rlike(rx), F.lit(name)).otherwise(cls)
    return cls


def infer_column_types(
    av: DataFrame,
    attr: str = "attr",
    value: str = "value",
) -> DataFrame:
    """Semantic column typing over an (attr, value) long frame — which
    extracted web-table columns hold ids, dates, urls, emails — the
    third profiler after keys/FDs and INDs: a mined column that is
    integer-typed AND key-unique AND IND-contained in another table is a
    foreign key the reference would have declared in DDL.

    Per attribute reports ``n_values`` (non-null), ``elected_type`` (the
    plurality class; ``text`` is the fallback for values matching no
    class), and ``elected_ppm`` = floor(1e6 * class count / n_values).
    Election ties break to the LARGER class name (max-struct comparison,
    mirrored exactly by the oracle's ROW_NUMBER ordering).  Scale shape:
    one classification map + two hash aggregations; the class set is a
    constant, never data-sized."""
    counted = (
        av.where(F.col(value).isNotNull())
        .select(F.col(attr).alias("attr"),
                classify_value(F.col(value)).alias("_cls"))
        .groupBy("attr", "_cls")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        counted.groupBy("attr")
        .agg(
            F.sum("_cnt").alias("_n"),
            F.max(F.struct(F.col("_cnt"), F.col("_cls"))).alias("_win"),
        )
        .select(
            "attr",
            F.col("_n").cast("long").alias("n_values"),
            F.col("_win._cls").alias("elected_type"),
            F.floor(F.col("_win._cnt") * F.lit(1_000_000) / F.col("_n"))
            .cast("long")
            .alias("elected_ppm"),
        )
    )
