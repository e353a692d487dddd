"""Interval/era merge — SURVEY.md §2.5 W1, the reference's most sophisticated
operator (condition_era / drug_era, MSSQL/OMOPLoader.sql:1508-1630).

Semantics: per (entity, concept), collapse overlapping-or-near intervals
(gap <= ``gap_days``) into eras.  The reference uses the OHDSI event-flip
algorithm (start events -1 / padded end events +1, running MAX of start
ordinal, 2*start_ord - overall_ord = 0 marks chain closers).  A gaps-and-
islands formulation computes the identical result with half the window
passes, so that is what we implement:

    island_start = start > running_max(previous ends) + gap
    era_id       = running count of island_start flags
    era          = groupBy(era_id) -> min(start), max(end), count

Two window passes over data sorted once per (entity, concept) partition —
one shuffle total, scales linearly; no self-join, no range join (J7 avoided,
MSSQL/OMOPLoader.sql:1546).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    df: DataFrame,
    partition_cols: list[str],
    start_col: str = "start_date",
    end_col: str = "end_date",
    gap_days: int = 30,
) -> DataFrame:
    """Merge per-partition intervals whose gap <= ``gap_days`` into eras.

    Returns one row per era: partition cols + era_start, era_end,
    era_count (number of source intervals merged — the reference's
    *_occurrence_count, MSSQL/OMOPLoader.sql:1556-1563).
    Null end dates are treated as end=start (single-day interval,
    matching COALESCE at MSSQL/OMOPLoader.sql:1530-1531).
    """
    start = F.to_date(F.col(start_col))
    end = F.coalesce(F.to_date(F.col(end_col)), start)

    projected = df.select(
        *partition_cols,
        start.alias("_start"),
        end.alias("_end"),
    )
    w_order = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col("_start").asc(), F.col("_end").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_flag = projected.withColumn(
        "_new_era",
        F.when(
            F.col("_start")
            > F.date_add(F.max(F.col("_end")).over(w_order), gap_days),
            1,
        ).otherwise(
            F.when(F.max(F.col("_end")).over(w_order).isNull(), 1).otherwise(0)
        ),
    )
    w_running = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col("_start").asc(), F.col("_end").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_era = with_flag.withColumn("_era_id", F.sum("_new_era").over(w_running))
    return (
        with_era.groupBy(*partition_cols, "_era_id")
        .agg(
            F.min("_start").alias("era_start"),
            F.max("_end").alias("era_end"),
            F.count(F.lit(1)).alias("era_count"),
        )
        .drop("_era_id")
    )
