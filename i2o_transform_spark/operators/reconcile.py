"""Count-reconciliation report — the reference's correctness harness.

`omopReport` (MSSQL/OMOPLoader.sql:1996-2097) writes one row per domain into
`i2oreport(runid, rundate, concept, sourceval, sourcedistinct, destval,
destdistinct)` (:511-515) comparing source-side and destination-side row and
distinct-entity counts.  Here it is a generic operator: given named stages,
emit (stage, rows, distinct_entities) — unioned into one report DataFrame and
persisted with the lineage table (plans/runner.py).

At 10^12 rows the exact countDistinct is replaced by approx_count_distinct
for monitoring (exact=False); tests use exact counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_counts(
    df: DataFrame, stage: str, entity_col: str, exact: bool = True
) -> DataFrame:
    distinct = (
        F.count_distinct(F.col(entity_col))
        if exact
        else F.approx_count_distinct(F.col(entity_col))
    )
    return df.agg(
        F.lit(stage).alias("stage"),
        F.count(F.lit(1)).alias("rows"),
        distinct.alias("distinct_entities"),
    )


def reconciliation_report(
    stages: list[tuple[DataFrame, str, str]], exact: bool = True
) -> DataFrame:
    """Union of stage_counts over (df, stage_name, entity_col) triples."""
    parts = [stage_counts(df, name, col, exact) for df, name, col in stages]
    return reduce(lambda a, b: a.unionByName(b), parts)
