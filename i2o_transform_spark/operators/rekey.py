"""Global re-keying: swap a key column across many tables via a mapping.

Reference: PHS_MRN_PID_mapping/Patient_Num_to_AoU_id_migration.sql:27-76 —
a cursor loops a two-hop mapping (aou_mapping JOIN mrn_mapping on
(mrn, facility)) and UPDATEs six OMOP tables row by row, then only drops the
old column when every table shows zero unmapped rows (:55-76), otherwise
prints per-table null counts.

Spark-first recast: the cursor loop becomes ONE mapping join per table
(Catalyst auto-broadcasts the mapping when it fits, AQE handles a skewed/
large mapping), and the procedural completeness gate becomes a declarative
per-table report aggregated in a single pass.  At 10^12 rows per table the
join shuffles nothing when the mapping broadcasts; with a billion-row
mapping it is a plain shuffled equi-join on the key — either way, no
driver-side iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compose_mapping(
    map_a: DataFrame,
    map_b: DataFrame,
    join_cols: list[str],
    old_key: str,
    new_key: str,
) -> DataFrame:
    """The 'double mapping' (migration.sql:31-34): join the two hop tables on
    their shared natural key(s) and keep (old_key, new_key) pairs.

    Duplicate (old_key) rows after the hop join are collapsed
    deterministically to the min new_key — the reference's cursor would have
    applied an arbitrary last-write instead; min is stable across retries."""
    return (
        map_a.join(map_b, join_cols)
        .groupBy(old_key)
        .agg(F.min(new_key).alias(new_key))
    )


def rekey_table(
    df: DataFrame,
    key_col: str,
    mapping: DataFrame,
    old_key: str = "old_key",
    new_key: str = "new_key",
    keep_unmapped: bool = False,
) -> DataFrame:
    """Replace ``key_col`` with the mapped new key (migration.sql:38-44).

    Inner join by default (unmapped rows drop — they are reported by
    :func:`rekey_report`, mirroring the reference's refusal to swap while
    nulls exist); ``keep_unmapped=True`` left-joins and carries a null key
    instead.  Output column keeps the original name (:69-76 sp_rename)."""
    how = "left" if keep_unmapped else "inner"
    m = mapping.select(
        F.col(old_key).alias("__old"), F.col(new_key).alias("__new")
    )
    out = df.join(m, df[key_col] == m["__old"], how)
    return out.drop(key_col, "__old").withColumnRenamed("__new", key_col)


def rekey_report(
    tables: dict[str, DataFrame],
    key_col: str,
    mapping: DataFrame,
    old_key: str = "old_key",
) -> DataFrame:
    """Completeness gate (migration.sql:55-76): per-table row/unmapped counts.

    One row per table: (table_name, n_rows, n_unmapped, complete).  The swap is
    safe exactly when every ``complete`` is 1 — the caller (or
    :func:`rekey_tables`) consults this before materializing."""
    keys = mapping.select(F.col(old_key).alias("__old")).distinct()
    reports = []
    for name, df in tables.items():
        joined = df.select(F.col(key_col).alias("__k")).join(
            keys, F.col("__k") == keys["__old"], "left"
        )
        reports.append(
            joined.agg(
                F.lit(name).alias("table_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__old").isNull().cast("long")).alias("n_unmapped"),
            ).select(
                "table_name",
                "n_rows",
                "n_unmapped",
                (F.col("n_unmapped") == 0).cast("int").alias("complete"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def rekey_tables(
    tables: dict[str, DataFrame],
    key_col: str,
    mapping: DataFrame,
    old_key: str = "old_key",
    new_key: str = "new_key",
    strict: bool = True,
) -> tuple[dict[str, DataFrame], DataFrame]:
    """Swap ``key_col`` in every table; returns (rekeyed tables, report).

    ``strict=True`` raises if any table has unmapped keys (the reference's
    all-or-nothing gate, migration.sql:55-68); strict=False rekeys anyway,
    dropping unmapped rows, and the report says what was dropped."""
    report = rekey_report(tables, key_col, mapping, old_key)
    if strict:
        bad = [
            (r["table_name"], r["n_unmapped"])
            for r in report.collect()
            if r["n_unmapped"] > 0
        ]
        if bad:
            raise ValueError(
                f"rekey incomplete, refusing swap (migration gate): {bad}"
            )
    out = {
        name: rekey_table(df, key_col, mapping, old_key, new_key)
        for name, df in tables.items()
    }
    return out, report
