"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

For each query: run the Spark callable and the oracle SQL on the same parquet
tables; sort columns by name, sort rows, normalize values, compare.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb

from i2o_transform_spark.sources.tables import TESTDATA_TABLES


def run_oracle(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        r = round(v, 9)
        return int(r) if r.is_integer() else r
    if isinstance(v, decimal.Decimal):
        return _norm(float(v))
    if isinstance(v, datetime.datetime):
        v = v.replace(tzinfo=None)
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _norm(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _key(row):
    return tuple((x is None, str(x)) for x in row)


def compare(spark_df, oracle_pdf) -> tuple[bool, str]:
    """Returns (match, detail)."""
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    oracle_cols = sorted(oracle_pdf.columns)
    if [c.lower() for c in spark_cols] != [c.lower() for c in oracle_cols]:
        return False, f"columns differ: spark={spark_cols} oracle={oracle_cols}"
    if len(spark_rows) != len(oracle_pdf):
        return False, f"row counts differ: spark={len(spark_rows)} oracle={len(oracle_pdf)}"

    s_vals = sorted(
        (_key([_norm(r[c]) for c in spark_cols]) for r in spark_rows)
    )
    o_recs = oracle_pdf.where(oracle_pdf.notna(), None).to_dict("records")
    o_map = {c.lower(): c for c in oracle_pdf.columns}
    o_vals = sorted(
        (_key([_norm(rec[o_map[c.lower()]]) for c in spark_cols]) for rec in o_recs)
    )
    if s_vals != o_vals:
        diff_idx = next(i for i, (a, b) in enumerate(zip(s_vals, o_vals)) if a != b)
        return (
            False,
            f"values differ at sorted row {diff_idx}:\n spark={s_vals[diff_idx]}\noracle={o_vals[diff_idx]}",
        )
    return True, f"ok ({len(spark_rows)} rows)"
