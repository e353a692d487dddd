"""Source/sink layer.

Reference analogue: config-driven source binding — `i2o_transform_config` rows
are turned into views/synonyms by dynamic SQL (MSSQL/OMOPLoader.sql:37-189,
OMOPConfig_Setup.sql:27-73).  Here a table name + base directory resolves to a
parquet (locally) or Iceberg (cluster) table; the rest of the engine only sees
DataFrames.

Sink semantics: the reference truncates + reloads each output table
(`OMOPclear`, MSSQL/OMOPLoader.sql:1870-1890) — full-refresh idempotent
overwrite.  `write_table(mode="overwrite")` reproduces that contract and is the
checkpoint/resume unit (see plans/runner.py).  On a cluster the same call maps
to Iceberg `overwritePartitions` for snapshot-isolated atomic replace.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """Read one table from ``base_dir`` (parquet file or directory)."""
    return spark.read.parquet(os.path.join(base_dir, f"{name}.parquet"))


def load_testdata(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every synthetic test table under ``sf_dir``."""
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def write_table(
    df: DataFrame,
    base_dir: str,
    name: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> str:
    """Idempotent full-refresh write (OMOPclear + INSERT-SELECT semantics,
    MSSQL/OMOPLoader.sql:1870-1890).  Returns the written path."""
    path = os.path.join(base_dir, name)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return path
