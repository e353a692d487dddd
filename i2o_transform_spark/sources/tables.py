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


def write_table_catalog(
    df: DataFrame,
    table_ident: str,
    partition_by: list[str] | None = None,
) -> str:
    """Catalog (Iceberg) sink for cluster runs — the DataSourceV2 twin of
    :func:`write_table`.

    ``table_ident`` is a catalog-qualified name (``cat.db.table``) whose
    catalog must be configured on the session (e.g.
    ``spark.sql.catalog.cat=org.apache.iceberg.spark.SparkCatalog``).
    First write creates the partitioned table (``createOrReplace``);
    subsequent writes use dynamic ``overwritePartitions`` — Iceberg's
    snapshot-isolated atomic replace, which is exactly the reference's
    OMOPclear truncate+reload contract (MSSQL/OMOPLoader.sql:1870-1890) but
    per-partition and transactional.  The local parquet path of
    :func:`write_table` remains the default everywhere in this sandbox (no
    Iceberg runtime jars here); the runner's checkpoint fingerprints are
    sink-agnostic."""
    from pyspark.sql.utils import AnalysisException

    spark = df.sparkSession
    writer = df.writeTo(table_ident)
    if partition_by:
        from pyspark.sql import functions as F

        writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
    try:
        if spark.catalog.tableExists(table_ident):
            df.writeTo(table_ident).overwritePartitions()
        else:
            writer.createOrReplace()
    except AnalysisException as e:  # no such catalog / no Iceberg runtime
        raise RuntimeError(
            f"catalog sink unavailable for {table_ident!r} — configure an "
            "Iceberg catalog (spark.sql.catalog.<name>=...) or use "
            "write_table() for the parquet path"
        ) from e
    return table_ident


def bucketed_write(
    df: DataFrame,
    base_dir: str,
    name: str,
    key_col: str,
    n_buckets: int = 64,
) -> str:
    """Hash-bucket-partitioned materialization for point-lookup pruning.

    Adds ``_bucket = pmod(xxhash64(key), n_buckets)`` and partitions the
    files by it: a lookup that filters ``_bucket = bucket_of(key)`` (see
    :func:`bucket_of`) prunes to 1/n_buckets of the files at PLANNING time
    (PartitionFilters, no data read).  This is the parquet twin of Iceberg's
    ``bucket(n, key)`` partition transform the north_rule materialization
    calls for — deterministic (content-hash, no rand), stable across
    cluster sizes."""
    from pyspark.sql import functions as F

    out = df.withColumn(
        "_bucket",
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int"),
    )
    return write_table(out, base_dir, name, partition_by=["_bucket"])


def bucket_of(key_value, n_buckets: int = 64):
    """Planning-time bucket id for a literal key — pair with
    :func:`bucketed_write` to prune a point lookup to one partition."""
    from pyspark.sql import functions as F

    return F.pmod(F.xxhash64(F.lit(key_value)), F.lit(n_buckets)).cast("int")


def load_table_catalog(spark: SparkSession, table_ident: str) -> DataFrame:
    """Catalog (Iceberg) source binding — the DataSourceV2 twin of
    :func:`load_table`, completing the round-trip with
    :func:`write_table_catalog`.

    On a cluster the crawl table arrives as ``spark.table('cat.db.pages')``
    (input_hint: "Iceberg table of Common-Crawl-style web pages") and
    Iceberg supplies partition pruning + column-stat file skipping through
    the same PartitionFilters/PushedFilters contract the parquet scans here
    are plan-tested for.  Locally (no Iceberg runtime jars) this raises the
    same actionable error as the sink twin."""
    from pyspark.sql.utils import AnalysisException

    try:
        return spark.table(table_ident)
    except AnalysisException as e:
        raise RuntimeError(
            f"catalog source unavailable for {table_ident!r} — configure an "
            "Iceberg catalog (spark.sql.catalog.<name>=...) or use "
            "load_table() for the parquet path"
        ) from e


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> dict:
    """Small-files compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files — the table-maintenance job every
    streaming/incremental sink needs (each micro-batch or CDC merge leaves
    small files; scan cost and NameNode/manifest pressure grow with file
    COUNT, not bytes).  The reference's analogue is its full-refresh
    rebuild (OMOPclear + reload, MSSQL/OMOPLoader.sql:1870-1890); on a
    cluster the same call shape is Iceberg's rewrite_data_files.

    The rewrite stages into `<path>.__compact__` and swaps via two renames
    (`path`→`.__old__`, `.__compact__`→`path`).  The write itself is safe —
    a crash before the first rename leaves the original untouched — but the
    swap window between the two renames is NOT atomic: a crash there leaves
    the data at `.__old__`.  Entry therefore self-heals: a stale `.__old__`
    with no live `path` is restored; leftover `.__old__`/`.__compact__`
    alongside a live `path` are discarded as debris from an interrupted run.
    On a real cluster use Iceberg's rewrite_data_files, whose snapshot
    commit IS atomic.  Optional ``sort_within_by`` re-sorts rows within
    each output file (pair with functions/zorder.zorder_by for multi-dim
    layout).

    Flat layouts only: Hive-partitioned inputs (parquet in subdirectories)
    are rejected — compacting them here would flatten the partition layout.

    Returns {"files_before", "files_after", "bytes"}.
    """
    import glob
    import os
    import shutil

    tmp = path.rstrip("/") + ".__compact__"
    bak = path.rstrip("/") + ".__old__"
    # Self-heal debris from a previous interrupted run.
    if os.path.exists(bak) and not os.path.exists(path):
        os.rename(bak, path)  # crashed inside the swap window — restore
    for stale in (tmp, bak):
        if os.path.exists(stale):
            shutil.rmtree(stale)
    sub_parquet = [
        f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f) and os.path.dirname(f) != path.rstrip("/")
    ]
    if sub_parquet:
        raise ValueError(
            f"compact_parquet({path!r}): input is Hive-partitioned "
            f"({len(sub_parquet)} parquet files in subdirectories); compacting "
            "would flatten the partition layout — compact each leaf instead"
        )
    files = [
        f for f in glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isfile(f)
    ]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    out = df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    after = len([
        f for f in glob.glob(os.path.join(path, "*.parquet"))
        if os.path.isfile(f)
    ])
    return {"files_before": len(files), "files_after": after, "bytes": total}
