"""Graph partition planning — choosing the edge layout for a 10^12-triple store.

At web scale the triple/edge table IS the dominant storage and shuffle
cost, and the partitioning strategy decides every downstream join's
exchange bill.  The reference sidesteps this (single-node MSSQL clustered
indexes, MSSQL/OMOPLoader.sql table DDL); a distributed store must choose
between the classic layouts and the choice should be MEASURED, not
guessed.  This module evaluates the three canonical strategies on the
actual edge distribution and reports the two numbers that matter:

* **load balance** — max partition size over mean (straggler bound);
* **vertex replication** — how many partitions each vertex's edges touch
  (the mirror/sync cost of any vertex-program, and the fan-in of any
  per-vertex aggregation).

Strategies (PowerGraph/GraphX taxonomy — Gonzalez et al., OSDI'12):

1. ``src_hash`` (1D edge-cut): partition by hash(src).  Perfect src
   locality (out-edges of a vertex co-located; replication from the src
   side is exactly 1) but dst mirrors scale with in-degree, so one hot
   authority replicates everywhere and its in-edge partition is a
   straggler under src-grouped aggregation.
2. ``grid_2d`` (2D vertex-cut): partition by (hash(src) % R, hash(dst)
   % C).  Replication is bounded by R + C - 1 ≈ 2·sqrt(P) REGARDLESS of
   degree — the skew-proof layout for power-law webs.
3. ``hybrid_degree`` (PowerLyra-style): low-in-degree dst edges go to
   hash(dst) (dst locality, replication 1 from the dst side); edges into
   high-in-degree hubs switch to hash(src) so the hub's in-edges spread
   over all partitions instead of melting one.  Needs one dst-degree
   profile (a map-side-combining agg) + one broadcast-or-shuffle join.

Everything is computed with hash aggregations only — per strategy: one
edge->partition map (zero shuffle), one groupBy for loads, one distinct +
groupBy for replicas.  No collect, no iteration; at 10^12 edges each
stat is a single map-side-combining exchange.

The partition hash is the repo's portable md5-nibble bucket (first four
hex nibbles -> 16 bits -> mod P), chosen because the DuckDB oracle can
reproduce it bit-for-bit (`strpos('0123..f', substr(md5(x),i,1))`), so
the whole report — assignments included — is value-oracled, not just
sanity-checked.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def bucket(col, parts: int):
    """Portable 16-bit bucket of a string column: int(md5(x)[:4], 16) % parts.

    Deterministic across engines, runs, and cluster sizes; DuckDB twin:
    ``((strpos(hex,substr(md5(x),1,1))-1)*4096 + ... ) % parts``.
    """
    h = F.md5(col.cast("string"))

    def nib(i: int):
        return F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1

    v = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
    return v % F.lit(parts)


def bucket_sql(expr: str, parts: int) -> str:
    """DuckDB SQL twin of :func:`bucket` (same nibble arithmetic)."""
    nibs = " + ".join(
        f"(strpos('{_HEX}', substr(md5({expr}),{i},1))-1)*{16 ** (4 - i)}"
        for i in range(1, 5)
    )
    return f"(({nibs}) % {parts})"


def _strategy_stats(
    assigned: DataFrame, strategy: str, parts: int
) -> DataFrame:
    """(src, dst, part) -> one report row.  Two hash aggs, no join."""
    loads = assigned.groupBy("part").agg(F.count(F.lit(1)).alias("m"))
    load_row = loads.agg(
        F.sum("m").alias("edges"),
        # straggler bound: max partition load as ppm of total edges
        # (explicit floor: DuckDB CAST(double) rounds, Spark truncates)
        F.floor(F.max("m") * F.lit(1_000_000) / F.sum("m"))
        .cast("long")
        .alias("max_load_ppm"),
    )
    # replicas: distinct (vertex, part) incidences over both endpoints
    incid = assigned.select(
        F.col("src").alias("v"), "part"
    ).unionAll(assigned.select(F.col("dst").alias("v"), "part")).distinct()
    rep_row = incid.groupBy("v").agg(F.count(F.lit(1)).alias("r")).agg(
        F.count(F.lit(1)).alias("vertices"),
        # average mirrors per vertex, milli-units, integer end-to-end
        F.floor(F.sum("r") * F.lit(1000) / F.count(F.lit(1)))
        .cast("long")
        .alias("replication_milli"),
        F.max("r").cast("long").alias("max_replicas"),
    )
    return (
        load_row.crossJoin(rep_row)  # two 1-row aggregates — broadcast
        .select(
            F.lit(strategy).alias("strategy"),
            F.lit(parts).cast("long").alias("parts"),
            F.col("edges").cast("long"),
            "max_load_ppm",
            F.col("vertices").cast("long"),
            "replication_milli",
            "max_replicas",
        )
    )


def plan_partitions(
    edges: DataFrame,
    parts: int = 16,
    hub_threshold: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Evaluate src_hash / grid_2d / hybrid_degree layouts on real edges.

    Returns one row per strategy: (strategy, parts, edges, max_load_ppm,
    vertices, replication_milli, max_replicas) — all integer columns so
    the DuckDB oracle hash-matches exactly.  grid_2d uses R = C =
    ceil(sqrt(parts)) (so its 'parts' column reports R*C, which may
    exceed the requested count — the honest grid size).
    """
    e = edges.select(
        F.col(src).cast("string").alias("src"),
        F.col(dst).cast("string").alias("dst"),
    )

    one_d = e.withColumn("part", bucket(F.col("src"), parts))

    r = c = int(math.ceil(math.sqrt(parts)))
    grid = e.withColumn(
        "part",
        bucket(F.col("src"), r) * F.lit(c) + bucket(F.col("dst"), c),
    )

    indeg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    hybrid = (
        e.join(indeg, "dst")
        .withColumn(
            "part",
            F.when(
                F.col("in_deg") > hub_threshold, bucket(F.col("src"), parts)
            ).otherwise(bucket(F.col("dst"), parts)),
        )
        .select("src", "dst", "part")
    )

    return (
        _strategy_stats(one_d, "src_hash", parts)
        .unionAll(_strategy_stats(grid, "grid_2d", r * c))
        .unionAll(_strategy_stats(hybrid, "hybrid_degree", parts))
    )
