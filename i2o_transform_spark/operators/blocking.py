"""Sorted-neighborhood blocking (SNM) — the classic windowed candidate
generator for entity resolution (Hernandez & Stolfo, SIGMOD'95).

Records are globally ordered by a fuzzy sort key (e.g. a name prefix or
phonetic code); each record is then paired with the ``window - 1`` records
that follow it.  Complements the repo's other blocking families (minhash
bands in operators/dedup.py, SymSpell deletion variants in
operators/fuzzy.py): SNM catches near-dupes whose keys SORT adjacently even
when no token or deletion variant collides.  Reference analogue: the
merge/dedup stored procedures' reliance on clustered-index order scans
(MSSQL/OMOPLoader.sql dedup blocks) — SNM is that order-scan idea made an
explicit, evaluable blocking scheme.

Scale shape (10^12 records)
---------------------------
A naive global ``Window.orderBy`` collapses to ONE partition.  Instead the
global row number is assembled scale-safely:

* ``repartitionByRange`` on the sort key + ``sortWithinPartitions`` gives a
  globally ordered layout (Spark's range partitioner samples split points);
* ``monotonically_increasing_id`` evaluated after that sort encodes
  (partition_id << 33 | local_offset) with partition ids ascending in key
  order, so the per-partition local rank is FREE — no second shuffle, no
  per-partition window re-sort; per-partition offsets — a tiny
  count-per-partition frame — are joined back broadcast, so the global
  rank costs ONE range shuffle + ONE sort total, never a single-partition
  sort;
* windowing is an EQUI-join: each record explodes into ``window - 1``
  (rank + d) probes joined on rank — shuffle volume is ``(w-1) * rows``,
  linear in w, with no self-cartesian anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    key_cols: list[str],
    partitions: int | None = None,
) -> DataFrame:
    """Add a dense global ``_rank`` (1-based) ordered by ``key_cols``,
    without ever sorting in a single partition.  ``key_cols`` must be a
    total order (append a unique id as tie-break)."""
    from pyspark.sql import Window

    np_ = partitions or df.sparkSession.sparkContext.defaultParallelism
    # monotonically_increasing_id after a range-partitioned sort encodes
    # (partition_id << 33) | local_offset, and range partition ids ascend
    # with the key order — so ONE exchange + ONE sort yields a globally
    # ordered (pid, local) pair with no second shuffle and no per-pid
    # window re-sort.  The eager localCheckpoint materializes the sampled
    # range boundaries ONCE so the offsets branch and the main branch can
    # never see two independently-sampled exchanges.
    ranged = (
        df.repartitionByRange(np_, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    local = ranged.withColumn(
        "_pid", F.shiftrightunsigned("_mid", 33)
    ).withColumn("_lrn", (F.col("_mid").bitwiseAND((1 << 33) - 1)) + 1)
    # one row per partition; running offset is a tiny cumulative window
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offw = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(offw), F.lit(0))
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("_rank", (F.col("_off") + F.col("_lrn")).cast("long"))
        .drop("_pid", "_lrn", "_off", "_mid")
    )


def sorted_neighborhood_pairs(
    records: DataFrame,
    key_col: str,
    id_col: str = "record_id",
    window: int = 3,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, gap) for all records within ``window``
    positions of each other in (key_col, id_col) order; ``id_a`` precedes
    ``id_b`` and ``gap = rank_b - rank_a`` in [1, window-1]."""
    if window < 2:
        raise ValueError("window must be >= 2")
    ranked = global_rank(
        records.select(id_col, key_col), [key_col, id_col]
    ).select(F.col(id_col).alias("id_a"), F.col("_rank").alias("_ra"))
    probes = ranked.select(
        "id_a",
        "_ra",
        F.explode(
            F.sequence(F.col("_ra") + 1, F.col("_ra") + (window - 1))
        ).alias("_rb"),
    )
    right = ranked.select(
        F.col("id_a").alias("id_b"), F.col("_ra").alias("_rb")
    )
    return (
        probes.join(right, "_rb")
        .select(
            "id_a",
            "id_b",
            (F.col("_rb") - F.col("_ra")).cast("long").alias("gap"),
        )
    )
