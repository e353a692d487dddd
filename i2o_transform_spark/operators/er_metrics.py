"""Entity-resolution quality metrics — aggregation-only, no pair blowup.

The canonicalization stage (operators/graph.blocked_connected_components,
operators/fuzzy.fuzzy_link) produces a clustering of records; before trusting
it at 10^12-row scale you evaluate it against a labeled gold clustering.  The
textbook definitions are over record PAIRS — precision = |predicted pairs ∩
gold pairs| / |predicted pairs| — and the naive implementation self-joins
each clustering, which is O(sum cluster_size^2) rows: a single million-record
predicted cluster would materialize 5·10^11 pairs.  Every quantity below is
instead computed from CONTINGENCY COUNTS:

    tp_pairs   = Σ_{ij} C(n_ij, 2)    over cells of the (pred, gold) table
    pred_pairs = Σ_i    C(n_i·, 2)    over predicted-cluster sizes
    gold_pairs = Σ_j    C(n_·j, 2)    over gold-cluster sizes

so the whole evaluation is one record-scale groupBy (map-side combining)
plus re-aggregations of the already-tiny cell frame — the same plan at 60k
records and 10^12.  All arithmetic stays in LONGS: C(n,2) sums accumulate
n*(n-1) and halve once at the end with SQL `div`, and ratios are integer
parts-per-million via `div` — bit-comparable across engines, no float
summation order, no 2^53 double cliff.

Reference analogue: the reference validates its merge/dedup stored
procedures with per-table count reconciliation (MSSQL/OMOPLoader.sql QA
blocks, 1996-2097); pairwise P/R is the same idea made rigorous for a
clustering rather than a row count.

`blocking_quality` evaluates a BLOCKING scheme (minhash bands, SymSpell
deletion variants, sorted neighborhood...) before the expensive matcher
runs: pair completeness (share of gold pairs that are co-blocked) and the
reduction ratio vs the full cross product.  A record may land in many
blocks, so co-blocked pairs are deduplicated on the unordered (a, b) pair —
bounded by Σ C(block_size, 2), which the caller's block-size df-cut keeps
small (the same cut every blocking scheme in operators/dedup.py applies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def _sum_pairs2(df: DataFrame, n_col: str, out: str) -> DataFrame:
    """One row: Σ n*(n-1) over `n_col` (twice the pair count), long-exact."""
    c = F.col(n_col).cast("long")
    return df.agg(F.sum(c * (c - F.lit(1))).alias(out))


def clustering_quality(
    assignments: DataFrame,
    record_col: str = "record_id",
    pred_col: str = "pred_cluster",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """Pairwise precision/recall/F1 of pred vs gold clusterings.

    `assignments`: one row per record with its predicted and gold cluster
    ids.  Returns ONE row: (tp_pairs, pred_pairs, gold_pairs, precision_ppm,
    recall_ppm, f1_ppm) — integer-exact, aggregation-only.
    """
    cells = assignments.groupBy(pred_col, gold_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    # The record-scale scan happens ONCE (the cell agg); marginals
    # re-aggregate the cluster-count-sized cell frame.
    cells = cells.localCheckpoint(eager=True)
    tp = _sum_pairs2(cells, "n", "tp2")
    pred = _sum_pairs2(
        cells.groupBy(pred_col).agg(F.sum("n").alias("sz")), "sz", "pred2"
    )
    gold = _sum_pairs2(
        cells.groupBy(gold_col).agg(F.sum("n").alias("sz")), "sz", "gold2"
    )
    return (
        tp.crossJoin(pred)
        .crossJoin(gold)  # three 1-row frames
        .selectExpr(
            "tp2 div 2 AS tp_pairs",
            "pred2 div 2 AS pred_pairs",
            "gold2 div 2 AS gold_pairs",
            "tp2 * 1000000 div pred2 AS precision_ppm",
            "tp2 * 1000000 div gold2 AS recall_ppm",
        )
        .selectExpr(
            "tp_pairs",
            "pred_pairs",
            "gold_pairs",
            "precision_ppm",
            "recall_ppm",
            # F1 from the ppm-quantized P/R (integer-exact, portable)
            "CASE WHEN precision_ppm + recall_ppm > 0 THEN "
            "2 * precision_ppm * recall_ppm div (precision_ppm + recall_ppm) "
            "ELSE 0 END AS f1_ppm",
        )
    )


def blocking_quality(
    blocks: DataFrame,
    gold: DataFrame,
    record_col: str = "record_id",
    block_col: str = "block_key",
    gold_col: str = "gold_cluster",
) -> DataFrame:
    """Pair completeness + reduction ratio of a blocking scheme.

    `blocks`: (record_id, block_key), possibly many blocks per record.
    `gold`:   (record_id, gold_cluster), one row per record.

    candidate_pairs counts DISTINCT co-blocked unordered pairs (a pair
    co-blocked under 3 keys counts once — what the downstream matcher
    deduplicates to).  covered_gold_pairs counts gold pairs sharing at least
    one block.  total_pairs = C(N, 2) over gold's records.
    """
    b = blocks.select(
        F.col(record_col).alias("rid"), F.col(block_col).alias("bk")
    )
    co = (
        b.alias("l")
        .join(b.alias("r"), "bk")
        .where(F.col("l.rid") < F.col("r.rid"))
        .select(F.col("l.rid").alias("a"), F.col("r.rid").alias("b"))
        .distinct()
    )
    co = co.localCheckpoint(eager=True)
    cand = co.agg(F.count(F.lit(1)).alias("candidate_pairs"))
    g = gold.select(
        F.col(record_col).alias("rid"), F.col(gold_col).alias("gc")
    )
    covered = (
        co.join(g.withColumnRenamed("rid", "a"), "a")
        .withColumnRenamed("gc", "gca")
        .join(g.withColumnRenamed("rid", "b"), "b")
        .where(F.col("gca") == F.col("gc"))
        .agg(F.count(F.lit(1)).alias("covered_gold_pairs"))
    )
    gold2 = _sum_pairs2(
        g.groupBy("gc").agg(F.count(F.lit(1)).alias("sz")), "sz", "gold2"
    )
    total2 = _sum_pairs2(g.agg(F.count(F.lit(1)).alias("n")), "n", "total2")
    return (
        cand.crossJoin(covered)
        .crossJoin(gold2)
        .crossJoin(total2)  # four 1-row frames
        .selectExpr(
            "candidate_pairs",
            "covered_gold_pairs",
            "gold2 div 2 AS gold_pairs",
            "total2 div 2 AS total_pairs",
            "covered_gold_pairs * 1000000 div (gold2 div 2) "
            "AS pair_completeness_ppm",
            "(total2 div 2 - candidate_pairs) * 1000000 div (total2 div 2) "
            "AS reduction_ratio_ppm",
        )
    )
