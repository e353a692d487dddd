"""Truth discovery: resolve conflicting claims by source-reliability voting.

A web-scale KG builder ingests the same (subject, predicate) assertion from
many pages/sources with *conflicting* objects (the classic truth-discovery
setting: Yin et al. "TruthFinder", Li et al. "Resolving Conflicts in
Heterogeneous Data by Truth Discovery and Source Reliability Estimation").
The reference resolves intra-batch conflicts with fixed preference rules
(MSSQL/OMOPLoader.sql group-max elections); at web scale the preference must
be *learned* from inter-source agreement instead of hard-coded.

Algorithm (fixed-round, driver-bounded loop — the standard half-EM scheme):

* round 1 — uniform-weight majority vote per item; ties break to the
  smallest value (deterministic).
* between rounds — each source's weight is its agreement rate with the
  current winners, quantized to an integer ``(matched * SCALE) div total``
  so the arithmetic is exact and engine-portable (no float accumulation
  order anywhere).
* round k — re-vote with the learned weights; the winner is the value with
  the largest total supporting weight (ties again to the smallest value).

Scale notes (10^12 claims):

* the claims-scale aggregation (``groupBy(item, value)`` tally) is a
  map-side-combining HashAggregate; the per-item argmax is a
  ``min(struct(-support, value))`` over the *tally* frame — struct buffers
  are not UnsafeRow-mutable, so this level is a SortAggregate, but it sorts
  one row per distinct (item, value), never the claims.  Generic values
  (strings etc.) rule out the packed-long trick used elsewhere
  (operators/fuzzy.py); encode objects to ints upstream
  (functions/hashing.content_id) if the tally frame itself is huge.
* the weight table has one row per *source* (crawl host / feed), which is
  vocabulary-sized — it ships as a broadcast hash join every round, so each
  round adds exactly ONE shuffle (the per-(item,value) aggregation).
* the claims scan repeats per round; callers doing >2 rounds should
  ``.persist()`` the claims frame (the fixed 2-round default scans twice,
  the same cost as the reference's two-pass stored procedures).

Precondition: one claim row per (source, item) — dedupe upstream (the
registered query does ``groupBy(src, item).agg(min(value))``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WEIGHT_SCALE = 1_000_000


def vote(
    claims: DataFrame,
    item_cols: list[str],
    value_col: str,
    source_col: str,
    weights: DataFrame | None = None,
) -> DataFrame:
    """One voting round.  ``weights`` is a per-source (source_col, wt) frame
    (broadcast); ``None`` means uniform weight ``WEIGHT_SCALE``.

    Returns one row per item: item_cols + (value_col, support, n_sources)
    where ``support`` is the total integer weight behind the winner and
    ``n_sources`` the number of sources asserting it (== distinct sources
    under the module precondition of one claim per (source, item)).
    """
    if weights is None:
        weighted = claims.withColumn("_wt", F.lit(WEIGHT_SCALE).cast("long"))
    else:
        weighted = claims.join(F.broadcast(weights), source_col)
        weighted = weighted.withColumnRenamed("wt", "_wt")
    # Under the module precondition (one claim per (source, item)) every
    # tally row comes from a distinct source, so count(*) == distinct-source
    # count — and unlike count_distinct it keeps this a single map-side-
    # combining HashAggregate instead of forcing an extra claims-scale
    # exchange on (item, value, source) (measured 0.667 -> ~0.87 scaling
    # efficiency at 160M claims, 4 -> 16 cores).
    tallies = weighted.groupBy(*item_cols, value_col).agg(
        F.sum("_wt").alias("_support"),
        F.count(F.lit(1)).alias("_n_sources"),
    )
    # argmax via min-struct: (-support, value) orders by support DESC then
    # value ASC — aggregation-only election, no window / sort at scale.
    elected = tallies.groupBy(*item_cols).agg(
        F.min(
            F.struct(
                (-F.col("_support")).alias("ns"),
                F.col(value_col).alias("v"),
                F.col("_n_sources").alias("n"),
            )
        ).alias("_w")
    )
    return elected.select(
        *item_cols,
        F.col("_w.v").alias(value_col),
        (-F.col("_w.ns")).cast("long").alias("support"),
        F.col("_w.n").cast("long").alias("n_sources"),
    )


def source_accuracy(
    claims: DataFrame,
    winners: DataFrame,
    item_cols: list[str],
    value_col: str,
    source_col: str,
) -> DataFrame:
    """Per-source integer reliability weight: ``(matched * SCALE) div total``
    agreement with the current winners.  Exact integer arithmetic (both
    operands non-negative, so Spark ``div`` == DuckDB ``//``)."""
    truth = winners.select(
        *item_cols, F.col(value_col).alias("_winner")
    )
    joined = claims.join(truth, item_cols)
    return joined.groupBy(source_col).agg(
        F.expr(
            f"(sum(case when {value_col} = _winner then 1 else 0 end)"
            f" * {WEIGHT_SCALE}) div count(*)"
        )
        .cast("long")
        .alias("wt")
    )


def resolve_conflicts(
    claims: DataFrame,
    item_cols: list[str],
    value_col: str,
    source_col: str,
    rounds: int = 2,
) -> DataFrame:
    """Fixed-round truth discovery.  ``rounds=1`` is plain majority vote;
    ``rounds=2`` (default) is majority → source-accuracy → weighted re-vote,
    which recovers planted truth against colluding unreliable sources that a
    majority vote gets wrong (tests/test_truth_fuzzy.py)."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    weights: DataFrame | None = None
    winners = vote(claims, item_cols, value_col, source_col, weights)
    for _ in range(rounds - 1):
        weights = source_accuracy(
            claims, winners, item_cols, value_col, source_col
        )
        winners = vote(claims, item_cols, value_col, source_col, weights)
    return winners
