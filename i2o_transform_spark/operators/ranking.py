"""Link-prediction ranking evaluation — the KG-completion metric kernel
(filtered rank / Hits@k over candidate scores, TransE-style).

A KG built at crawl scale feeds embedding trainers (TransE/DistMult/...);
their eval loop is: for each test triple, score the true tail against a
candidate set and take the rank of the true tail.  Driver-side eval loops
don't survive 10^9 test triples, so this is the distributed version.

Scale shape (verified plan, tests/test_ranking.py): the scores frame is
scanned twice (once per leg: all candidates / the true candidate's score)
and shuffled ONCE at scores scale; the true-score leg shrinks to one row
per query before its exchange, and the truth frame broadcasts when it is
vocabulary-sized (AQE decides from observed size otherwise).  The rank
itself is aggregation-only: ``1 + sum(candidate strictly better)`` with a
deterministic candidate-id tie-break inside ONE HashAggregate — a window
``rank()`` would sort every candidate list; the conditional sum only
streams them, and the final join + aggregate share the q partitioning.

Ties: ``(score, cand)`` lexicographic — two engines (and two cluster
sizes) produce bit-identical ranks, the property every oracle here hashes.

Citation: the reference evaluates its loads with per-table count/value
validation procedures (MSSQL/OMOPLoader.sql:1996-2097); this is the
KG-side analogue where the validated artifact is a ranking metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction_ranks(
    scores: DataFrame,
    truth: DataFrame,
    query_cols: list[str],
    cand_col: str = "cand",
    score_col: str = "score",
) -> DataFrame:
    """Per-query rank of the true candidate (LOWER score = better).

    ``scores``: one row per (query, candidate) with an integer-exact score
    column.  ``truth``: one row per query naming the true candidate in
    ``cand_col``.  Returns per query: the true candidate, its score, its
    1-based rank among all scored candidates (ties broken by candidate id
    ascending), and ``hit1``.  MRR/Hits@k follow by aggregating the output;
    sums of ranks stay exact integers, so this frame — not a float mean —
    is what crosses engines.
    """
    t = truth.select(*query_cols, F.col(cand_col).alias("_true"))
    j = scores.join(t, query_cols)
    trues = j.where(F.col(cand_col) == F.col("_true")).select(
        *query_cols,
        F.col(score_col).alias("_tscore"),
        F.col("_true").alias("_tc"),
    )
    better = F.when(
        (F.col(score_col) < F.col("_tscore"))
        | (
            (F.col(score_col) == F.col("_tscore"))
            & (F.col(cand_col) < F.col("_tc"))
        ),
        1,
    ).otherwise(0)
    ranked = (
        j.join(trues, query_cols)
        .groupBy(*query_cols)
        .agg(
            F.first("_tc").alias("true_cand"),
            F.first("_tscore").cast("long").alias("true_score"),
            (1 + F.sum(better)).cast("long").alias("rnk"),
        )
    )
    return ranked.select(
        *query_cols,
        "true_cand",
        "true_score",
        "rnk",
        F.when(F.col("rnk") == 1, 1).otherwise(0).cast("long").alias("hit1"),
    )
