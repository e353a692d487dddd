"""Join operators — SURVEY.md §2.3 (J1-J13).

The reference's heart is dictionary equi-joins of a huge EAV fact table
against small ontology tables, plus a two-hop 'Maps to' vocabulary-graph
walk.  Spark-first mapping:

* small side  -> broadcast() ALWAYS (the reference instead indexes the probe
  key, MSSQL/OMOPLoader.sql:772-913 — no indexes in Spark; broadcast removes
  the shuffle entirely).
* skewed hot keys ("Millions of records (7k codes)",
  MSSQL/OMOPLoader.sql:858) -> salted-key join: explode the small side over
  `salt_buckets` replicas, salt the big side with pmod(xxhash64(...)).
  AQE skew-join remains enabled as a backstop for shuffle joins.
* expression join keys (J5: substring/charindex inside the ON clause,
  MSSQL/OMOPLoader.sql:744-747) -> derive the key column FIRST, then
  equi-join, so Catalyst can plan a hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dictionary_join(
    facts: DataFrame,
    vocab: DataFrame,
    fact_key: str,
    vocab_key: str,
    how: str = "inner",
) -> DataFrame:
    """J1/J2: fact -> ontology dictionary lookup via broadcast hash join
    (MSSQL/OMOPLoader.sql:1046, 1224: i2b2fact.concept_cd = ont.c_basecode)."""
    return facts.join(
        F.broadcast(vocab), facts[fact_key] == vocab[vocab_key], how
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: replicate the small side ``salt_buckets``
    times, salt the big side deterministically, join on (key, salt).

    This is the explicit hot-key treatment SURVEY.md §4 calls for (the
    reference's "7k codes -> millions of rows" skew,
    MSSQL/OMOPLoader.sql:858).  Use when `small` is too big to broadcast but
    the key distribution on `big` is skewed; for broadcastable dims prefer
    dictionary_join (no shuffle at all).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns], F.lit(1)), F.lit(salt_buckets))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big_s.join(small_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def plan_salt_buckets(
    big: DataFrame,
    key: str,
    parallelism: int | None = None,
    max_buckets: int = 64,
) -> int:
    """Derive ``salt_buckets`` from the OBSERVED hot-key share instead of a
    caller guess (VERDICT r02 next-round #7).

    One planning pass, the same shape as the ``qa_skew_profile`` query: a
    key-only groupBy.count (map-side partial combine — the shuffle moves one
    row per distinct key, not per input row) folded to (max_n, total).  A
    key holding share ``p`` of the rows occupies ``p x parallelism``
    partition-slots of work after the join shuffle; splitting it into
    ``ceil(p x parallelism)`` salt buckets caps the hottest bucket at about
    one average partition.  Returns 1 (no salting needed) when the hottest
    key is no larger than a uniform share.
    """
    import math

    if parallelism is None:
        parallelism = int(
            big.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    row = (
        big.groupBy(key)
        .count()
        .agg(F.max("count").alias("max_n"), F.sum("count").alias("total"))
        .first()
    )
    if not row or not row.total:
        return 1
    hot_share = row.max_n / row.total
    if hot_share <= 1.0 / parallelism:
        return 1
    return max(1, min(max_buckets, math.ceil(hot_share * parallelism)))


def skew_aware_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    broadcast_threshold_rows: int = 1_000_000,
    parallelism: int | None = None,
) -> DataFrame:
    """Statistics-driven join strategy selection (auto-skew planning):

    1. ``small`` fits the broadcast contract -> :func:`dictionary_join`
       (broadcast hash join, zero shuffle — skew on ``big`` is irrelevant);
    2. else, the hottest ``big`` key exceeds a uniform partition share ->
       :func:`salted_join` with :func:`plan_salt_buckets`-derived buckets;
    3. else a plain shuffle hash join (AQE skew-split stays on as backstop).

    Two bounded planning actions (a small-side count, a key-only profile of
    the big side); both are map-side-combining single jobs — the planning
    cost a 100 TB run pays once per join site, not per row.
    """
    if small.count() <= broadcast_threshold_rows:
        return big.join(F.broadcast(small), on=key, how=how)
    buckets = plan_salt_buckets(big, key, parallelism=parallelism)
    if buckets > 1:
        return salted_join(big, small, key, salt_buckets=buckets, how=how)
    return big.join(small, on=key, how=how)


def two_hop_maps_to(
    source_codes: DataFrame,
    concept: DataFrame,
    concept_rel: DataFrame,
    code_col: str = "std_code",
    vocab_col: str = "vocabulary_id",
) -> DataFrame:
    """J4: source code -> concept node -> 'Maps to' edge -> standard target.

    Reference: MSSQL/OMOPLoader.sql:744-761 — join concept on
    (concept_code, vocabulary_id), walk concept_relationship rows with
    relationship_id='Maps to', land on target concepts filtered
    standard_concept='S' AND invalid_reason IS NULL.  Both vocab tables are
    broadcast; the output is the crosswalk that gets persisted once and
    re-broadcast at use time (OMOPBuildMapping, :714-917).
    """
    src_concept = concept.select(
        F.col("concept_id").alias("src_concept_id"),
        F.col("concept_code"),
        F.col("vocabulary_id").alias("src_vocabulary_id"),
        F.col("domain_id").alias("src_domain_id"),
    )
    tgt_concept = concept.where(
        (F.col("standard_concept") == "S") & F.col("invalid_reason").isNull()
    ).select(
        F.col("concept_id").alias("mapped_id"),
        F.col("domain_id").alias("mapped_domain"),
        F.col("concept_name").alias("mapped_name") if "concept_name" in concept.columns
        else F.lit(None).cast("string").alias("mapped_name"),
    )
    maps_to = concept_rel.where(F.col("relationship_id") == "Maps to").select(
        F.col("concept_id_1"), F.col("concept_id_2")
    )
    return (
        source_codes.join(
            F.broadcast(src_concept),
            (source_codes[code_col] == src_concept.concept_code)
            & (source_codes[vocab_col] == src_concept.src_vocabulary_id),
            "inner",
        )
        .join(
            F.broadcast(maps_to),
            F.col("src_concept_id") == maps_to.concept_id_1,
            "inner",
        )
        .join(
            F.broadcast(tgt_concept),
            maps_to.concept_id_2 == tgt_concept.mapped_id,
            "inner",
        )
        .drop("concept_id_1", "concept_id_2", "concept_code")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tie_col: str | None = None,
    tolerance: str | None = None,
    allow_exact_matches: bool = True,
    prefix: str = "asof_",
) -> DataFrame:
    """As-of join: for every left row, the single latest right row of the
    same ``on`` key with ``right_ts <= left_ts`` (``<`` when
    ``allow_exact_matches=False``), pandas ``merge_asof`` backward semantics
    as a left join (unmatched left rows keep NULLs).

    The reference's closest construct is the era-builder's
    "latest fact at or before the period end" subquery pattern
    (MSSQL/OMOPLoader.sql:957-958, 1546); web-pipeline uses: latest crawl
    snapshot per url as of T, last user action before an error event.

    Spark-first plan — NOT a range join: a range/theta join fans out
    O(|left| x matches) rows before picking one winner.  Instead both sides
    are unioned and sorted once per key (ONE shuffle, the window exchange)
    and the match is a running ``last(payload, ignorenulls)`` forward fill:

      union(right{key, ts, side=a, payload}, left{key, ts, side=b, ...})
        -> window(partitionBy key, orderBy ts, side, tie) last(payload)
        -> keep left rows

    Side ordering encodes the boundary rule: with exact matches allowed the
    right row sorts BEFORE an equal-ts left row (eligible), with strict
    inequality AFTER (excluded by the rows-up-to-current frame).  Equal-ts
    right rows are tie-broken by ``tie_col`` ascending + last(), i.e. the
    max ``tie_col`` wins — deterministic across retries and partitionings.

    ``tolerance`` (an SQL interval string, e.g. ``"INTERVAL 6 HOUR"``) bounds
    the lookback: a match older than ``left_ts - tolerance`` becomes NULL.
    Applied post-fill — correct because the fill already selected the
    *newest* eligible match; if that one is out of window, all others are
    older and out of window too.

    At 100 TB: one shuffle on ``on`` — co-partition both inputs on the key
    (bucketed tables) and the exchange disappears.  A pathologically hot key
    serializes its window sort; pre-split such keys by a coarse time bucket
    (run per-bucket as-of, then one cross-bucket repair pass) — same
    technique as the salted equi-join above, documented rather than implicit.
    """
    payload_fields = [F.col(right_ts).alias("_rts")] + [
        F.col(c) for c in right_cols
    ]
    side_right = 0 if allow_exact_matches else 1
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(side_right).alias("_side"),
        (F.col(tie_col) if tie_col else F.lit(0)).cast("long").alias("_tie"),
        F.struct(*payload_fields).alias("_p"),
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1 - side_right).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        r.unionByName(l, allowMissingColumns=True)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .where(F.col("_side") == (1 - side_right))
    )
    if tolerance is not None:
        filled = filled.withColumn(
            "_m",
            F.when(
                F.col("_m._rts") >= F.col("_t") - F.expr(tolerance), F.col("_m")
            ),
        )
    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("_m._rts").alias(f"{prefix}{right_ts}"))
    out_cols += [F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in right_cols]
    return filled.select(*out_cols)


def decorrelated_scalar_agg(
    base: DataFrame,
    facts: DataFrame,
    key: str,
    agg_col: Column,
    out_name: str,
    how: str = "left",
) -> DataFrame:
    """A4: replace a correlated scalar subquery with one pre-aggregation +
    left join (end-date imputation, MSSQL/OMOPLoader.sql:957-958 — the
    reference authors note the correlated form is slow; one pass over the
    fact table instead of N)."""
    agg = facts.groupBy(key).agg(agg_col.alias(out_name))
    return base.join(agg, on=key, how=how)
