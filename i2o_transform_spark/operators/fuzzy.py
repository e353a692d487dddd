"""Typo-tolerant fuzzy entity linking: SymSpell deletion-neighborhood
blocking + exact Levenshtein verification.

The reference links surface codes to concepts with an *exact* dictionary
equi-join (``concept_cd = c_basecode``, MSSQL/OMOPLoader.sql:763-764).
Web text is noisy — mentions carry typos — so the web-scale KG builder also
needs an edit-distance-1 linking path that does NOT cross-join 10^12
mentions against the vocabulary.

Blocking scheme (Garbe's SymSpell, symmetric-delete): two strings are within
Levenshtein distance 1 **iff** their radius-1 deletion neighborhoods
(the string itself plus every single-character deletion) intersect —
substitution deletes the differing position from both; insertion/deletion
makes the shorter string a member of the longer one's neighborhood; equality
is the string itself.  So:

1. explode each mention into its ≤ len+1 deletion variants (JVM-side
   ``transform`` over ``sequence`` — no UDF),
2. equi-join against the *broadcast* exploded dictionary (the dictionary is
   vocabulary, not data: |dict| × avg_len rows stays driver-collectable),
3. verify candidates with the built-in ``levenshtein`` (codegen'd),
4. elect per mention with ``min`` over a PACKED long ``dist * 2^48 +
   entity_id`` — a struct-min would force a ``SortAggregate`` (struct
   buffers are not UnsafeRow-mutable); the packed primitive keeps the
   election a map-side-combining ``HashAggregate``.  Duplicate candidate
   pairs reached through several shared variants are harmless to the min,
   so NO ``distinct`` is needed and the whole operator costs exactly ONE
   shuffle (the final per-mention aggregation).  Entity ids must be in
   [0, 2^48) — enforced with an ``assert_true`` on the (vocab-sized)
   dictionary side; the winner's name is recovered through a second
   broadcast join against the dictionary (free).

Completeness for dist ≤ 1 is property-tested against the brute-force cross
join (tests/test_truth_fuzzy.py); the registered query's DuckDB oracle IS
the brute-force cross join, so a blocking miss fails the value hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column) -> Column:
    """Radius-1 deletion neighborhood of a string column, self included.
    ``sequence`` is guarded for the empty string (Spark's sequence(1, 0)
    would yield a *descending* range, not an empty one)."""
    deletions = F.when(
        F.length(col) > 0,
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: F.concat(
                col.substr(F.lit(1), i - 1),
                col.substr(i + 1, F.length(col) - i),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_union(F.array(col), deletions)


def fuzzy_link(
    mentions: DataFrame,
    dictionary: DataFrame,
    mention_col: str = "mention",
    name_col: str = "entity_name",
    entity_col: str = "entity_id",
    max_dist: int = 1,
) -> DataFrame:
    """Link each mention row to its best dictionary entity within
    ``max_dist`` edits (radius-1 blocking is complete only for
    ``max_dist=1``; larger radii would need deeper deletion neighborhoods).

    Returns the mention frame's columns + (entity_col, name_col, dist) for
    mentions that matched; unmatched mentions are dropped (left-join
    upstream if you need them).  Winner = smallest (dist, entity_id).
    """
    if max_dist != 1:
        raise ValueError("radius-1 symmetric-delete blocking covers dist<=1")
    eid_ok = (F.col(entity_col) >= 0) & (F.col(entity_col) < F.lit(1 << 48))
    # the guard lives INSIDE the used column (a standalone assert_true
    # projection would be pruned as dead by the optimizer)
    checked = dictionary.select(
        F.when(eid_ok, F.col(entity_col).cast("long"))
        .otherwise(
            F.raise_error(F.lit("fuzzy_link: entity ids must be in [0, 2^48)"))
        )
        .alias("_eid"),
        F.col(name_col).alias("_ename"),
    )
    dict_side = checked.select(
        "_eid",
        "_ename",
        F.explode(deletion_variants(F.col("_ename"))).alias("_variant"),
    )
    m = mentions.withColumn(
        "_variant", F.explode(deletion_variants(F.col(mention_col)))
    )
    cand = m.join(F.broadcast(dict_side), "_variant").withColumn(
        "_dist", F.levenshtein(F.col(mention_col), F.col("_ename"))
    )
    cand = cand.where(F.col("_dist") <= max_dist)
    keep = [c for c in mentions.columns]
    # packed-long election: HashAggregate (a struct-min would sort)
    packed = (F.col("_dist").cast("long") * F.lit(1 << 48)) + F.col("_eid")
    elected = cand.groupBy(*keep).agg(F.min(packed).alias("_p"))
    elected = elected.select(
        *keep,
        (F.col("_p") % F.lit(1 << 48)).alias("_eid"),
        F.shiftright(F.col("_p"), 48).cast("long").alias("dist"),
    )
    names = checked.select(
        F.col("_eid"), F.col("_ename")
    )
    return elected.join(F.broadcast(names), "_eid").select(
        *keep,
        F.col("_eid").alias(entity_col),
        F.col("_ename").alias(name_col),
        "dist",
    )


def fuzzy_link_bruteforce(
    mentions: DataFrame,
    dictionary: DataFrame,
    mention_col: str = "mention",
    name_col: str = "entity_name",
    entity_col: str = "entity_id",
    max_dist: int = 1,
) -> DataFrame:
    """Cross-join reference implementation (test oracle; O(|M|·|D|))."""
    dict_side = dictionary.select(
        F.col(entity_col).alias("_eid"), F.col(name_col).alias("_ename")
    )
    cand = mentions.crossJoin(F.broadcast(dict_side)).withColumn(
        "_dist", F.levenshtein(F.col(mention_col), F.col("_ename"))
    )
    cand = cand.where(F.col("_dist") <= max_dist)
    keep = [c for c in mentions.columns]
    elected = cand.groupBy(*keep).agg(
        F.min(
            F.struct(
                F.col("_dist").alias("d"),
                F.col("_eid").alias("e"),
                F.col("_ename").alias("n"),
            )
        ).alias("_w")
    )
    return elected.select(
        *keep,
        F.col("_w.e").alias(entity_col),
        F.col("_w.n").alias(name_col),
        F.col("_w.d").cast("long").alias("dist"),
    )
