"""Term-dictionary encoding: RDF terms -> fixed-width integer ids.

Every triple store that survives 10^12 triples stores (s, p, o) as
integers, not strings — joins, sorts, shuffles and page layouts all get
~10x cheaper when a 60-byte IRI becomes 8 bytes.  The reference keeps its
concepts integer-keyed for the same reason (the i2b2/OMOP concept_id
columns its crosswalk joins ride on, MSSQL/OMOPLoader.sql mapping-table
joins); this module derives those integer keys for an open-world term
vocabulary instead of assuming a curated one.

Two id-assignment strategies, deliberately different scale shapes:

``hash``   — ``xxhash64(term)``.  JOIN-FREE: encoding a triple batch is a
             pure map-side projection (three hash calls), so the 10^12-row
             encode pass does ZERO shuffles and needs no dictionary at
             encode time.  The price is a ~2^-64 per-pair collision
             probability; :func:`collision_audit` measures it exactly (one
             aggregation over the vocabulary) so the risk is OBSERVED, not
             assumed.  This is the scale default.

``dense``  — exact ``ROW_NUMBER() OVER (ORDER BY term) - 1`` semantics
             (compact 0..N-1, sorted — what a front-coded dictionary page
             layout wants) WITHOUT the single-partition window that the
             naive formulation plans: range-repartition the vocabulary,
             localCheckpoint to pin partition assignment (range sampling
             is otherwise free to re-draw between the two jobs), count
             rows per partition (a #partitions-sized driver collect),
             prefix-sum the offsets, and window only WITHIN partitions.
             ceil-log-free: exactly one range exchange + one per-partition
             sort, any vocabulary size.

Encoding with an explicit dictionary (dense ids) is three repartition
joins keyed on the term — at scale you do it once, persist the encoded
fact table, and never touch strings again; with ``hash`` ids you skip
even that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "build_term_dictionary",
    "encode_triples",
    "decode_triples",
    "collision_audit",
]

_ROLES = ("subj", "pred", "obj")


def _vocabulary(triples: DataFrame, columns: tuple[str, ...]) -> DataFrame:
    """Distinct union of every term position — ONE distinct exchange on
    the unioned stream (Spark plans union-then-HashAggregate; each input
    is pruned to its single column before the exchange)."""
    parts = [triples.select(F.col(c).alias("term")) for c in columns]
    vocab = parts[0]
    for p in parts[1:]:
        vocab = vocab.unionByName(p)
    return vocab.where(F.col("term").isNotNull()).distinct()


def build_term_dictionary(
    triples: DataFrame,
    columns: tuple[str, ...] = _ROLES,
    method: str = "hash",
    num_partitions: int | None = None,
) -> DataFrame:
    """(term, term_id) over the distinct terms of ``columns``.

    ``hash``: term_id = xxhash64(term) — stateless, reproducible across
    clusters and runs, encode needs no dictionary at all.
    ``dense``: term_id = rank of the term in global sorted order,
    0-based — equals ``ROW_NUMBER() OVER (ORDER BY term) - 1`` exactly,
    built without any single-partition stage (see module docstring).
    """
    vocab = _vocabulary(triples, columns)
    if method == "hash":
        return vocab.select("term", F.xxhash64("term").alias("term_id"))
    if method != "dense":
        raise ValueError(f"unknown dictionary method: {method!r}")

    spark = triples.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    # Pin the range-partition assignment: the sampling pass behind
    # repartitionByRange may re-draw if the frame is recomputed, and the
    # counts job + the id job below MUST see identical partitioning.
    ranged = (
        vocab.repartitionByRange(n_parts, "term")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr: Column = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in offsets.items() for v in kv]
        ),
        F.col("_pid"),
    )
    w = Window.partitionBy("_pid").orderBy("term")
    return ranged.select(
        "term",
        (F.row_number().over(w).cast("long") - 1 + off_expr).alias("term_id"),
    )


def encode_triples(
    triples: DataFrame,
    dictionary: DataFrame | None = None,
    columns: tuple[str, ...] = _ROLES,
) -> DataFrame:
    """(s_id, p_id, o_id [, passthrough cols]) from string triples.

    With ``dictionary=None`` the ids are xxhash64 — a map-side projection,
    no dictionary, no shuffle (THE property that makes hash ids the
    10^12-row default).  With an explicit (term, term_id) frame each term
    column resolves through one equi-join; term positions absent from the
    dictionary would silently drop under an inner join, so the joins are
    INNER by role but the caller's dictionary is total by construction
    when built over the same frame."""
    passthrough = [c for c in triples.columns if c not in columns]
    if dictionary is None:
        return triples.select(
            *[F.xxhash64(c).alias(f"{_short(c)}_id") for c in columns],
            *passthrough,
        )
    out = triples
    for c in columns:
        d = dictionary.select(
            F.col("term").alias(c), F.col("term_id").alias(f"{_short(c)}_id")
        )
        out = out.join(d, c, "inner")
    return out.select(
        *[f"{_short(c)}_id" for c in columns], *passthrough
    )


def decode_triples(
    encoded: DataFrame,
    dictionary: DataFrame,
    columns: tuple[str, ...] = _ROLES,
) -> DataFrame:
    """Inverse of :func:`encode_triples`: resolve each ``*_id`` column back
    to its term through the dictionary (three equi-joins; at scale the
    dictionary is the small side and AQE broadcast-joins it when it
    fits)."""
    passthrough = [
        c
        for c in encoded.columns
        if c not in {f"{_short(x)}_id" for x in columns}
    ]
    out = encoded
    for c in columns:
        idc = f"{_short(c)}_id"
        d = dictionary.select(
            F.col("term_id").alias(idc), F.col("term").alias(c)
        )
        out = out.join(d, idc, "inner")
    return out.select(*columns, *passthrough)


def collision_audit(
    triples: DataFrame, columns: tuple[str, ...] = _ROLES
) -> DataFrame:
    """ONE row: (n_terms, n_ids, n_collisions) for the hash-id space over
    the frame's vocabulary — n_collisions = terms whose xxhash64 id is
    shared with a DIFFERENT term.  One vocabulary-sized aggregation; run
    it whenever a corpus grows past the point where 2^-64-per-pair stops
    being obviously negligible (birthday bound reaches ~1e-8 total around
    ~10^9 distinct terms)."""
    vocab = _vocabulary(triples, columns).select(
        "term", F.xxhash64("term").alias("term_id")
    )
    per_id = vocab.groupBy("term_id").agg(F.count(F.lit(1)).alias("_n"))
    return per_id.agg(
        F.sum("_n").cast("long").alias("n_terms"),
        F.count(F.lit(1)).cast("long").alias("n_ids"),
        F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_collisions"),
    )


def _short(col: str) -> str:
    return {"subj": "s", "pred": "p", "obj": "o"}.get(col, col)
