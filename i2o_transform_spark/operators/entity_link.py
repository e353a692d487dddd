"""Embedding-based entity-link scoring.

The reference links a surface code to its concept with a dictionary equi-join
(``concept_cd = c_basecode``, MSSQL/OMOPLoader.sql:763-764) and *fans out* on
1->many mappings.  A web-scale KG builder needs the second half of the
north-star contract — "dictionary/embedding entity-link scoring": when a
surface form is ambiguous (several candidate entities), score every candidate
against the mention's context embedding and elect the argmax.

Two physical strategies, property-tested equal (tests/test_operators.py):

* :func:`embedding_disambiguate` — pure DataFrame, **zero added shuffle**.
  The candidate dictionary is pre-grouped to one row per surface carrying an
  ``array<struct<entity_id, emb>>`` (sorted by entity_id), broadcast, and
  joined 1:1 — the mention frame never fans out and never re-aggregates.
  The argmax is a left-to-right ``F.aggregate`` fold over the candidate
  array (strict ``>`` keeps the lowest entity_id on ties, deterministic).
  Linking is therefore entirely map-side; the only shuffles in a pipeline
  using it are the caller's own.

* :func:`embedding_disambiguate_pandas` — Arrow path for high-dimensional /
  many-candidate vocabularies where the per-element interpreted fold loses
  to BLAS: the per-surface candidate matrices ship once per executor as a
  Spark broadcast variable (never task-closure capture), and each Arrow
  batch is scored with one numpy matmul per surface group.  Also map-side
  only.

At 10^12 mentions the dictionary side stays broadcast-sized (it is
vocabulary, not data); if it ever is not, the same argmax runs after the
salted repartition join in ``operators.joins.salted_join`` — the election
fold is unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    LongType,
    StructField,
    StructType,
)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def group_candidates(
    candidates: DataFrame,
    surface_col: str = "surface",
    entity_col: str = "entity_id",
    vec_col: str = "emb",
) -> DataFrame:
    """(surface, entity_id, emb) -> one row per surface with the candidate
    list sorted by entity_id (the deterministic tie-break order)."""
    return candidates.groupBy(surface_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(entity_col).alias("e"), F.col(vec_col).alias("v")))
        ).alias("_cands")
    )


def embedding_disambiguate(
    mentions: DataFrame,
    candidates: DataFrame,
    surface_col: str = "surface",
    ctx_col: str = "ctx",
    entity_col: str = "entity_id",
    vec_col: str = "emb",
    out_col: str = "entity_id",
    keep_score: bool = False,
) -> DataFrame:
    """Resolve each mention row to the argmax-cosine candidate, map-side.

    mentions:   any columns + (surface_col, ctx_col: array<float|double>)
    candidates: (surface_col, entity_col, vec_col) — dictionary-sized.
    Returns the mention frame + ``out_col`` (and ``score`` when asked);
    mentions whose surface has no candidate are dropped (inner join, the
    reference's dictionary-join semantics)."""
    grouped = group_candidates(candidates, surface_col, entity_col, vec_col)
    joined = mentions.join(F.broadcast(grouped), surface_col)
    ctxn = _norm(F.col(ctx_col))
    # score every candidate once, then fold for the argmax; strict > keeps
    # the first (lowest-id, array is id-sorted) candidate on exact ties
    scored = F.transform(
        F.col("_cands"),
        lambda c: F.struct(
            c["e"].cast("long").alias("e"),
            (_dot(c["v"], F.col(ctx_col)) / (_norm(c["v"]) * ctxn)).alias("s"),
        ),
    )
    init = F.struct(
        F.lit(None).cast("long").alias("e"),
        F.lit(float("-inf")).cast("double").alias("s"),
    )
    best = F.aggregate(
        scored, init, lambda acc, c: F.when(c["s"] > acc["s"], c).otherwise(acc)
    )
    out = joined.withColumn("_best", best).drop("_cands")
    out = out.withColumn(out_col, F.col("_best.e"))
    if keep_score:
        out = out.withColumn("score", F.col("_best.s"))
    # restore the mention frame's column order (join moved the key first)
    keep = [c for c in mentions.columns if c != ctx_col] + [out_col]
    if keep_score:
        keep.append("score")
    return (
        out.drop("_best", ctx_col).where(F.col(out_col).isNotNull()).select(*keep)
    )


def embedding_disambiguate_pandas(
    mentions: DataFrame,
    candidates: DataFrame,
    surface_col: str = "surface",
    ctx_col: str = "ctx",
    entity_col: str = "entity_id",
    vec_col: str = "emb",
    out_col: str = "entity_id",
    keep_score: bool = False,
) -> DataFrame:
    """Arrow/BLAS twin of :func:`embedding_disambiguate`.

    The candidate dictionary is collected once on the driver (it is
    vocabulary-sized by contract — asserted), L2-normalized into one numpy
    matrix per surface, and shipped per-executor via ``sc.broadcast``.  Each
    Arrow batch is grouped by surface and scored with a single
    ``cand_matrix @ ctx_matrix.T`` matmul per group; argmax rows keep the
    lowest entity_id on exact ties (candidates are sorted by id)."""
    cand_rows = candidates.select(surface_col, entity_col, vec_col).collect()
    assert len(cand_rows) <= 1_000_000, (
        "candidate dictionary exceeds broadcast contract; pre-filter or use "
        "the salted-join path"
    )
    by_surface: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    tmp: dict[str, list[tuple[int, np.ndarray]]] = {}
    for r in cand_rows:
        v = np.asarray(r[vec_col], dtype=np.float64)
        tmp.setdefault(r[surface_col], []).append((int(r[entity_col]), v))
    for s, lst in tmp.items():
        lst.sort(key=lambda t: t[0])
        ids = np.array([e for e, _ in lst], dtype=np.int64)
        mat = np.stack([v for _, v in lst])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        by_surface[s] = (ids, mat)
    bc = mentions.sparkSession.sparkContext.broadcast(by_surface)

    passthrough = [c for c in mentions.columns if c != ctx_col]
    fields = [f for f in mentions.schema.fields if f.name != ctx_col]
    out_fields = list(fields) + [StructField(out_col, LongType())]
    if keep_score:
        out_fields.append(StructField("score", DoubleType()))
    out_schema = StructType(out_fields)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs = []
            for s, grp in pdf.groupby(surface_col, sort=False):
                hit = table.get(s)
                if hit is None:
                    continue
                ids, mat = hit
                ctx = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in grp[ctx_col]]
                )
                ctx = ctx / np.linalg.norm(ctx, axis=1, keepdims=True)
                scores = mat @ ctx.T  # (C, B)
                # argmax returns the FIRST max -> lowest entity_id on ties
                arg = np.argmax(scores, axis=0)
                res = grp[passthrough].copy()
                res[out_col] = ids[arg]
                if keep_score:
                    res["score"] = scores[arg, np.arange(len(grp))]
                outs.append(res)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return mentions.mapInPandas(run, out_schema)


def hashing_trick_embed(
    tokens_col: Column, dim: int = 64, seed: int = 7
) -> Column:
    """Deterministic hashing-trick bag-of-words embedding, pure JVM.

    Each token adds +-1 (sign from one hash bit) at ``xxhash64 % dim`` —
    the classic feature-hashing sketch.  Used as the *deterministic,
    dependency-free* context/entity encoder for the linking stage: on a real
    cluster this column is replaced by a model-served vector; everything
    downstream (scoring, election, plans) is encoder-agnostic.  Stays inside
    codegen — no UDF.  The numpy twin is
    :func:`i2o_transform_spark.plans.kg.hashing_trick_embed_np`."""

    def _acc(acc, t):
        hv = F.xxhash64(t, F.lit(seed))
        idx = F.pmod(hv, F.lit(dim))
        sign = F.when(F.pmod(F.shiftright(hv, 32), F.lit(2)) == 0, F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )
        return F.transform(
            acc, lambda v, i: F.when(i == idx.cast("int"), v + sign).otherwise(v)
        )

    zero = F.array_repeat(F.lit(0.0), dim)
    return F.aggregate(tokens_col, zero, _acc)
