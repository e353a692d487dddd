"""Knowledge-graph embedding training: distributed TransE (margin-ranking,
L1) by per-partition gradient accumulation + driver-side parameter step.

The KG this pipeline constructs feeds embedding trainers; scoring and rank
evaluation already live in operators/ranking.py and queries' kg_transe_eval
— this module closes the loop with the TRAINING pass, the one genuinely
iterative-ML operator Spark's relational algebra can't express (so it is
the documented Pandas-UDF case: ``mapInPandas`` over Arrow batches, zero
per-row Python).

Algorithm (TransE, Bordes et al. NeurIPS 2013 — public literature): score
d(h,r,t) = ||E[h] + R[r] - E[t]||_1; minimize the margin-ranking hinge
max(0, margin + d_pos - d_neg) over hash-corrupted negatives; entity rows
renormalized to unit L2 each round per the paper.

Distribution scheme — synchronous full-batch gradient with broadcast
parameters (the parameter-mixing layout, cf. Zinkevich et al.'s parallel
SGD; public literature):

* the TRIPLES side is unbounded and fully distributed: each round is one
  ``mapInPandas`` pass computing per-partition gradient SUMS (a few rows
  per distinct id per partition), then ONE hash aggregation keyed on
  (kind, id) with per-dimension ``sum`` columns — map-side combine
  applies, the exchange carries vocab-sized data;
* the PARAMETER side is vocab x dim and lives broadcast, updated on the
  driver between rounds — the same explicit bound the entity linker
  already enforces (``max_vocab`` asserts, loud ValueError): if the
  embedding table fits no executor, no scheme that broadcasts scores
  fits either;
* determinism: negatives come from ``xxhash``-style integer mixing of
  (h, r, t, round, j) — no RNG state — and init is a seeded NumPy
  generator, so two runs on the same input produce the same model up to
  float summation order (gradient sums cross partitions; qualitative
  gates, not bit-hashes, are the cross-run contract).

Refused, not approximated: asynchronous per-partition SGD (Hogwild) —
parameter divergence across partitions would make results partitioning-
dependent; the synchronous full-batch step trades rounds for exactness.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_VOCAB = 2_000_000  # ids x dim doubles must broadcast comfortably

_MIX = np.uint64(0x9E3779B97F4A7C15)
_SEED0 = np.uint64(0x243F6A8885A308D3)


def _mix_vec(n: int, *vals) -> np.ndarray:
    """Deterministic vectorized 64-bit mixing (splitmix64-style constants)
    — negative sampling without RNG state, entirely inside NumPy (uint64
    multiplication wraps mod 2^64 by definition, no per-row Python)."""
    h = np.full(n, _SEED0, dtype=np.uint64)
    for v in vals:
        arr = np.asarray(v, dtype=np.int64).astype(np.uint64)
        h = (h ^ arr) * _MIX
        h ^= h >> np.uint64(31)
    return h


def _index(df: DataFrame, col: str) -> list:
    vals = [r[0] for r in df.select(col).distinct().orderBy(col).collect()]
    if len(vals) > MAX_VOCAB:
        raise ValueError(
            f"{col} vocabulary {len(vals)} exceeds MAX_VOCAB={MAX_VOCAB}; "
            "the broadcast-parameter layout does not apply — shard the "
            "graph by relation or train per partition domain"
        )
    return vals


def train_transe(
    triples: DataFrame,
    dim: int = 16,
    rounds: int = 30,
    lr: float = 0.1,
    margin: float = 1.0,
    neg_per_pos: int = 2,
    seed: int = 7,
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
):
    """Train TransE embeddings on (subj, pred, obj) triples.  Returns
    ``(entities, relations, E, R, losses)``: the id lists (position =
    embedding row), the NumPy embedding matrices, and the per-round hinge
    loss means (monotone-ish decreasing on learnable structure — the
    qualitative training gate)."""
    spark = triples.sparkSession
    ents = _index(
        triples.select(F.col(subj).alias("x"))
        .union(triples.select(F.col(obj).alias("x"))), "x"
    )
    rels = _index(triples.select(F.col(pred).alias("x")), "x")
    e_idx = {v: i for i, v in enumerate(ents)}
    r_idx = {v: i for i, v in enumerate(rels)}
    n_e = len(ents)

    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    E = rng.uniform(-bound, bound, size=(n_e, dim))
    R = rng.uniform(-bound, bound, size=(len(rels), dim))
    R /= np.maximum(np.linalg.norm(R, axis=1, keepdims=True), 1e-12)

    e_map = F.create_map(
        *[x for v, i in e_idx.items() for x in (F.lit(v), F.lit(i))]
    )
    r_map = F.create_map(
        *[x for v, i in r_idx.items() for x in (F.lit(v), F.lit(i))]
    )
    pos = (
        triples.select(
            e_map[F.col(subj)].alias("h"),
            r_map[F.col(pred)].alias("r"),
            e_map[F.col(obj)].alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    n_pos = pos.count()
    g_cols = ", ".join(f"g{i} double" for i in range(dim))
    out_schema = f"kind string, id long, cnt long, {g_cols}"
    sc = spark.sparkContext
    losses: list[float] = []

    for rnd in range(rounds):
        bE = sc.broadcast(E)
        bR = sc.broadcast(R)

        def _grads(
            batches: Iterator[pd.DataFrame], _rnd=rnd
        ) -> Iterator[pd.DataFrame]:
            Eb, Rb = bE.value, bR.value
            for pdf in batches:
                h = pdf["h"].to_numpy(np.int64)
                r = pdf["r"].to_numpy(np.int64)
                t = pdf["t"].to_numpy(np.int64)
                gE = np.zeros_like(Eb)
                gR = np.zeros_like(Rb)
                loss = 0.0
                n_pairs = 0
                for j in range(neg_per_pos):
                    # deterministic corruption: tails on even j, heads odd
                    mixed = _mix_vec(
                        len(h), h, r, t,
                        np.full(len(h), _rnd), np.full(len(h), j),
                    )
                    corrupt = (
                        (t if j % 2 == 0 else h)
                        + 1 + (mixed % np.uint64(n_e - 1)).astype(np.int64)
                    ) % n_e
                    h2 = h if j % 2 == 0 else corrupt
                    t2 = corrupt if j % 2 == 0 else t
                    dp_v = Eb[h] + Rb[r] - Eb[t]
                    dn_v = Eb[h2] + Rb[r] - Eb[t2]
                    viol = (
                        margin
                        + np.abs(dp_v).sum(1)
                        - np.abs(dn_v).sum(1)
                    )
                    mask = viol > 0
                    loss += float(viol[mask].sum())
                    n_pairs += len(h)
                    if not mask.any():
                        continue
                    sp = np.sign(dp_v[mask])
                    sn = np.sign(dn_v[mask])
                    np.add.at(gE, h[mask], sp)
                    np.add.at(gE, t[mask], -sp)
                    np.add.at(gR, r[mask], sp - sn)
                    np.add.at(gE, h2[mask], -sn)
                    np.add.at(gE, t2[mask], sn)
                g_names = [f"g{i}" for i in range(dim)]
                parts = []
                for kind, G in (("e", gE), ("r", gR)):
                    nz = np.flatnonzero(np.abs(G).sum(1))
                    part = pd.DataFrame(G[nz], columns=g_names)
                    part.insert(0, "cnt", 1)
                    part.insert(0, "id", nz.astype(np.int64))
                    part.insert(0, "kind", kind)
                    parts.append(part)
                loss_row = pd.DataFrame(
                    [["loss", 0, n_pairs, loss] + [0.0] * (dim - 1)],
                    columns=["kind", "id", "cnt"] + g_names,
                )
                parts.append(loss_row)
                yield pd.concat(parts, ignore_index=True)

        sums = (
            pos.mapInPandas(_grads, schema=out_schema)
            .groupBy("kind", "id")
            .agg(F.sum("cnt").alias("cnt"),
                 *[F.sum(f"g{i}").alias(f"g{i}") for i in range(dim)])
            .collect()
        )
        step = lr / max(n_pos, 1)
        for row in sums:
            g = np.array([row[f"g{i}"] for i in range(dim)])
            if row["kind"] == "e":
                E[row["id"]] -= step * g
            elif row["kind"] == "r":
                R[row["id"]] -= step * g
            else:
                losses.append(row["g0"] / max(row["cnt"], 1))
        E /= np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
        bE.unpersist()
        bR.unpersist()
    return ents, rels, E, R, losses


def score_all_tails(
    spark,
    queries: DataFrame,
    ents: list,
    rels: list,
    E: np.ndarray,
    R: np.ndarray,
    scale: int = 1_000_000,
) -> DataFrame:
    """Distributed all-candidate TransE scoring: one row per (query,
    candidate tail) with an INTEGER-quantized L1 score (``round(d *
    scale)`` — integer scores are what operators/ranking's deterministic
    tie-break contract wants).  ``queries``: (h, r) id columns.  The
    candidate fan-out happens INSIDE the Arrow batch (one |batch| x n_e
    matmul-shaped broadcast op per batch), never as a crossJoin exchange.
    """
    e_idx = {v: i for i, v in enumerate(ents)}
    r_idx = {v: i for i, v in enumerate(rels)}
    sc = spark.sparkContext
    bE = sc.broadcast(E)
    bR = sc.broadcast(R)
    b_ei = sc.broadcast(e_idx)
    b_ri = sc.broadcast(r_idx)
    ents_b = sc.broadcast(list(ents))

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Eb, Rb = bE.value, bR.value
        ei, ri = b_ei.value, b_ri.value
        cand_names = ents_b.value
        n = len(cand_names)
        for pdf in batches:
            hi = pdf["h"].map(ei).to_numpy(np.int64)
            rj = pdf["r"].map(ri).to_numpy(np.int64)
            base = Eb[hi] + Rb[rj]                       # |b| x dim
            d = np.abs(base[:, None, :] - Eb[None, :, :]).sum(2)
            q = np.rint(d * scale).astype(np.int64)      # |b| x n_e
            yield pd.DataFrame({
                "h": pdf["h"].to_numpy().repeat(n),
                "r": pdf["r"].to_numpy().repeat(n),
                "cand": cand_names * len(pdf),
                "score": q.reshape(-1),
            })

    h_t = queries.schema["h"].dataType.simpleString()
    r_t = queries.schema["r"].dataType.simpleString()
    c_t = "string" if isinstance(ents[0], str) else "long"
    return queries.mapInPandas(
        _score, schema=f"h {h_t}, r {r_t}, cand {c_t}, score long"
    )
