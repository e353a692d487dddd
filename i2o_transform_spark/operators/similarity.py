"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(Q*N), acceptable when the query
set is broadcastable.  Scale path: LSH-bucketed (random hyperplane signs)
candidate pruning — each doc lands in one bucket per table, queries probe
their bucket(s) only.

Dot products use F.zip_with + F.aggregate in double precision, sequential
left-to-right — JVM-side, deterministic, and reproducible by the DuckDB
oracle (list_cosine_similarity).  A vectorized pandas UDF alternative exists
for very high dimensions; at 64-1024 dims the built-in expression wins by
staying inside codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the query set against the corpus,
    rank per query.  One shuffle (the per-query top-k window); at scale the
    window is replaced by a partial top-k per partition via AQE — Catalyst
    already pushes the rank filter into the window (TopK optimization).
    Returns (query_id, vec_id, rank)."""
    joined = corpus.crossJoin(F.broadcast(queries))
    scored = joined.where(F.col(id_col) != F.col(q_id_col)).select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank")
    )


def _hyperplane_sig(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into a
    long.  Planes are fixed constants -> pure codegen expressions."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.lit(0.0)
        # constant-folded per-dimension multiply-add
        for d, w in enumerate(plane):
            if w != 0.0:
                dot = dot + F.element_at(vec, d + 1).cast("double") * F.lit(w)
        sig = sig + F.when(dot > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig


def _fixed_planes(dim: int, num_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (pure function of seed)."""
    planes = []
    state = seed
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            # xorshift64* PRNG — frozen, dependency-free
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            row.append(((state % 2001) - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    dim: int = 64,
    num_planes: int = 6,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: multi-table random-hyperplane LSH instead of a
    cross join.  Each of ``num_tables`` independent tables hashes a vector to
    one of 2^num_planes buckets; candidates = union over tables of same-bucket
    pairs (recall grows with tables, candidate count with tables/2^planes).
    At 10^12 vectors this replaces the O(Q*N) scan with
    O(Q * N * tables / 2^planes); the bucket join shuffles only candidates.
    Returns (query_id, vec_id, rank) — approximate (recall < 1)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    # one (tables*planes) x dim matrix; signatures = one matmul per Arrow
    # batch.  (The expression-tree variant constant-folded tables*planes*dim
    # multiply-adds into codegen — a compile-time bomb at high dims.)
    planes_mat = np.array(
        [
            row
            for t in range(num_tables)
            for row in _fixed_planes(dim, num_planes, seed=42 + 7919 * t)
        ]
    )  # (num_tables*num_planes, dim)
    powers = np.array([1 << i for i in range(num_planes)], dtype=np.int64)
    table_off = (np.arange(num_tables, dtype=np.int64) << 32)

    @pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # n x dim
        bits = (m @ planes_mat.T) > 0  # n x (tables*planes)
        per_tab = bits.reshape(len(m), num_tables, num_planes)
        sigs = (per_tab * powers).sum(axis=2).astype(np.int64) + table_off
        return pd.Series(list(sigs))

    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(_buckets(F.col(vec_col))).alias("_bucket"),
    )
    q = queries.select(
        F.col(q_id_col),
        F.col(q_vec_col),
        F.explode(_buckets(F.col(q_vec_col))).alias("_bucket"),
    )
    joined = c.join(F.broadcast(q), "_bucket")
    cand = joined.where(F.col(id_col) != F.col(q_id_col)).dropDuplicates(
        [q_id_col, id_col]
    )
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank")
    )


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = 4096,
    iters: int = 10,
) -> np.ndarray:
    """Spherical k-means on a BOUNDED, deterministic sample — the IVF coarse
    quantizer.  At 10^12 vectors the sample stays 4096 rows (one bounded
    collect, standard IVF practice: train the quantizer on a sample, assign
    the full corpus distributed); determinism comes from ordering the sample
    by id rather than sampling randomly.  Returns L2-normalized centroids
    (n_centroids x dim), so nearest-by-cosine == argmax dot product."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    x = np.array([r[1] for r in rows], dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    n_centroids = min(n_centroids, len(x))
    # deterministic init: spread seeds across the ordered sample
    idx = np.linspace(0, len(x) - 1, n_centroids).astype(int)
    cents = x[idx].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)  # spherical: max cosine
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    return cents


def assign_cells(
    df: DataFrame,
    centroids: "np.ndarray",
    vec_col: str = "embedding",
    out_col: str = "_cell",
) -> DataFrame:
    """Map-side nearest-centroid assignment (the IVF coarse quantizer applied
    to a frame): centroids ship as a broadcast variable, one matmul per Arrow
    batch, no shuffle.  Identical vectors always land in the same cell."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    sc = df.sparkSession.sparkContext
    bc_cents = sc.broadcast(np.asarray(centroids, dtype=np.float64))

    @pandas_udf(IntegerType())
    def _cell(vecs: pd.Series) -> pd.Series:
        cents = bc_cents.value
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cents.T).argmax(axis=1).astype(np.int32))

    return df.withColumn(out_col, _cell(F.col(vec_col)))


def semantic_dedup_pairs(
    corpus: DataFrame,
    tau: float = 0.99,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embedding-level near-duplicate pairs via
    k-means partitioning — cluster the corpus with the IVF coarse quantizer,
    then compare pairs ONLY within a cell (exact cosine on candidates, so
    precision is 1 by construction; recall misses only near-dup pairs that
    straddle a cell boundary — byte-identical vectors always share a cell).

    Scale shape: the quadratic all-pairs comparison is bounded per cell
    (O(sum_c n_c^2), n_c ~ N/C), the cell id doubles as the shuffle key, and
    nothing driver-side grows with the corpus.  At 10^12 vectors C scales with
    N (FAISS-style sqrt(N) cells) keeping cells constant-sized.
    Reference analogue: the dedup/merge stored-procedure semantics
    (MSSQL/OMOPLoader.sql:1098-1143) lifted to embedding space.
    Returns (id_a, id_b) with id_a < id_b and cosine >= tau."""
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    cells = assign_cells(corpus, centroids, vec_col=vec_col)
    a = cells.select(
        F.col("_cell"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = cells.select(
        F.col("_cell"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, "_cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cosine(F.col("_va"), F.col("_vb")) >= tau)
        .select("id_a", "id_b")
    )


def semantic_dedup_survivors(
    corpus: DataFrame,
    tau: float = 0.99,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """SemDeDup keep-set: greedily drop every vector that has a near-duplicate
    with a smaller id (the deterministic survivor election used by the text
    dedup family, w2_preference_dedup's rule in embedding space).  One
    broadcast-able anti-join over the dropped-id set."""
    pairs = semantic_dedup_pairs(
        corpus, tau=tau, n_centroids=n_centroids, id_col=id_col,
        vec_col=vec_col, centroids=centroids,
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(dropped, id_col, "left_anti").select(id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the k-means-partitioned scale
    path, complementing the LSH variant above.  Coarse quantizer: spherical
    k-means centroids (trained on a bounded sample, shipped to executors as
    a Spark BROADCAST VARIABLE, not closure-captured literals).  Each corpus
    vector is assigned to its nearest centroid cell map-side (one matmul per
    Arrow batch); each query probes its ``n_probe`` nearest cells.  Scoring
    touches only corpus rows in probed cells: O(Q * N * n_probe/C) instead
    of O(Q * N).  At 100 TB the cell assignment doubles as the partitioning
    key, so a cell's postings list is co-located and the probe join shuffles
    nothing but candidates.  Returns (query_id, vec_id, rank) — approximate
    (recall < 1, grows with n_probe)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, IntegerType

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    sc = corpus.sparkSession.sparkContext
    bc_cents = sc.broadcast(np.asarray(centroids, dtype=np.float64))
    n_probe = min(n_probe, len(centroids))

    @pandas_udf(IntegerType())
    def _cell(vecs: pd.Series) -> pd.Series:
        cents = bc_cents.value
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cents.T).argmax(axis=1).astype(np.int32))

    @pandas_udf(ArrayType(IntegerType()))
    def _probe_cells(vecs: pd.Series) -> pd.Series:
        cents = bc_cents.value
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cents.T  # n x C
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    c = corpus.select(id_col, vec_col, _cell(F.col(vec_col)).alias("_cell"))
    q = queries.select(
        q_id_col,
        q_vec_col,
        F.explode(_probe_cells(F.col(q_vec_col))).alias("_cell"),
    )
    cand = c.join(F.broadcast(q), "_cell").where(F.col(id_col) != F.col(q_id_col))
    scored = cand.select(
        F.col(q_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(q_vec_col)).alias("_sim"),
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("_sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(q_id_col, id_col, "rank")
    )
