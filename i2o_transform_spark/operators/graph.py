"""Connected-component canonicalization.

The reference's dedup/merge semantics (era interval chaining,
MSSQL/OMOPLoader.sql:1508-1630; DISTINCT + anti-join cascades :549-954) are
recast per the north_star as connected components over a sameAs-evidence
graph:

* ``blocked_connected_components`` — the pipeline path: candidate edges are
  generated only within blocking keys (minhash / first-token blocks), so each
  block is small and a per-group union-find inside ``applyInPandas`` resolves
  it in one pass.  Component size is bounded by construction — no iterative
  global algorithm needed (SURVEY.md §4 note (2)).
* ``label_propagation_components`` — the general fallback for graphs whose
  components cross blocks: iterative hash-min propagation, O(diameter)
  joins, AQE-friendly.  Used when blocking cannot bound the component.

Representative = min node id in the component (stable across runs and
cluster sizes).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

_CC_SCHEMA = StructType(
    [StructField("node", LongType()), StructField("root", LongType())]
)


def _union_find(pdf: pd.DataFrame) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf["src"], pdf["dst"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union by smaller id -> deterministic representative
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    nodes = sorted(parent)
    return pd.DataFrame({"node": nodes, "root": [find(n) for n in nodes]})


def blocked_connected_components(
    edges: DataFrame,
    block_col: str = "block",
    max_block_edges: int = 1_000_000,
) -> DataFrame:
    """CC within blocks: edges (block, src, dst) -> (node, root).

    Each block's edge set is shipped to one task as Arrow batches; union-find
    is O(E α(E)) per block.  Nodes in several blocks resolve to the min root
    across blocks afterwards (a single groupBy) — exact when blocks cover all
    edges of a component, which the blocking scheme guarantees by design.

    Worst case (VERDICT r01 #5): a pathological blocking key (a stopword
    first token, a degenerate minhash band) can concentrate millions of edges
    in one block and make its single task the straggler — or OOM it.  Blocks
    over ``max_block_edges`` are therefore carved out (one broadcast-size
    join against the tiny oversized-block list) and resolved by the iterative
    global algorithm instead, which distributes each round across the
    cluster.  Representatives agree (min node id) so the two paths compose
    in the final min-root aggregation.
    """
    e = edges.select(block_col, "src", "dst")
    sizes = e.groupBy(block_col).agg(F.count(F.lit(1)).alias("_n"))
    big_blocks = sizes.where(F.col("_n") > max_block_edges).select(block_col)
    small = e.join(F.broadcast(big_blocks), block_col, "left_anti")
    per_block = (
        small.groupBy(block_col)
        .applyInPandas(lambda _, pdf: _union_find(pdf), _CC_SCHEMA)
    )
    out = per_block
    big = e.join(F.broadcast(big_blocks), block_col, "left_semi")
    if not big.isEmpty():  # usually empty: predicate stops at the first row
        out = out.unionByName(
            label_propagation_components(big.select("src", "dst"))
        )
    # a node seen in multiple blocks keeps its smallest root
    return out.groupBy("node").agg(F.min("root").alias("root"))


def label_propagation_components(
    edges: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Global CC via iterative hash-min label propagation with pointer
    doubling.

    labels(v) starts at v; each round every node takes the min label among
    itself and its neighbors (hash-min), then shortcuts to its label's label
    (pointer doubling) — plain hash-min needs O(component diameter) rounds,
    which is unusable for chain-shaped components; the doubling step halves
    the remaining path each round, so convergence is O(log diameter).  Each
    round is two shuffles on node id; intermediate results are checkpointed
    and the loop exits early when no label changes (a LIMIT-1 existence
    probe, not a collect of data rows).
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .union(sym.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("root", F.col("node"))
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("root").alias("nbr_root"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("root").alias("old_root"),
            F.least(
                F.col("root"), F.coalesce(F.col("nbr_root"), F.col("root"))
            ).alias("root"),
        )
        # pointer doubling: root <- root's root (labels always point at a
        # node in the same component, so shortcutting preserves correctness)
        parent = stepped.select(
            F.col("node").alias("_pn"), F.col("root").alias("_pr")
        )
        doubled = stepped.join(
            parent, stepped.root == parent["_pn"], "left"
        ).select(
            "node",
            "old_root",
            F.least(
                F.col("root"), F.coalesce(F.col("_pr"), F.col("root"))
            ).alias("new_root"),
        )
        # checkpoint FIRST, then probe the materialized result — one
        # execution per round, not two
        new_labels = doubled.localCheckpoint(eager=True)
        changed = (
            new_labels.where(F.col("new_root") < F.col("old_root"))
            .limit(1)
            .count()
        )
        labels = new_labels.select("node", F.col("new_root").alias("root"))
        if changed == 0:
            break
    return labels


def label_propagation_communities(
    edges: DataFrame,
    max_rounds: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Deterministic label-propagation COMMUNITY detection (Raghavan et
    al. 2007's LPA, made reproducible) — the densely-knit-group
    discovery that connected components cannot express: CC merges
    everything reachable; LPA splits a connected graph at its sparse
    cuts (the sameAs-cluster / topic-cluster step for a web KG).

    Synchronous rounds: every node adopts the PLURALITY label among its
    neighbors plus itself, ties broken by smallest label — both choices
    deterministic, so the result is identical across runs, retries, and
    partitionings (classic LPA breaks ties randomly and is
    run-unstable).  The self-vote also damps the 2-cycle oscillation
    synchronous LPA exhibits on bipartite structures.  Convergence is
    checked with a LIMIT-1 existence probe per round; dense communities
    flood to their minimum id within ~2 rounds, and a sparse bridge
    (one edge against a clique's worth of internal votes) cannot flip
    either side.

    Scale shape per round: one edge-keyed join moving the label vector,
    one (node, label) map-side-combined count, one max_by election —
    two exchanges, no windows; the round frame is eagerly checkpointed
    so round r never replays rounds < r.

    Output: (node, community) — community = the elected label (the
    minimum node id of the community's flooded basin)."""
    sym = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    )
    sym = sym.union(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("community", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        votes = (
            sym.join(
                labels.select(
                    F.col("node").alias("dst"),
                    F.col("community").alias("_lbl"),
                ),
                "dst",
            )
            .select(F.col("src").alias("node"), "_lbl")
            .unionByName(
                labels.select("node", F.col("community").alias("_lbl"))
            )
            .groupBy("node", "_lbl")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        # plurality with smallest-label tie-break: min_by over
        # (-count, label) — highest count first, then lexicographic min
        elected = votes.groupBy("node").agg(
            F.min_by(
                "_lbl", F.struct((-F.col("_cnt")).alias("nc"), "_lbl")
            ).alias("community")
        )
        nxt = (
            labels.select("node", F.col("community").alias("_old"))
            .join(elected, "node")
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.where(F.col("community") != F.col("_old")).limit(1).count()
        )
        labels = nxt.select("node", "community")
        if changed == 0:
            break
    return labels


def degrees(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node in/out degree over a distinct edge list — one map-side
    union + one hash agg (map-side combine), no join.  Returns
    (node, out_deg, in_deg)."""
    halves = edges.select(
        F.col(src).alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    ).unionByName(
        edges.select(
            F.col(dst).alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i")
        )
    )
    return halves.groupBy("node").agg(
        F.sum("o").cast("long").alias("out_deg"),
        F.sum("i").cast("long").alias("in_deg"),
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-iteration PageRank as pure DataFrame joins — the KG's hub
    measure over materialized (subj -> obj) edges.

    Per iteration: contributions = ranks ⋈ edges grouped by destination
    (ONE shuffle on the edge key), dangling mass folded back uniformly, the
    teleport term added in closed form — the classic power iteration with
    the dangling-node correction, so ranks always sum to exactly 1 and the
    result matches a dense numpy reference (pytest).

    Scale shape: edges are repartitioned ONCE on ``src`` and cached-by-
    lineage; every iteration's join reuses that partitioning (no re-exchange
    of the edge table — only the small rank table moves).  Lineage is cut
    with an eager localCheckpoint every ``checkpoint_every`` iterations
    (same device as shuffle spill), without which the plan doubles per round
    and the driver, not the data, becomes the bottleneck.  The dangling sum
    is kept as a 1-row DataFrame cross-joined in (broadcast, free) rather
    than collected, so an iteration adds no driver action."""
    # checkpoint the deduped/repartitioned edge table once: every
    # iteration's actions re-traverse this plan, so without the barrier
    # the distinct's exchange re-executes per round (same reason hits()
    # checkpoints its e_src); nodes/out_deg reuse it too
    e = (
        edges.select(src, dst)
        .distinct()
        .repartition(F.col(src))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for it in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", src), src)
            .join(F.broadcast(out_deg), src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        dangling = (
            ranks.join(
                F.broadcast(out_deg.select(F.col(src).alias("node"))),
                "node",
                "left_anti",
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("_dang") / n)
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def pagerank_converged(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iterations: int = 100,
    src: str = "src",
    dst: str = "dst",
    init_ranks: DataFrame | None = None,
    weight: str | None = None,
) -> tuple[DataFrame, int]:
    """Power iteration to an L1 residual < ``tol``; returns (ranks, iters).

    ``init_ranks`` warm-starts the iteration — the INCREMENTAL path for a
    crawl's edge-delta batches: project the previous converged vector onto
    the new node set (arrivals start at 1/n), renormalize to unit mass,
    and iterate from there.  Power iteration's fixpoint is independent of
    the start vector, so warm == cold at the tolerance (pytest + oracle
    gate); what the warm start buys is ROUNDS — the residual starts at
    the size of the perturbation, not at 1.  This completes the
    incremental triad (CC, entailment/retraction, BGP views) for ranking.

    ``weight`` names an edge-weight column — the anchor-link case: a page
    linking a target 50 times should pass 50 shares of its rank, not 1.
    Each node splits its rank in proportion to outgoing weight
    (``rank * w / sum_out_w``); parallel (src, dst) rows SUM their
    weights (the crawl's per-anchor counts aggregate naturally).  With
    uniform weights the fixpoint equals the unweighted one (rank split
    is scale-invariant in the weights) — the oracled equivalence gate.
    Non-positive weights are the caller's contract (a zero-total-weight
    node degrades to dangling).

    Scale shape: identical per-round cost to :func:`pagerank` (edge table
    exchanged once, rank vector moves), plus one node-sized join + 1-row
    aggregate per round for the residual — the convergence check is the
    round's action and doubles as the eager checkpoint barrier."""
    # checkpoint the deduped/repartitioned edge table once: every
    # iteration's actions re-traverse this plan, so without the barrier
    # the distinct's exchange re-executes per round (same reason hits()
    # checkpoints its e_src); nodes/out_deg reuse it too
    if weight is None:
        e = (
            edges.select(src, dst)
            .distinct()
            .withColumn("_w", F.lit(1.0))
        )
    else:
        e = (
            edges.select(src, dst, F.col(weight).cast("double").alias("_w"))
            .groupBy(src, dst)
            .agg(F.sum("_w").alias("_w"))
        )
    e = e.repartition(F.col(src)).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0)), 0
    out_deg = e.groupBy(src).agg(F.sum("_w").alias("out_deg"))
    if init_ranks is None:
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    else:
        carried = nodes.join(
            init_ranks.select("node", F.col("rank").alias("_r0")),
            "node", "left",
        ).select(
            "node", F.coalesce(F.col("_r0"), F.lit(1.0 / n)).alias("rank")
        )
        total = carried.agg(F.sum("rank")).collect()[0][0]
        ranks = carried.withColumn("rank", F.col("rank") / F.lit(total))
    ranks = ranks.localCheckpoint(eager=True)
    iters = 0
    for _ in range(max_iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", src), src)
            .join(F.broadcast(out_deg), src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") * F.col("_w") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        dangling = (
            ranks.join(
                F.broadcast(out_deg.select(F.col(src).alias("node"))),
                "node", "left_anti",
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        nxt = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0))
                       + F.col("_dang") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        iters += 1
        resid = (
            nxt.join(
                ranks.select("node", F.col("rank").alias("_prev")), "node"
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("_prev"))))
            .collect()[0][0]
        )
        ranks = nxt
        if resid < tol:
            break
    return ranks, iters


def hits(
    edges: DataFrame,
    tol: float = 1e-9,
    max_iterations: int = 100,
    src: str = "src",
    dst: str = "dst",
    check_every: int = 4,
) -> tuple[DataFrame, int]:
    """Kleinberg HITS — hubs and authorities of the link graph.

    PageRank ranks by endorsement flow; HITS separates the two roles a
    web page plays — DIRECTORY (hub: links to good authorities) and
    DESTINATION (authority: linked from good hubs) — the right lens for
    crawl frontiers (fetch good hubs first) and for entity-link priors
    on listing-heavy pages.  Returns ``((node, hub, auth), iterations)``.

    Mutual recursion a = A^T h, h = A a.  Scores are reported under L1
    (sum-to-one) normalization — same fixpoint direction as Kleinberg's
    L2 (power iteration is scale-invariant), but the unit is exact and
    portable: both score columns each sum to exactly 1, which is the
    oracle's conservation gate (same device as pagerank's sum_is_one).
    Convergence by L1 residual over both normalized vectors.

    Scale shape: per round exactly two edge-keyed hash-agg joins over the
    once-repartitioned edge table — NO normalization inside rounds
    (scale-invariance makes it pure overhead, and a scalar-subquery
    normalize inside a lazy batch would re-execute the whole upstream
    lineage once per round).  Every ``check_every`` rounds the batch is
    checkpointed, normalized once (two 1-row aggregates broadcast back —
    this also resets the vector scale, so magnitudes never drift toward
    overflow however many batches run), zero-filled against the node
    frame, and probed for the residual.  The reported iteration count is
    therefore a multiple of ``check_every`` (documented coarsening;
    ``check_every=1`` restores exact counts — overshooting a fixpoint by
    <=3 rounds moves nothing).  Nodes with no in-edges (resp. out-edges)
    keep authority 0 (resp. hub 0) — they stay in the frame, not
    silently dropped."""
    e = edges.select(src, dst).distinct()
    e_src = e.repartition(F.col(src)).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        empty = nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "auth", F.lit(0.0)
        )
        return empty, 0
    scores = nodes.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).localCheckpoint(eager=True)
    iters = 0
    while iters < max_iterations:
        batch = min(check_every, max_iterations - iters)
        h = scores.select("node", F.col("hub").alias("v"))
        a = None
        for _ in range(batch):
            a = (
                e_src.join(h.withColumnRenamed("node", src), src)
                .groupBy(F.col(dst).alias("node"))
                .agg(F.sum("v").alias("v"))
            )
            h = (
                e_src.join(a.withColumnRenamed("node", dst), dst)
                .groupBy(F.col(src).alias("node"))
                .agg(F.sum("v").alias("v"))
            )
        # checkpoint a first, then REBUILD h's final half-round on top of
        # the checkpointed frame before materializing it — h's lazily
        # built plan still references the pre-checkpoint a, so without the
        # rebind its checkpoint would re-execute the whole batch chain a
        # second time; rebuilt, h's action costs exactly one join
        a = a.localCheckpoint(eager=True)
        h = (
            e_src.join(a.withColumnRenamed("node", dst), dst)
            .groupBy(F.col(src).alias("node"))
            .agg(F.sum("v").alias("v"))
        ).localCheckpoint(eager=True)
        hsum = h.agg(F.sum("v").alias("_hs"))
        asum = a.agg(F.sum("v").alias("_as"))
        nxt = (
            nodes.join(h.select("node", F.col("v").alias("_h")),
                       "node", "left")
            .join(a.select("node", F.col("v").alias("_a")), "node", "left")
            .crossJoin(F.broadcast(hsum))
            .crossJoin(F.broadcast(asum))
            .select(
                "node",
                (F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_hs"))
                .alias("hub"),
                (F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_as"))
                .alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
        iters += batch
        resid = (
            nxt.join(
                scores.select(
                    "node",
                    F.col("hub").alias("_ph"), F.col("auth").alias("_pa"),
                ),
                "node",
            )
            .agg(
                F.sum(
                    F.abs(F.col("hub") - F.col("_ph"))
                    + F.abs(F.col("auth") - F.col("_pa"))
                )
            )
            .collect()[0][0]
        )
        scores = nxt
        if resid < tol:
            break
    return scores, iters


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count via degree-ordered edge orientation.

    The input is treated as an undirected simple graph (edges are
    canonicalized and deduped; self-loops dropped).  Each edge is oriented
    from its lower-rank endpoint to its higher-rank endpoint, rank =
    (degree, node): every wedge is then generated exactly once at its
    lowest-rank apex, and — the scale property — a node's oriented
    out-degree is bounded by O(sqrt(|E|)) even for a maximal hub, so the
    wedge join's fan-out never explodes on a skewed degree distribution
    (the naive all-edges self-join fans out deg^2 on the hottest node).
    Two shuffles total: the wedge self-join and the closing semi-join.
    Returns one row: (n_triangles: long).
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("n", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("d", "db"), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tri = wedges.join(
        closing,
        (F.least(wedges.x, wedges.y) == closing.x)
        & (F.greatest(wedges.x, wedges.y) == closing.y),
        "left_semi",
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 30,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The k-truss subgraph (Cohen 2008) — edge-level cohesion, the
    complement of k-core's node peeling: keep exactly the edges that sit
    in >= k-2 triangles AMONG THE SURVIVING EDGES, iterating until the
    fixpoint (removing one weak edge can erase a neighbor edge's
    triangles — the cascade is the algorithm).  For a web KG this is the
    dense-evidence filter: a relation asserted inside a triangle-rich
    neighborhood is corroborated; pendant chains and one-off bridges
    peel away.

    Each round enumerates every surviving triangle ONCE at its
    lowest-rank apex (the same degree-ordered orientation as
    :func:`triangle_count` — oriented out-degree is O(sqrt(|E|)) even at
    a hub, so the wedge join never explodes on skew), emits the three
    canonical edges per triangle, counts support by edge (map-side
    combined), and anti-prunes edges under k-2.  Convergence is a
    LIMIT-1 existence probe; the surviving edge frame is checkpointed
    per round so round r never replays rounds < r.

    Returns the surviving canonical edge set ``(a, b)`` with its final
    ``support`` — empty when nothing reaches the bar."""
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    a, b = F.col(src), F.col(dst)
    cur = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    empty = cur.sparkSession.createDataFrame(
        [], schema=cur.schema
    ).withColumn("support", F.lit(0).cast("long"))
    for _ in range(max_rounds):
        deg = (
            cur.select(F.col("a").alias("n"))
            .unionAll(cur.select(F.col("b").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        ranked = (
            cur.join(deg.withColumnRenamed("n", "a")
                     .withColumnRenamed("d", "da"), "a")
            .join(deg.withColumnRenamed("n", "b")
                  .withColumnRenamed("d", "db"), "b")
        )
        lo_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        oriented = ranked.select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        )
        w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
        w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
        wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
        closing = cur.select(F.col("a").alias("x"), F.col("b").alias("y"))
        tris = wedges.join(closing, ["x", "y"])
        tri_edges = (
            tris.select(F.least("u", "x").alias("a"),
                        F.greatest("u", "x").alias("b"))
            .unionAll(tris.select(F.least("u", "y").alias("a"),
                                  F.greatest("u", "y").alias("b")))
            .unionAll(tris.select(F.col("x").alias("a"),
                                  F.col("y").alias("b")))
        )
        support = tri_edges.groupBy("a", "b").agg(
            F.count(F.lit(1)).alias("support")
        )
        scored = cur.join(support, ["a", "b"], "left").select(
            "a", "b",
            F.coalesce(F.col("support"), F.lit(0)).alias("support"),
        ).localCheckpoint(eager=True)
        weak = scored.where(F.col("support") < k - 2)
        if weak.limit(1).isEmpty():
            return scored
        nxt = scored.where(F.col("support") >= k - 2).select("a", "b")
        if nxt.limit(1).isEmpty():
            return empty
        cur = nxt.localCheckpoint(eager=True)
    raise ValueError(
        f"k-truss peeling did not converge within max_rounds={max_rounds}"
    )


def common_neighbors(
    edges: DataFrame, src: str = "src", dst: str = "dst", min_common: int = 2
) -> DataFrame:
    """Common-neighbor counts per source pair — the classic link-prediction
    feature (two subjects sharing many objects are candidate co-references /
    future edges).  One self-join on the shared neighbor + one hash agg; at
    scale, cap the hottest neighbors first (a neighbor shared by d sources
    emits d^2 pairs — the same df-cut as dedup.ngram_jaccard_pairs applies).
    Returns (node_a, node_b, n_common) with node_a < node_b.
    """
    l = edges.select(F.col(src).alias("node_a"), F.col(dst).alias("_n")).distinct()  # noqa: E741
    r = edges.select(F.col(src).alias("node_b"), F.col(dst).alias("_n")).distinct()
    return (
        l.join(r, "_n")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )


def k_hop_neighbors(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Directed BFS from a seed set: every node reachable in <= k hops with
    its minimum hop distance — the KG neighborhood-expansion primitive
    (entity context windows, subgraph sampling for GNN training).

    Frontier-style iteration: at hop i the (small) frontier joins the edge
    table, newly-reached nodes form the next frontier.  Visited-set dedup is
    a left-anti join per hop, so every hop is O(frontier ⋈ edges) — never
    O(edges^2) — and the loop is bounded by the constant ``k`` (no
    driver-side count actions; an empty frontier makes remaining hops
    no-ops at plan time).  Each frontier is cached and the edge join key is
    the shuffle key, so at 10^12 edges hop-i cost tracks the true
    neighborhood size.  The hub-skew caveat: a celebrity node fans the next
    frontier wide; AQE skew-split handles the join, and the per-hop
    ``distinct`` caps the frontier at |V|.

    Output: (node, hops) with hops = min distance, seeds at 0.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    visited = seeds.select(
        F.col(node_col).alias("node"), F.lit(0).alias("hops")
    ).distinct().persist()
    frontier = visited.select("node")
    for hop in range(1, k + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "_s"), "_s")
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
            .persist()
        )
        visited = visited.unionByName(nxt).persist()
        frontier = nxt.select("node")
    return visited


def deterministic_walks(
    edges: DataFrame,
    seeds: DataFrame,
    length: int,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Deterministic "random" walks over the edge table — the random-walk
    corpus generator behind DeepWalk/node2vec-style KG embeddings, made
    reproducible for a data pipeline: at step ``t`` the walker at node ``u``
    moves to the out-neighbor ``v`` minimizing ``md5(u:t:v)``.  The choice
    is uniform-ish (hash order is pseudo-random per (u, t)), varies per
    step (the same hub is left via different edges at different steps), and
    is a pure function of the data — identical walks on every run, every
    cluster size, every retry (the reference's determinism rule, e.g. its
    ordered TOP-n elections, MSSQL/OMOPLoader.sql:1893-1895, applied to
    sampling).

    Scale shape: each step is one shuffle join on the current-node key plus
    a ``min_by`` hash aggregate (map-side combined) — never a window sort,
    never a collect; ``length`` is a small constant so the loop unrolls into
    a fixed plan.  Walkers at a dead-end node simply stop (inner join drops
    them).  Hub nodes fan many walkers into one join key: AQE skew-split
    handles it, and the aggregate output is one row per walker regardless
    of degree.

    Output: (walk_id, step, node) — step 0 is the seed row.
    """
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v"))
    out = seeds.select(
        F.col(node_col).alias("walk_id"),
        F.lit(0).alias("step"),
        F.col(node_col).alias("node"),
    ).distinct()
    cur = out
    for t in range(1, length + 1):
        stepped = (
            cur.withColumnRenamed("node", "_u")
            .join(e, "_u")
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    "_v",
                    F.md5(F.concat_ws(":", "_u", F.lit(str(t)), "_v")),
                ).alias("node")
            )
            .withColumn("step", F.lit(t))
            .select("walk_id", "step", "node")
        )
        out = out.unionByName(stepped)
        cur = stepped
    return out


def biased_walks(
    edges: DataFrame,
    seeds: DataFrame,
    length: int,
    return_cost: int = 9,
    inout_cost: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """node2vec-style SECOND-ORDER biased walks, deterministic — the
    exploration-control extension of :func:`deterministic_walks` (Grover &
    Leskovec 2016's p/q return/in-out parameters, recast for a data
    pipeline that demands identical output on every run/retry/cluster
    size).

    At step t the walker sits at ``v`` having arrived from ``prev``; each
    out-neighbor ``w`` is classed node2vec-style — *return* (w == prev),
    *distance-1* (w is also a neighbor of prev — the triangle-closing
    BFS move), *distance-2* (everything else) — and the next hop is the
    candidate minimizing the composite key ``(class_cost, md5(v:t:w), w)``.
    Costs are single-digit integers compared as the leading byte of a
    string key, so the election is integer-exact and portable (the same
    key is computable in any engine — the DuckDB oracle re-derives every
    hop).  This is a deterministic RANKED analog of node2vec's
    alpha-weighted sampling, not proportional sampling: a class is
    strictly preferred over costlier classes, and md5 order breaks ties
    pseudo-randomly WITHIN a class.  ``return_cost`` plays 1/p (high =
    no backtracking), ``inout_cost`` plays q (>1 = BFS-leaning,
    distance-1 preferred; set it to 1 to explore depth-first-ish).
    Distance-1 moves always cost 1.

    Scale shape: per step, one candidate join on the current node + one
    membership LEFT join of (prev, w) against the edge table + one
    map-side-combined ``min_by`` — no window, no collect; length is a
    small constant so the loop unrolls into a fixed plan.  Step 1 has no
    prev (node2vec's uniform first hop): all candidates cost 1.

    Output: (walk_id, step, node); step 0 is the seed row."""
    for name, c in (("return_cost", return_cost), ("inout_cost", inout_cost)):
        if not 1 <= int(c) <= 9:
            raise ValueError(
                f"{name} must be a single digit 1..9 (string-key compare "
                f"portability), got {c}"
            )
    e = edges.select(F.col(src).alias("_u"), F.col(dst).alias("_v")).distinct()
    nb = e.select(F.col("_u").alias("_ps"), F.col("_v").alias("_pd"))
    out = seeds.select(
        F.col(node_col).alias("walk_id"),
        F.lit(0).alias("step"),
        F.col(node_col).alias("node"),
    ).distinct()
    # state carries (walk_id, prev, node); step 1 is the uniform hop
    first = (
        out.withColumnRenamed("node", "_u")
        .join(e, "_u")
        .groupBy("walk_id")
        .agg(
            F.min_by(
                "_v", F.md5(F.concat_ws(":", "_u", F.lit("1"), "_v"))
            ).alias("node"),
            F.first("_u").alias("prev"),
        )
    )
    out = out.unionByName(
        first.select("walk_id", F.lit(1).alias("step"), "node")
    )
    cur = first.select("walk_id", "prev", "node")
    for t in range(2, length + 1):
        cand = cur.withColumnRenamed("node", "_u").join(e, "_u")
        cand = cand.join(
            nb,
            (cand["prev"] == nb["_ps"]) & (cand["_v"] == nb["_pd"]),
            "left",
        )
        cost = (
            F.when(F.col("_v") == F.col("prev"), F.lit(int(return_cost)))
            .when(F.col("_ps").isNotNull(), F.lit(1))
            .otherwise(F.lit(int(inout_cost)))
        )
        key = F.concat_ws(
            ":",
            cost.cast("string"),
            F.md5(F.concat_ws(":", "_u", F.lit(str(t)), "_v")),
            "_v",
        )
        stepped = (
            cand.groupBy("walk_id")
            .agg(
                F.min_by("_v", key).alias("node"),
                F.first("_u").alias("prev"),
            )
        )
        out = out.unionByName(
            stepped.select("walk_id", F.lit(t).alias("step"), "node")
        )
        cur = stepped.select("walk_id", "prev", "node")
    return out


def cycle_tainted_nodes(
    edges: DataFrame,
    max_rounds: int = 20,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Ontology DAG QA: every node that lies on a directed cycle or is
    reachable from one.  The reference's concept hierarchy ('Maps to' /
    ISA walks, MSSQL/OMOPLoader.sql:214-230) silently loops forever if the
    crosswalk ships a cyclic mapping — at web scale the ingest must *detect*
    tainted subgraphs, not hang.

    Edge-centric Kahn peeling: an edge survives a round iff its source still
    has an incoming surviving edge (equivalently, nodes of in-degree 0 are
    peeled with their out-edges).  The fixpoint edge set is exactly the
    edges whose source is on or reachable from a cycle; tainted nodes are
    the endpoints of surviving edges.

    Scale shape: each round is ONE distinct-project + ONE left-semi join on
    ``src`` (both map-side-combining hash ops; the dst-projection side is
    tiny after distinct and broadcasts).  Rounds are bounded by the longest
    acyclic tail hanging off a root, NOT by graph size; convergence is
    checked with a cheap count per round and lineage is cut with an eager
    localCheckpoint so round r never replays rounds 0..r-1.
    """
    e = edges.select(src, dst).distinct().localCheckpoint(eager=True)
    n_edges = e.count()
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        has_in = e.select(F.col(dst).alias(src)).distinct()
        survived = e.join(has_in, src, "left_semi").localCheckpoint(
            eager=True
        )
        n2 = survived.count()
        if n2 == n_edges:
            break
        e, n_edges = survived, n2
    return (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )


def bounded_shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node_col: str = "node",
) -> DataFrame:
    """Weighted single-source(-set) shortest paths over paths of <= k edges —
    distributed Bellman-Ford with per-level pruning.

    At level i the frontier holds the best known <=i-hop distance per node;
    extending it through the edge table and taking ``min`` per node prunes
    dominated paths immediately (a longer path to the same node can never
    yield a shorter extension, weights being non-negative), so frontier size
    is capped at |V| regardless of path multiplicity.  The union of all
    levels min-reduced at the end gives min-cost over ALL <=k-hop paths —
    bit-identical to the recursive-CTE oracle because weights are integers.

    k is a constant (no driver actions in the loop); each level is one
    shuffle (the groupBy-min).  Seeds start at distance 0.
    """
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(weight).alias("_w")
    )
    cur = (
        seeds.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("d", F.lit(0).cast("long"))
        .persist()
    )
    best = cur
    for _ in range(k):
        cur = (
            e.join(cur.withColumnRenamed("node", "_s"), "_s")
            .select(F.col("_d").alias("node"), (F.col("d") + F.col("_w")).alias("d"))
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .persist()
        )
        best = best.unionByName(cur)
    return best.groupBy("node").agg(F.min("d").cast("long").alias("dist"))


def transitive_closure(
    edges: DataFrame,
    child: str = "child",
    parent: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """Materialize the full ancestor closure of a DAG with min/max levels of
    separation — this BUILDS the ``concept_ancestor`` table the reference
    consumes as a precomputed input (its ingredient rollups join
    ``concept_ancestor`` that OMOP vocab releases ship ready-made,
    MSSQL/OMOPLoader.sql:1567-1630); a from-scratch KG must derive it from
    the raw ``subsumes`` edges itself.

    Returns (descendant, ancestor, min_levels, max_levels) for every
    reachable pair, 1-based hop counts (direct edges = 1); the reflexive
    pairs OMOP adds (levels 0) are a trivial union the caller can add.

    Algorithm: semiring matrix squaring (pointer doubling).  Round k holds,
    for every pair reachable within 2^k hops, the exact min/max path length
    over those paths; squaring composes the frame with itself through the
    mid node and re-aggregates min/max, so ceil(log2(depth)) rounds — NOT
    depth rounds — reach the fixpoint.  Both min-plus and max-plus are
    semirings, so repeated squaring of (A union I) is exact for both
    simultaneously; on a DAG max-plus terminates (no positive cycles).

    Scale shape (10^9-edge hierarchy):

    * each round is ONE self-join shuffle keyed on the mid node plus ONE
      hash re-aggregation on (descendant, ancestor) — map-side combine
      applies to both min and max;
    * the frame is eagerly localCheckpoint-ed per round so round r never
      replays rounds 0..r-1 (same discipline as pagerank above);
    * fixpoint detection is a 3-scalar aggregate (pair count, sum of mins,
      sum of maxes) — min only falls, max only rises, pairs only grow, so
      equality is a true fixpoint, no expensive frame diff;
    * closure size is the real cost at scale (|closure| >> |edges| on deep
      hierarchies).  ``max_depth`` bounds the rounds (depth <= 2^rounds);
      ontology hierarchies are shallow (OMOP < 30 levels), so the loop runs
      ~5 rounds.  For web-scale graphs where the closure itself is too big
      to materialize, use k_hop_neighbors (bounded frontier) instead —
      materializing an unbounded closure of a social graph is a design
      error, not a tuning problem.
    """
    c = (
        edges.select(
            F.col(child).alias("descendant"),
            F.col(parent).alias("ancestor"),
        )
        .where(F.col("descendant").isNotNull() & F.col("ancestor").isNotNull())
        .distinct()
        .select("descendant", "ancestor",
                F.lit(1).cast("long").alias("min_levels"),
                F.lit(1).cast("long").alias("max_levels"))
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.coalesce(F.sum("min_levels"), F.lit(0)).alias("smin"),
            F.coalesce(F.sum("max_levels"), F.lit(0)).alias("smax"),
        ).collect()[0]
        return (row["pairs"], row["smin"], row["smax"])

    sig = _sig(c)
    rounds = 0
    while (1 << rounds) < max_depth:
        rounds += 1
        left = c.select(
            F.col("descendant"),
            F.col("ancestor").alias("_mid"),
            F.col("min_levels").alias("_lmin"),
            F.col("max_levels").alias("_lmax"),
        )
        right = c.select(
            F.col("descendant").alias("_mid"),
            F.col("ancestor"),
            F.col("min_levels").alias("_rmin"),
            F.col("max_levels").alias("_rmax"),
        )
        composed = left.join(right, "_mid").select(
            "descendant", "ancestor",
            (F.col("_lmin") + F.col("_rmin")).alias("min_levels"),
            (F.col("_lmax") + F.col("_rmax")).alias("max_levels"),
        )
        c2 = (
            c.unionByName(composed)
            .groupBy("descendant", "ancestor")
            .agg(F.min("min_levels").alias("min_levels"),
                 F.max("max_levels").alias("max_levels"))
            .localCheckpoint(eager=True)
        )
        sig2 = _sig(c2)
        c = c2
        if sig2 == sig:
            break
        sig = sig2
    return c


def incremental_components(
    labels: DataFrame, delta_edges: DataFrame
) -> DataFrame:
    """Maintain a connected-components clustering under NEW edges without
    recomputing untouched components — the canonicalization-update path of
    a continuously-crawled KG (a daily crawl delta must not re-cluster the
    full 10^12-node identity graph; the reference's analogue is its
    full-refresh reload, MSSQL/OMOPLoader.sql:1870-1890, which this
    generalizes to an incremental merge).

    ``labels``: (node, root) from a previous min-id CC run (any of the CC
    operators above).  ``delta_edges``: (src, dst) newly observed edges.
    Returns updated (node, root) covering old and new nodes.

    Correctness: components untouched by any delta edge keep their rows
    verbatim.  Affected components are collapsed to STAR edges
    (node -> old root) — connectivity-preserving and diameter-2, so the
    re-run converges in O(1) doubling rounds — unioned with the delta
    edges and re-solved by hash-min label propagation.  Because old roots
    are component minima, the recomputed min-id roots equal what a full
    recompute over (old edges + delta) would emit.

    Scale shape: the recompute touches |affected components| + |delta|
    rows only; ``touched_roots`` is bounded by the delta size and joins
    semi/anti against the labels (AQE broadcasts it when small — the
    common case of a daily delta vs a planetary graph); everything stays
    keyed on node/root, the clustering's natural partitioning.
    """
    delta = delta_edges.select("src", "dst")
    touched_nodes = (
        delta.select(F.col("src").alias("node"))
        .union(delta.select(F.col("dst").alias("node")))
        .distinct()
    )
    touched_roots = (
        labels.join(touched_nodes, "node", "left_semi")
        .select("root")
        .distinct()
    )
    untouched = labels.join(touched_roots, "root", "left_anti")
    affected = labels.join(touched_roots, "root", "left_semi")
    star = affected.select(
        F.col("node").alias("src"), F.col("root").alias("dst")
    )
    recomputed = label_propagation_components(star.union(delta))
    return untouched.unionByName(recomputed)


def propagate_labels(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 2,
) -> DataFrame:
    """Semi-supervised label propagation: infer types for unlabeled nodes
    from labeled neighbors (Zhu & Ghahramani label propagation with
    clamped seeds, synchronous rounds) — the KG type-inference step for
    crawled entities that arrive untyped (the reference never needs this:
    its warehouse rows are born typed; a web KG starts from a thin typed
    seed set and must spread).

    ``edges`` (src, dst) are treated as undirected; ``seeds`` (node,
    label).  Each round, every still-unlabeled node with at least one
    labeled neighbor takes the MAJORITY neighbor label; ties break to the
    lexicographically smallest label, so the result is deterministic and
    independent of partitioning.  Labels are immutable once assigned
    (seeds clamped), so ``rounds`` bounds the spread radius — exactly r
    hops from the seed set after r rounds.

    Scale shape: per round ONE join of the edge list against the labeled
    frame (keyed on node id) + ONE (node, label) tally aggregation
    (map-side combining) + the per-node election (struct-min over the
    tally, which holds at most |distinct labels| rows per node).  The
    labeled frame is localCheckpoint-ed per round so round r never
    replays rounds 0..r-1.  Hub nodes tally at most |labels| rows —
    no fan-out skew beyond the edge join itself (salt upstream if one
    node holds a double-digit share of edges).
    """
    sym = edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = seeds.select("node", "label").localCheckpoint(eager=True)
    for _ in range(rounds):
        nbr = sym.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("node"), "label")
        fresh = (
            nbr.join(labels.select("node"), "node", "left_anti")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("_c"))
            .groupBy("node")
            .agg(
                F.min(F.struct((-F.col("_c")).alias("_nc"), "label"))
                .alias("_top")
            )
            .select("node", F.col("_top.label").alias("label"))
        )
        labels = labels.unionByName(fresh).localCheckpoint(eager=True)
    return labels


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 3,
) -> DataFrame:
    """Personalized PageRank: random walk with restart to a SEED set —
    entity relatedness scores around a query entity (recommendation /
    related-entities panels over the KG; the global :func:`pagerank`
    answers "what is important", PPR answers "what is important NEAR x").

    Identical power-iteration shape to :func:`pagerank` — one shuffle per
    iteration on the pre-partitioned edge table — except the teleport and
    dangling mass both return to the seeds (uniformly) instead of to all
    nodes, so probability mass stays exactly 1 and concentrates in the
    seeds' neighborhoods.  Nodes unreachable from the seeds converge to
    rank 0 (they receive neither teleport nor walk mass).

    Scale shape: the seed frame is query-sized — it rides along as a
    broadcast join per iteration; everything else inherits pagerank's
    bounds (edges exchanged once, lineage cut every
    ``checkpoint_every`` rounds).
    """
    # checkpoint the deduped/repartitioned edge table once: every
    # iteration's actions re-traverse this plan, so without the barrier
    # the distinct's exchange re-executes per round (same reason hits()
    # checkpoints its e_src); nodes/out_deg reuse it too
    e = (
        edges.select(src, dst)
        .distinct()
        .repartition(F.col(src))
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col(src).alias("node"))
        .unionByName(e.select(F.col(dst).alias("node")))
        .distinct()
    )
    s = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    ns = s.count()
    if ns == 0:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    # an edgeless seed must still exist (it holds teleport mass)
    nodes = nodes.unionByName(s).distinct()
    tele = s.withColumn("_t", F.lit(1.0 / ns))
    out_deg = e.groupBy(src).agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = (
        nodes.join(F.broadcast(tele), "node", "left")
        .select("node", F.coalesce(F.col("_t"), F.lit(0.0)).alias("rank"))
        .localCheckpoint(eager=True)
    )
    for it in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", src), src)
            .join(F.broadcast(out_deg), src)
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        dangling = (
            ranks.join(
                F.broadcast(out_deg.select(F.col(src).alias("node"))),
                "node",
                "left_anti",
            )
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .join(F.broadcast(tele), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.coalesce(F.col("_t"), F.lit(0.0))
                    * (F.lit(1.0 - damping) + F.lit(damping) * F.col("_dang"))
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def k_core(
    edges: DataFrame, k: int = 2, max_iter: int = 50
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly remove nodes
    with (undirected) degree < k; what survives is the unique maximal
    subgraph of minimum degree >= k.  In a web link graph the dense cores
    are exactly where link farms and boilerplate navigation live — the
    density-based QA complement to cycle_tainted_nodes above.

    Returns (node) — the members of the k-core.

    Scale shape: each peel round is ONE semi-join of the (symmetrized)
    edge list against the survivor set + ONE degree HashAggregate, both
    keyed on node id; survivors are eagerly localCheckpoint-ed so round r
    never replays earlier rounds.  Convergence needs one round per peel
    LAYER (the degeneracy depth), not per node — web graphs peel in a few
    dozen layers.  The fixpoint probe is a count comparison (alive set
    only shrinks, so equality is a true fixpoint).
    """
    sym = (
        edges.select("src", "dst")
        .union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    alive = sym.select(F.col("src").alias("node")).distinct()
    alive = alive.localCheckpoint(eager=True)
    n_alive = alive.count()
    for _ in range(max_iter):
        surv = (
            sym.join(alive.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("_d"))
            .where(F.col("_d") >= k)
            .select("node")
            .localCheckpoint(eager=True)
        )
        n_surv = surv.count()
        alive = surv
        if n_surv == n_alive:
            break
        n_alive = n_surv
    return alive


def harmonic_closeness(
    edges: DataFrame,
    max_hops: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Bounded-hop harmonic closeness centrality: for every node,
    sum(1/d(u, v)) over nodes v reachable within ``max_hops`` — the
    bounded-neighborhood form (Boldi & Vigna's truncated harmonic
    centrality) that is computable at web scale, unlike exact closeness
    (which needs all-pairs distances).  Directed distances along edge
    direction.

    Returned as INTEGER ``closeness_scaled`` = sum(scale div d) — exact
    integer arithmetic per the repo's determinism rules, so the
    recursive-CTE oracle matches bit-for-bit (no float accumulation
    order).

    Scale shape: synchronous BFS frontier per hop — hop h is ONE join of
    the current frontier against the edge list + ONE anti-join against
    visited (both keyed on node id) + the running (node, dist) union,
    eagerly localCheckpoint-ed; ``max_hops`` bounds rounds AND state.
    The neighborhood-size explosion on hub-dense graphs is the caller's
    knob: max_hops=3 on a social graph is already most of the graph —
    exactly why the truncated form is the scalable one.
    """
    sym = edges.select("src", "dst").distinct()
    # dist 0 = self; frontier expands along out-edges
    visited = (
        sym.select(F.col("src").alias("origin"))
        .unionByName(sym.select(F.col("dst").alias("origin")))
        .distinct()
        .select("origin", F.col("origin").alias("node"),
                F.lit(0).alias("dist"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(
                sym.withColumnRenamed("src", "node"), "node"
            )
            .select("origin", F.col("dst").alias("node"),
                    F.lit(h).alias("dist"))
            .distinct()
            .join(visited.select("origin", "node"), ["origin", "node"],
                  "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        visited.where(F.col("dist") > 0)
        .groupBy(F.col("origin").alias("node"))
        .agg(
            F.sum(F.expr(f"{scale} div dist")).cast("long")
            .alias("closeness_scaled"),
            F.count(F.lit(1)).cast("long").alias("n_reached"),
        )
    )


def local_clustering(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient — the
    node-level density signal (boilerplate/link-farm neighborhoods score
    near 1, organic citation structure much lower), complementing the
    global :func:`triangle_count`.

    Same degree-ordered orientation as triangle_count (wedge fan-out
    bounded O(sqrt(E)) on hubs), but the closing join KEEPS the triangle
    rows, explodes each into its 3 member nodes, and re-aggregates — one
    extra exchange over the global count.  Coefficient is integer ppm
    ``2*T*1e6 div (d*(d-1))`` over nodes with degree >= 2 (exact
    arithmetic both engines).
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.where(a != b)
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("n", "a")
                 .withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("n", "b")
              .withColumnRenamed("d", "db"), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    w1 = oriented.select(F.col("u"), F.col("v").alias("x"))
    w2 = oriented.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("u", "v").alias("x"), F.greatest("u", "v").alias("y")
    )
    tris = wedges.join(
        closing,
        (F.least(wedges.x, wedges.y) == closing.x)
        & (F.greatest(wedges.x, wedges.y) == closing.y),
        "left_semi",
    )
    per_node = (
        tris.select(F.explode(F.array("u", "x", "y")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return (
        deg.where(F.col("d") >= 2)
        .join(per_node, "n", "left")
        .select(
            F.col("n").alias("node"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long")
            .alias("n_triangles"),
            F.col("d").cast("long").alias("degree"),
            F.expr(
                "coalesce(t, 0) * 2000000 div (d * (d - 1))"
            ).alias("clustering_ppm"),
        )
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_peel_rounds: int = 64,
    max_diameter: int = 512,
) -> DataFrame:
    """Strongly connected components of a DIRECTED graph — the directed
    complement of the undirected sameAs smushing in
    operators/sameas.py: `skos:exactMatch` / redirect / `dcterms:replaces`
    chains assert identity only when the references are MUTUAL, so the
    identity bundles are the SCCs of the directed claim graph, not the
    weakly-connected blobs (a one-way `replaces` must NOT merge two
    entities).  Returns (node, scc_id) with scc_id = min member id.

    Algorithm: trim + forward-backward coloring (the standard distributed
    SCC scheme; cf. Slota et al., "BFS and Coloring-based Parallel
    Algorithms for Strongly Connected Components", IPDPS 2014 — public
    literature, reimplemented here on DataFrames from the paper's idea
    only).  Each peel round:

    1. TRIM: iteratively drop nodes with no in-edge or no out-edge in the
       active subgraph — each is its own singleton SCC.  This peels whole
       DAG regions in a handful of cheap semi-join rounds and is the
       common case on web claim graphs (most nodes are never mutually
       referenced).
    2. COLOR: propagate min node id along forward edges to fixpoint:
       color(v) = min over {v} ∪ ancestors(v).  Mutually reachable nodes
       share their ancestor set, so an SCC never spans two color classes;
       and the class label c is always its own root (a smaller ancestor
       of c would relabel the whole class).
    3. BACKWARD: from each root r, grow {v : color(v)=r and v →* r} along
       reversed edges RESTRICTED to the class — exactly SCC(r).  The
       class restriction both bounds the frontier and makes the claim
       exact.
    4. Emit those SCCs (scc_id = class label = min member), remove them,
       repeat on the remainder.

    Scale shape: every inner step is one equi-join shuffle + one hash
    min-aggregation (map-side combine applies); frames are eagerly
    localCheckpoint-ed per round so round r never replays rounds 0..r-1;
    coloring convergence is detected by an exact changed-row count (colors
    only fall), backward/trim by monotone set counts.  Honest bounds:
    coloring runs O(active diameter) rounds (``max_diameter`` guards, loud
    ValueError — raise it for pathological chains); a condensation that is
    itself a deep chain of nontrivial SCCs needs one peel round per level
    (``max_peel_rounds`` guards loudly).  Real identity graphs are
    shallow: trim removes the DAG mass, and the surviving mutual cores
    resolve in 1-2 peels.
    """
    e0 = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    assigned = nodes.limit(0).select(
        "node", F.col("node").alias("scc_id")
    )
    active = nodes
    for _peel in range(max_peel_rounds):
        if active.isEmpty():
            return assigned
        # -- 1. trim: nodes with no in- or no out-edge are singleton SCCs
        while True:
            e_act = (
                e0.join(active.withColumnRenamed("node", "src"),
                        "src", "left_semi")
                .join(active.withColumnRenamed("node", "dst"),
                      "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
            keep = (
                active.join(e_act.select("src").distinct()
                            .withColumnRenamed("src", "node"),
                            "node", "left_semi")
                .join(e_act.select("dst").distinct()
                      .withColumnRenamed("dst", "node"),
                      "node", "left_semi")
                .localCheckpoint(eager=True)
            )
            trimmed = active.join(keep, "node", "left_anti")
            if trimmed.isEmpty():
                break
            assigned = assigned.union(
                trimmed.select("node", F.col("node").alias("scc_id"))
            ).localCheckpoint(eager=True)
            active = keep
        if active.isEmpty():
            return assigned
        # -- 2. forward min-label coloring to fixpoint
        colors = active.select("node", F.col("node").alias("color"))
        converged = False
        for _ in range(max_diameter):
            msgs = e_act.join(
                colors.withColumnRenamed("node", "src"), "src"
            ).select(F.col("dst").alias("node"), "color")
            new_colors = (
                colors.union(msgs)
                .groupBy("node")
                .agg(F.min("color").alias("color"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_colors.withColumnRenamed("color", "_nc")
                .join(colors, "node")
                .where(F.col("_nc") != F.col("color"))
                .count()
            )
            colors = new_colors
            if changed == 0:
                converged = True
                break
        if not converged:
            raise ValueError(
                f"SCC coloring did not converge within max_diameter="
                f"{max_diameter} rounds; raise max_diameter"
            )
        # -- 3. backward reach from roots, restricted to the color class
        reached = (
            colors.where(F.col("node") == F.col("color"))
            .select("node", F.col("color").alias("scc_id"))
            .localCheckpoint(eager=True)
        )
        n = reached.count()
        while True:
            step = (
                e_act.join(reached.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "scc_id")
                .join(
                    colors.withColumnRenamed("color", "scc_id"),
                    ["node", "scc_id"],
                    "left_semi",
                )
            )
            grown = reached.union(step).distinct().localCheckpoint(eager=True)
            n2 = grown.count()
            reached = grown
            if n2 == n:
                break
            n = n2
        # -- 4. emit and peel
        assigned = assigned.union(reached).localCheckpoint(eager=True)
        active = active.join(
            reached.select("node"), "node", "left_anti"
        ).localCheckpoint(eager=True)
    if not active.isEmpty():
        raise ValueError(
            f"SCC peeling did not converge within max_peel_rounds="
            f"{max_peel_rounds}; the condensation chain is deeper — raise "
            "max_peel_rounds"
        )
    return assigned


def betweenness_centrality(
    edges: DataFrame,
    max_depth: int = 32,
    directed: bool = False,
    src: str = "src",
    dst: str = "dst",
    sample_sources: int | float | None = None,
) -> DataFrame:
    """Exact betweenness centrality — Brandes (2001) run for ALL sources
    SIMULTANEOUSLY, the formulation that survives a cluster: per BFS
    level ONE join of the composite (source, node) frontier against the
    edge table, so the whole computation is O(diameter) rounds
    regardless of |V| — never a per-source driver loop.

    Forward sweep: the frontier carries (s, v, sigma); extending through
    the edge table and anti-joining the settled set yields the next
    level, sigma summing over predecessors (shortest-path counts).
    Backward sweep (dependency accumulation, deepest level first):
    delta(v) += sigma_v/sigma_w * (1 + delta(w)) over same-source edges
    into the level below; each level is again one join + one hash agg.
    ``bc`` sums delta over sources; undirected inputs are symmetrized
    first and the classic halving applied.  Endpoints are excluded, the
    standard convention.

    Returns every node with its (float) ``bc``.  Exactness is gated in
    pytest against a pure-Python Brandes on cyclic graphs; the oracled
    query uses a closed-form fixture (bridged stars) where all sigma=1
    and scores are integers.

    ``sample_sources`` switches to the Brandes–Pich / Riondato pivot
    estimator — the ONLY formulation that survives the full crawl graph,
    where the exact all-sources frontier is (|V| x level-width) pairs
    (~10^16 on a 10^8-node component).  An int is an absolute pivot
    count k, a float in (0, 1] a fraction of |V|; pivots are elected
    deterministically as the k smallest ``xxhash64(node)`` values (a
    seedless uniform sample — stable across runs, partitionings, and
    cluster sizes), the sweeps run with the k-source frontier (state
    k x level-width), and each accumulated dependency is scaled by
    |V|/k, the unbiased Brandes–Pich estimator (E[(n/k) sum_S delta] =
    BC exactly, Hoeffding error O(n * sqrt(log n / k))).  ``k >= |V|``
    degrades to the exact path bit-for-bit.  Exactness of the estimator
    is pytest-gated against pure-Python Brandes (unbiasedness on the
    full sample; bounded relative error on hubs at k < n).

    Scale shape: 2 x diameter rounds, each a frontier-sized equi-join +
    map-side-combining agg against the once-repartitioned edge table;
    the frontier is (sources x level-width) — cap it with
    ``sample_sources`` (estimator, stated error) and/or ``max_depth``
    (deeper pairs ignored, the documented truncation).  One driver
    action per level (the checkpoint that also cuts lineage)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    if not directed:
        e = e.unionByName(e.select(F.col("v").alias("u"),
                                   F.col("u").alias("v")))
    e = e.distinct().repartition(F.col("u")).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    inv_sample_frac = 1.0
    sources = nodes
    if sample_sources is not None:
        n_nodes = nodes.count()
        if isinstance(sample_sources, float):
            if not 0.0 < sample_sources <= 1.0:
                raise ValueError(
                    "sample_sources fraction must be in (0, 1], got "
                    f"{sample_sources}"
                )
            k = max(1, int(sample_sources * n_nodes))
        else:
            if sample_sources < 1:
                raise ValueError(
                    f"sample_sources count must be >= 1, got {sample_sources}"
                )
            k = min(int(sample_sources), n_nodes)
        if k < n_nodes:
            # deterministic pivot election: k smallest hash values.  A
            # k-sized sort-limit is a tiny TakeOrdered, not a full sort.
            sources = (
                nodes.orderBy(F.xxhash64("node").asc(), F.col("node").asc())
                .limit(k)
                .localCheckpoint(eager=True)
            )
            inv_sample_frac = n_nodes / k
    # forward: settled (s, node, dist, sigma); frontier at dist d
    frontier = sources.select(
        F.col("node").alias("s"), F.col("node").alias("node"),
        F.lit(0).alias("dist"), F.lit(1.0).alias("sigma"),
    ).localCheckpoint(eager=True)
    settled = frontier
    levels = [frontier]
    for d in range(1, max_depth + 1):
        seen = settled.select(
            F.col("s").alias("_ss"), F.col("node").alias("_seen")
        )
        nxt = (
            frontier.join(e, frontier["node"] == e["u"])
            .select("s", F.col("v").alias("node"), "sigma")
            .join(
                seen,
                (F.col("s") == F.col("_ss"))
                & (F.col("node") == F.col("_seen")),
                "left_anti",
            )
            .groupBy("s", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("dist", F.lit(d))
            .select("s", "node", "dist", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
        settled = settled.unionByName(nxt).localCheckpoint(eager=True)
    # backward: accumulate deltas level by level, deepest first
    deltas = None  # (s, node, delta) for levels already processed
    bc_parts = []
    for d in range(len(levels) - 1, 0, -1):
        below = levels[d]
        if deltas is not None:
            below_d = below.join(
                deltas, ["s", "node"], "left"
            ).select(
                "s", "node", "sigma",
                F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"),
            )
        else:
            below_d = below.select(
                "s", "node", "sigma", F.lit(0.0).alias("delta")
            )
        upper = levels[d - 1]
        contrib = (
            upper.alias("up")
            .join(e, F.col("up.node") == e["u"])
            .join(
                below_d.alias("bw"),
                (F.col("up.s") == F.col("bw.s"))
                & (F.col("v") == F.col("bw.node")),
            )
            .select(
                F.col("up.s").alias("s"),
                F.col("up.node").alias("node"),
                (
                    (F.col("up.sigma") / F.col("bw.sigma"))
                    * (F.lit(1.0) + F.col("bw.delta"))
                ).alias("c"),
            )
            .groupBy("s", "node")
            .agg(F.sum("c").alias("delta"))
            .localCheckpoint(eager=True)
        )
        deltas = contrib
        # exclude the source itself (endpoints don't accumulate bc)
        bc_parts.append(contrib.where(F.col("s") != F.col("node")))
    scale = (0.5 if not directed else 1.0) * inv_sample_frac
    if not bc_parts:
        return nodes.withColumn("bc", F.lit(0.0))
    allc = bc_parts[0]
    for p in bc_parts[1:]:
        allc = allc.unionByName(p)
    summed = allc.groupBy("node").agg(
        (F.sum("delta") * F.lit(scale)).alias("bc")
    )
    return (
        nodes.join(summed, "node", "left")
        .select("node", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc"))
    )
