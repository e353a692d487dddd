"""Blank-node canonicalization: label-independent canonical forms for RDF
graphs with existential (blank) nodes.

Why a KG construction pipeline needs this: extraction emits subgraphs whose
auxiliary nodes carry GENERATED ids — reified statements, n-ary relation
nodes, provenance bundles (operators/reify.py mints content ids precisely
to avoid this, but third-party interchange data arrives with arbitrary
``_:bNNN`` labels).  Two deliveries of the same fact bundle then differ
only in bnode naming, and naive triple-set dedup (W3C RDF 1.1 graph
equality is defined UP TO blank-node relabeling) sees them as different.
This module computes colors and graph hashes that are INVARIANT under
bnode relabeling, so relabeled duplicates collide and can be deduped at
graph granularity — the hash-refinement core of iso-canonicalization
(Hogan, "Canonical Forms for Isomorphic and Equivalent RDF Graphs", 2017;
URDNA2015's first-degree hashing is the same idea).

Algorithm: color refinement (1-WL) specialized to RDF.

* ground terms (IRIs / literals) are self-identifying: color = md5(term),
  content-addressed like functions/hashing.content_id,
* every bnode starts at the same color md5('*bnode*'),
* each round recolors every bnode as md5(previous color + the SORTED
  DISTINCT list of direction-tagged edge tokens ``o>pred>color(obj)`` and
  ``i>pred>color(subj)``) — both directions, unlike the out-only
  bisimulation refinement in operators/summarize.py, because canonical
  labeling must see a bnode's full neighborhood.

Guarantees (and the honest limit): colors and the graph hash are exactly
invariant under bnode relabeling (every step is label-free).  Distinct
structures are separated up to 1-WL resolution at the chosen round count —
``rounds`` must reach the bnode-chain diameter, and 1-WL-equivalent
non-isomorphic graphs (highly regular gadgets, vanishingly rare in
extraction output) can still collide; collisions MERGE nothing by
themselves — treat the hash as a dedup/blocking key and verify equality
on the colored triple sets before dropping a graph.

Scale shape (10^9 graphs x small bundles, or one huge graph)
------------------------------------------------------------
Each round is two joins keyed on node id (attach object colors, attach
subject colors) + one (graph, node) aggregation with a sorted
collect_set bounded by bnode degree — extraction bundles are
constant-sized, so rounds are linear scans; everything is keyed on the
graph/node columns, the store's natural partitioning.  The graph hash is
one commutative aggregation (sum of triple hashes mod 2^61-1 — order-
and partitioning-independent), so the whole canonicalization is
O(rounds) exchanges and never collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = (1 << 61) - 1  # Mersenne prime: commutative sum stays in a long


def _is_bnode(col, prefix: str):
    return F.col(col).startswith(prefix)


def bnode_colors(
    quads: DataFrame,
    rounds: int | str = 3,
    bnode_prefix: str = "_:",
    graph_col: str | None = None,
    checkpoint: bool = False,
    max_rounds: int = 32,
) -> DataFrame:
    """Color refinement over the blank nodes of ``quads`` (subj, pred,
    obj [, graph]).  Returns (graph,) node, color — one row per blank
    node; ground terms are not emitted (their color is md5(term) by
    definition).  With ``graph_col``, refinement runs independently per
    named graph (a bnode id is scoped to its graph, per RDF 1.1).

    ``checkpoint``: the color frame feeds TWO joins per round, so the
    logical plan holds 2^rounds copies of the scan; downstream consumers
    (canonical_graph_hashes) read the result twice more.  ``False``
    (default) keeps everything one lazy plan — measured 1.5-2x faster up
    to ~10^6 bnodes, where recomputing the refinement beats
    materializing it.  Set ``True`` for billion-node stores or deep
    round counts: rounds from the third onward localCheckpoint, trading
    one materialization for the exponential plan (and double final
    recompute).

    ``rounds="auto"`` iterates until the color PARTITION stabilizes
    (distinct (graph, color) count unchanged — refinement only splits
    classes, so count equality is a true fixpoint), bounded by
    ``max_rounds`` and checkpointed per round (the round count is then
    data-dependent, so lineage must not grow unbounded).  Use auto when
    bnode-chain diameters are unknown — a fixed round count silently
    under-refines deeper chains.  CAVEAT for cross-run registries
    (streaming dedup): the md5 chain makes colors a function of the
    round COUNT, so two datasets compare equal only at the same count —
    auto converging at different depths per batch would break
    cross-batch hash equality; pin an explicit ``rounds`` there (the
    streaming sink does)."""
    g = graph_col
    t = quads.select(
        *([F.col(g).alias("_g")] if g else [F.lit("").alias("_g")]),
        "subj", "pred", "obj",
    )
    init = F.md5(F.lit("*bnode*"))
    ground = lambda c: F.md5(F.col(c))  # noqa: E731

    nodes = (
        t.select("_g", F.col("subj").alias("node"))
        .union(t.select("_g", F.col("obj").alias("node")))
        .where(_is_bnode("node", bnode_prefix))
        .distinct()
    )
    colors = nodes.select("_g", "node", init.alias("color"))
    auto = rounds == "auto"
    limit = max_rounds if auto else int(rounds)
    prev_classes = None
    for r in range(limit):
        # out-edge tokens: color of obj (ground color inline, bnode color
        # joined); in-edge tokens symmetric.
        oc = colors.select(
            "_g", F.col("node").alias("obj"), F.col("color").alias("_oc")
        )
        out_tok = (
            t.where(_is_bnode("subj", bnode_prefix))
            .join(oc, ["_g", "obj"], "left")
            .select(
                "_g", F.col("subj").alias("node"),
                F.concat(
                    F.lit("o>"), F.col("pred"), F.lit(">"),
                    F.coalesce(F.col("_oc"), ground("obj")),
                ).alias("tok"),
            )
        )
        sc = colors.select(
            "_g", F.col("node").alias("subj"), F.col("color").alias("_sc")
        )
        in_tok = (
            t.where(_is_bnode("obj", bnode_prefix))
            .join(sc, ["_g", "subj"], "left")
            .select(
                "_g", F.col("obj").alias("node"),
                F.concat(
                    F.lit("i>"), F.col("pred"), F.lit(">"),
                    F.coalesce(F.col("_sc"), ground("subj")),
                ).alias("tok"),
            )
        )
        toks = out_tok.union(in_tok).groupBy("_g", "node").agg(
            F.array_join(F.array_sort(F.collect_set("tok")), "|")
            .alias("_toks")
        )
        colors = colors.join(toks, ["_g", "node"], "left").select(
            "_g", "node",
            F.md5(F.concat(
                F.col("color"), F.lit("|"),
                F.coalesce(F.col("_toks"), F.lit("")),
            )).alias("color"),
        )
        if auto or (checkpoint and r >= 2):
            colors = colors.localCheckpoint(eager=False)
        if auto:
            n = colors.select("_g", "color").distinct().count()
            if n == prev_classes:
                break
            prev_classes = n
    out = colors
    if g:
        return out.select(F.col("_g").alias(g), "node", "color")
    return out.select("node", "color")


def canonical_graph_hashes(
    quads: DataFrame,
    graph_col: str = "graph",
    rounds: int = 3,
    bnode_prefix: str = "_:",
    checkpoint: bool = False,
) -> DataFrame:
    """Per named graph: a canonical hash invariant under bnode relabeling
    plus the profile a dedup stage filters on.  Returns (graph, n_triples,
    n_bnodes, n_colors, canon_hash):

    * ``canon_hash`` — sum over triples of
      ``xxhash64(colored_subj, pred, colored_obj) mod 2^61-1`` (summed in
      decimal(38,0) so the modular reduction never overflows a long under
      ANSI arithmetic), where colored_* replaces a bnode by its
      refinement color — commutative, so row order and partitioning
      never matter,
    * ``n_colors`` — distinct bnode colors (orbit count at 1-WL
      resolution: n_colors < n_bnodes means automorphic bnodes exist).

    Relabeled copies of a graph get identical rows (hash AND profile);
    use (n_triples, n_bnodes, canon_hash) as the graph-dedup blocking
    key."""
    colors = bnode_colors(
        quads, rounds=rounds, bnode_prefix=bnode_prefix,
        graph_col=graph_col, checkpoint=checkpoint,
    )
    sc = colors.select(
        F.col(graph_col), F.col("node").alias("subj"),
        F.col("color").alias("_sc"),
    )
    oc = colors.select(
        F.col(graph_col), F.col("node").alias("obj"),
        F.col("color").alias("_oc"),
    )
    colored = (
        quads.join(sc, [graph_col, "subj"], "left")
        .join(oc, [graph_col, "obj"], "left")
        .select(
            F.col(graph_col),
            F.coalesce("_sc", F.col("subj")).alias("_s"),
            "pred",
            F.coalesce("_oc", F.col("obj")).alias("_o"),
            _is_bnode("subj", bnode_prefix).cast("long").alias("_sb"),
            _is_bnode("obj", bnode_prefix).cast("long").alias("_ob"),
            F.col("subj").alias("_raw_s"), F.col("obj").alias("_raw_o"),
        )
    )
    trip_hash = F.pmod(
        F.xxhash64(F.col("_s"), F.col("pred"), F.col("_o")), F.lit(_MOD)
    ).cast("decimal(38,0)")
    colored = colored.withColumn("_th", trip_hash)
    bn = (
        colored.select(
            graph_col,
            F.when(F.col("_sb") == 1, F.col("_raw_s")).alias("bn"),
            F.when(F.col("_sb") == 1, F.col("_s")).alias("bc"),
        )
        .union(colored.select(
            graph_col,
            F.when(F.col("_ob") == 1, F.col("_raw_o")),
            F.when(F.col("_ob") == 1, F.col("_o")),
        ))
        .where(F.col("bn").isNotNull())
        .groupBy(graph_col)
        .agg(
            F.countDistinct("bn").cast("long").alias("n_bnodes"),
            F.countDistinct("bc").cast("long").alias("n_colors"),
        )
    )
    base = colored.groupBy(graph_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_triples"),
        F.expr(f"CAST(sum(_th) % {_MOD} AS BIGINT)").alias("canon_hash"),
    )
    return base.join(bn, graph_col, "left").select(
        graph_col, "n_triples",
        F.coalesce("n_bnodes", F.lit(0)).cast("long").alias("n_bnodes"),
        F.coalesce("n_colors", F.lit(0)).cast("long").alias("n_colors"),
        "canon_hash",
    )


def skolemize(
    triples: DataFrame,
    base: str = "https://ex.org/.well-known/genid/",
    rounds: int | str = 3,
    bnode_prefix: str = "_:",
    strict: bool = True,
) -> DataFrame:
    """Replace blank nodes with RELABEL-INVARIANT Skolem IRIs (RDF 1.1
    §3.5 well-known genid): bnode -> ``base + md5(color)[:24]`` where
    color is the node's 1-WL refinement color — so two parses of the
    same document under fresh ``_:`` labels skolemize to the SAME IRIs
    and their triple sets become directly mergeable/set-dedupable
    (the point of skolemizing a crawl: downstream joins never special-
    case bnode scoping again).

    The color is structural, so AUTOMORPHIC bnodes (1-WL-equivalent
    nodes, e.g. two indistinguishable members of a symmetric pair)
    would collide onto one IRI — that would MERGE distinct nodes, so
    ``strict=True`` (default) raises when any color is shared by two
    bnodes within a scope; ``strict=False`` appends a per-color
    ``row_number`` ordinal instead (deterministic given the store's
    lexical order, but NOT relabel-invariant for the colliding nodes —
    the documented 1-WL resolution limit).  Scale shape: one
    bnode-sized color frame joined back twice (broadcast when it
    fits)."""
    colors = bnode_colors(triples, rounds=rounds,
                          bnode_prefix=bnode_prefix)
    per_color = colors.groupBy("color").agg(
        F.count(F.lit(1)).alias("_n")
    )
    if strict:
        guard = per_color.where(F.col("_n") > 1)
        dup = F.broadcast(guard).alias("g")
        colors = (
            colors.alias("c")
            .join(dup, F.col("c.color") == F.col("g.color"), "left_outer")
            .select(
                "c.node",
                F.when(
                    F.col("g.color").isNotNull(),
                    F.raise_error(F.concat(
                        F.lit("1-WL-equivalent blank nodes share color "),
                        F.col("c.color"),
                        F.lit(" — skolemizing would merge them; use "
                              "strict=False for ordinal suffixes"),
                    )),
                ).otherwise(F.col("c.color")).alias("color"),
                F.lit(None).cast("long").alias("_ord"),
            )
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("color").orderBy("node")
        colors = colors.select(
            "node", "color",
            (F.row_number().over(w) - 1).cast("long").alias("_ord"),
        )
    iri = F.concat(
        F.lit(base), F.substring(F.md5("color"), 1, 24),
        F.when(F.col("_ord") > 0,
               F.concat(F.lit("-"), F.col("_ord").cast("string")))
        .otherwise(F.lit("")),
    )
    sk = F.broadcast(colors.select("node", iri.alias("_sk")))
    out = triples
    for c in ("subj", "obj"):
        m = sk.select(F.col("node").alias(c), F.col("_sk").alias(f"_sk_{c}"))
        out = out.join(m, c, "left_outer")
        out = out.withColumn(c, F.coalesce(F.col(f"_sk_{c}"), F.col(c)))
        out = out.drop(f"_sk_{c}")
    return out.select(*triples.columns)  # joins reorder; restore caller's
