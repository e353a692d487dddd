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


def blocked_connected_components(edges: DataFrame, block_col: str = "block") -> DataFrame:
    """CC within blocks: edges (block, src, dst) -> (node, root).

    Each block's edge set is shipped to one task as Arrow batches; union-find
    is O(E α(E)) per block.  Nodes in several blocks resolve to the min root
    across blocks afterwards (a single groupBy) — exact when blocks cover all
    edges of a component, which the blocking scheme guarantees by design.
    """
    per_block = (
        edges.select(block_col, "src", "dst")
        .groupBy(block_col)
        .applyInPandas(lambda _, pdf: _union_find(pdf), _CC_SCHEMA)
    )
    # a node seen in multiple blocks keeps its smallest root
    return per_block.groupBy("node").agg(F.min("root").alias("root"))


def label_propagation_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Global CC via iterative hash-min label propagation.

    labels(v) starts at v; each round every node takes the min label among
    itself and its neighbors; converges in O(component diameter) rounds.
    Each round is one shuffle on node id; intermediate results are cached and
    the loop exits early when no label changes (count of changed rows == 0 —
    a cheap aggregate, not a collect of data rows).
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
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("root"), F.coalesce(F.col("nbr_root"), F.col("root"))).alias("new_root"),
                F.col("root"),
            )
        )
        changed = new_labels.where(F.col("new_root") < F.col("root")).limit(1).count()
        labels = new_labels.select(
            "node", F.col("new_root").alias("root")
        ).localCheckpoint(eager=True)
        if changed == 0:
            break
    return labels
