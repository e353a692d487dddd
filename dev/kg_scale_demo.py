"""Scale demonstration for the session-B KG maintenance operators.

1. incremental_components on a 10M-node clustering + 10k-edge delta vs a
   from-scratch recompute over the same graph — the quantified case for
   incremental maintenance (the whole point of the operator at 10^12).
2. transitive_closure on a 2M-node / ~4M-edge DAG of depth ~21 —
   log-round squaring at a closure size of ~40M pairs.

Run: python dev/kg_scale_demo.py  (local[32]; prints one JSON line)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from i2o_transform_spark.operators.graph import (  # noqa: E402
    incremental_components,
    label_propagation_components,
    transitive_closure,
)
from i2o_transform_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("kg-scale-demo", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # --- incremental vs full CC -------------------------------------
    n = 10_000_000
    ids = spark.range(n).select(F.col("id"))
    base_edges = (
        ids.where(F.col("id") % 10 != 0)
        .select(F.col("id").alias("src"), (F.col("id") - 1).alias("dst"))
    )
    # the base clustering is known in closed form: root = id - id % 10
    labels = ids.select(
        F.col("id").alias("node"),
        (F.col("id") - F.col("id") % 10).alias("root"),
    ).repartition(32).localCheckpoint(eager=True)
    delta = (
        ids.where(F.col("id") % 10_000 == 0)
        .select(F.col("id").alias("src"), (F.col("id") + 10).alias("dst"))
    ).localCheckpoint(eager=True)

    t0 = time.time()
    inc = incremental_components(labels, delta)
    n_inc = inc.count()
    t_inc = time.time() - t0
    merged = inc.select("root").distinct().count()
    out["inc_cc"] = {
        "nodes": n_inc,
        "components_after": merged,
        "incremental_sec": round(t_inc, 2),
    }

    t0 = time.time()
    full = label_propagation_components(
        base_edges.unionByName(delta)
    )
    n_full = full.count()
    out["inc_cc"]["full_recompute_sec"] = round(time.time() - t0, 2)
    out["inc_cc"]["full_nodes"] = n_full
    out["inc_cc"]["speedup"] = round(
        out["inc_cc"]["full_recompute_sec"] / max(t_inc, 1e-9), 1
    )

    # --- transitive closure at 2M nodes ------------------------------
    m = 2_000_000
    edges = (
        spark.range(2, m)
        .select(F.col("id").alias("child"),
                F.expr("id div 2").alias("parent"))
    )
    t0 = time.time()
    clo = transitive_closure(edges, max_depth=32)
    pairs = clo.count()
    out["closure"] = {
        "nodes": m,
        "closure_pairs": pairs,
        "sec": round(time.time() - t0, 2),
    }
    print("KGSCALE " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
