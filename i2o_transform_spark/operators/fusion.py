"""Record fusion: one golden record per duplicate cluster, per-attribute
survivorship policies.

After identity resolution (near-dup clustering, sameAs smushing, SCC) a
cluster of member records must collapse to ONE canonical node — but the
best value comes from a DIFFERENT member per attribute: the newest phone,
the longest description, the plurality type, the highest-priority source's
name.  The reference's merge procedures encode survivorship imperatively
per table (MSSQL/OMOPLoader.sql's upsert/dedup INSERT chains pick MAX()
or the preferred-source row inline); this operator makes the policy table
explicit and data-driven, the way a crawled KG needs it.

Complements, not duplicates, the neighbors:

* ``dedup.preference_dedup`` elects one whole ROW per entity;
* ``truth.resolve_conflicts`` arbitrates one VALUE by source reliability;
* :func:`fuse_records` mixes attributes ACROSS members under per-attribute
  policies, emitting the golden record plus conflict visibility.

Policies (every tie deterministic — stated per policy):

* ``mode``      plurality value; ties to the SMALLEST value
* ``longest``   max string length; ties to the LARGEST value
* ``newest``    max ``ts_col``; ties to the LARGEST value
* ``oldest``    min ``ts_col``; ties to the SMALLEST value
* ``min`` / ``max``  plain extrema
* ``prefer``    value from the member with the SMALLEST ``priority_col``
  (source rank: 0 beats 1); ties to the SMALLEST value

NULL member values never win (a policy aggregates over non-null claims
only); a cluster where every member is NULL for an attribute emits NULL.
Each fused attribute also gets an ``{attr}_n_values`` distinct-claim
count — 1 means unanimous, >1 flags a survived conflict for QA.

Scale shape (10^9 members)
--------------------------
One hash aggregation keyed on the cluster id covers every policy except
``mode`` (min/max/longest/newest/oldest/prefer are all single-pass
extrema over ``struct(key, value)`` — map-side combine applies, so the
exchange carries one partial row per cluster per mapper).  Each ``mode``
attribute adds one (cluster, value) count + window election, keyed on
the SAME cluster id, then a co-partitioned join back.  No driver-side
state, no fan-out: output is exactly one row per cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

POLICIES = ("mode", "longest", "newest", "oldest", "min", "max", "prefer")


def _extremum(attr: str, policy: str, ts_col: str | None,
              priority_col: str | None) -> Column:
    c = F.col(attr)
    guarded = lambda key: F.when(  # noqa: E731  (null claims never win)
        c.isNotNull(), F.struct(key.alias("k"), c.alias("v"))
    )
    if policy == "min":
        return F.min(c)
    if policy == "max":
        return F.max(c)
    if policy == "longest":
        return F.max(guarded(F.length(c)))["v"]
    if policy == "newest":
        if ts_col is None:
            raise ValueError(f"policy 'newest' on {attr!r} needs ts_col")
        return F.max(guarded(F.col(ts_col)))["v"]
    if policy == "oldest":
        # min(struct) ties to the smallest value — stated contract
        if ts_col is None:
            raise ValueError(f"policy 'oldest' on {attr!r} needs ts_col")
        return F.min(guarded(F.col(ts_col)))["v"]
    if policy == "prefer":
        if priority_col is None:
            raise ValueError(
                f"policy 'prefer' on {attr!r} needs priority_col"
            )
        return F.min(guarded(F.col(priority_col)))["v"]
    raise ValueError(f"unknown policy {policy!r} for {attr!r}; "
                     f"one of {POLICIES}")


def fuse_records(
    df: DataFrame,
    cluster_col: str,
    policies: dict[str, str],
    ts_col: str | None = None,
    priority_col: str | None = None,
) -> DataFrame:
    """Fuse member records into one golden record per ``cluster_col``
    value under per-attribute ``policies`` (attr -> policy name); see the
    module docstring for policy semantics and tie rules.  Returns one row
    per cluster: the cluster id, ``n_members``, each fused attribute
    under its own name, and ``{attr}_n_values`` conflict counts."""
    mode_attrs = [a for a, p in policies.items() if p == "mode"]
    agg_attrs = {a: p for a, p in policies.items() if p != "mode"}
    aggs = [F.count(F.lit(1)).cast("long").alias("n_members")]
    for attr, pol in agg_attrs.items():
        aggs.append(_extremum(attr, pol, ts_col, priority_col).alias(attr))
    for attr in policies:
        aggs.append(
            F.count_distinct(F.col(attr)).cast("long")
            .alias(f"{attr}_n_values")
        )
    out = df.groupBy(cluster_col).agg(*aggs)
    for attr in mode_attrs:
        counts = (
            df.where(F.col(attr).isNotNull())
            .groupBy(cluster_col, attr)
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        w = Window.partitionBy(cluster_col).orderBy(
            F.col("_c").desc(), F.col(attr)
        )
        elected = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(cluster_col, attr)
        )
        out = out.join(elected, cluster_col, "left")
    # stable column order: cluster, n_members, fused attrs, conflict counts
    return out.select(
        cluster_col,
        "n_members",
        *policies,
        *[f"{a}_n_values" for a in policies],
    )
