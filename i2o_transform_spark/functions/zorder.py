"""Z-order (Morton) clustering — multi-dimensional data-layout for scan
pruning.

The reference tunes physical layout with clustered indexes on its hot keys
(MSSQL/OMOPLoader.sql CREATE CLUSTERED INDEX sites; SURVEY §2.6 O1).  A
clustered index orders by ONE key; at lake scale the analogue for queries
that filter on SEVERAL columns is Z-ordering: interleave the bits of the
(range-normalized) dimensions so rows close in the multi-dimensional space
land in the same files, and parquet/Iceberg min-max stats prune on EVERY
dimension instead of just the leading sort key.

Scale design: the z-value is pure integer bit arithmetic built from
``shiftright``/``shiftleft``/bitwise-AND expressions — JVM-side, inside
whole-stage codegen, no UDF; the only extra work versus a plain sort is one
tiny min/max agg per dimension (driver literals, like any range-partition
sampling) and the same repartitionByRange shuffle the plain sort needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Bit-interleave k already-normalized integer columns (each in
    [0, 2^bits)): output bit (i*k + j) = bit i of column j.

    The code must fit the 63 non-sign bits of a long: bit position
    ``bits*k - 1`` reaching 63 would flip z-values negative (inverting the
    range sort), and >= 64 silently wraps the Java shift amount mod 64,
    colliding bit positions — both corrupt the layout with no error, so
    the bound is asserted here."""
    k = len(cols)
    if bits * k > 63:
        raise ValueError(
            f"z-order code needs bits*len(cols) <= 63 (got {bits}*{k}="
            f"{bits * k}); lower bits= (layout resolution, not correctness)"
        )
    out = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return out


def z_value(
    cols: list[Column | str],
    mins: list[int],
    maxs: list[int],
    bits: int = 16,
) -> Column:
    """Morton code of the given integer columns, min-max scaled to
    ``bits`` bits each.  Bounds are passed as literals (compute them once
    with a tiny agg, like range-partition sampling); rows outside the
    bounds clamp to the edge cells — layout quality degrades gracefully,
    correctness never depends on the bounds."""
    norm = []
    for c, lo, hi in zip([F.col(c) if isinstance(c, str) else c for c in cols],
                         mins, maxs):
        span = max(1, hi - lo)
        scaled = ((c.cast("long") - F.lit(lo)) * F.lit((1 << bits) - 1)) / F.lit(span)
        clamped = F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit((1 << bits) - 1).cast("long"),
                    F.floor(scaled).cast("long")),
        )
        norm.append(clamped)
    return _interleave(norm, bits)


def zorder_by(
    df: DataFrame,
    cols: list[str],
    num_partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` into ``num_partitions`` z-ordered output partitions:
    one agg for the per-column bounds, then ``repartitionByRange`` +
    ``sortWithinPartitions`` on the Morton code — the write-side layout
    step before a parquet/Iceberg sink (each output file gets a tight
    min/max envelope on EVERY z-ordered column)."""
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    if bounds[f"lo_{cols[0]}"] is None:
        return df  # empty input: nothing to cluster, keep plan/schema as-is
    mins = [int(bounds[f"lo_{c}"]) for c in cols]
    maxs = [int(bounds[f"hi_{c}"]) for c in cols]
    zv = z_value(cols, mins, maxs, bits=bits)
    zc = "_z"
    while zc in df.columns:  # never clobber a user column named _z
        zc += "_"
    return (
        df.withColumn(zc, zv)
        .repartitionByRange(num_partitions, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
    )
