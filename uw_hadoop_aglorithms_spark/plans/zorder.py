"""Z-order (Morton-curve) lake layout — multi-dimensional data skipping.

A date/time-sorted lake layout (sources/lake.py) prunes one dimension;
queries that ALSO filter a second high-cardinality column (user, key,
geo cell) still touch every file of the surviving partitions. Writing
files clustered by the interleaved-bit Morton value of two columns
keeps 2-D-close rows in the same files, so the parquet min/max stats of
BOTH columns become selective per file and a 2-D box query touches a
small, contiguous set of files instead of all of them.

The z-value is a pure map-side bit-interleave expression (whole-stage
codegen, no UDF); the layout write is repartitionByRange + local sort
on it — one range shuffle at write time, zero query-time cost. This is
the same mechanism Delta/Iceberg OPTIMIZE ZORDER applies; here it is
plain Parquet + an expression, no table format required.

Scale: the write shuffle is the data volume (unavoidable for any
re-clustering); the payoff compounds with file count — at 100 TB and
~1M files, a box query over two z-ordered dimensions touches
O(perimeter) files instead of O(selectivity of one dim) × all files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits kept per dimension (z-value fits in 2*Z_BITS <= 63 of a long).
Z_BITS = 16


def z_value(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two non-negative ints, each masked to `bits`
    low bits (callers normalize: rank, bucket, or truncate first).
    Built as a flat OR chain of shift/mask terms — stays inside
    whole-stage codegen."""
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Affine-scale [lo, hi] into [0, 2^bits) — map-side arithmetic."""
    span = max(hi - lo, 1.0)
    return (
        F.least(
            F.floor((col - F.lit(lo)) / F.lit(span + 1.0) * F.lit(1 << bits)),
            F.lit((1 << bits) - 1),
        )
        .cast("long")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: Column,
    col_b: Column,
    n_files: int = 16,
    bits: int = Z_BITS,
) -> None:
    """Write `df` as `n_files` parquet files range-clustered by the
    Morton value of (col_a, col_b). The z column itself is dropped —
    the layout is carried by file boundaries + per-file min/max stats
    of the original columns.

    Both dimensions are min/max-scaled to the same bit width BEFORE
    interleaving — with unequal native widths (a 4-bit user id against a
    25-bit epoch minute) the wider column's high bits dominate the curve
    and it degenerates to a single-dim sort. The min/max pass is one
    tiny aggregate (4 scalars on the driver); Delta's OPTIMIZE ZORDER
    normalizes by sampled range-partition ids for the same reason.
    """
    tmp = df.withColumn("_za", col_a.cast("double")).withColumn(
        "_zb", col_b.cast("double")
    )
    r = tmp.agg(
        F.min("_za"), F.max("_za"), F.min("_zb"), F.max("_zb")
    ).first()
    z = z_value(
        _scaled(F.col("_za"), r[0], r[1], bits),
        _scaled(F.col("_zb"), r[2], r[3], bits),
        bits,
    )
    (
        tmp.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "_za", "_zb")
        .write.mode("overwrite")
        .parquet(path)
    )
