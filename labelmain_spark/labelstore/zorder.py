"""Z-order (Morton) layout — multi-dimensional data clustering for
min/max pruning (SURVEY §7 milestone-5 layout item; the Delta/Iceberg
OPTIMIZE ZORDER equivalent, done with vanilla Spark).

Why: parquet scans prune row groups / files whose column min/max range
misses the filter. Sorting by ONE column gives perfect pruning on that
column and none on any other. Interleaving the bits of two (or more)
key columns gives a space-filling curve: files hold spatially-local
(c1, c2) rectangles, so a selective filter on EITHER column — or a box
on both — overlaps only O(√files) of them.

Everything is JVM bit arithmetic (shiftleft/bitwiseOR over masked
bits — same idiom as functions/dedup.py's SimHash pack); the write is
``repartitionByRange(zkey) + sortWithinPartitions(zkey)`` so files tile
the curve. At 100 TB this runs as the periodic compaction job of the
label store; readers need no code change — pruning falls out of
ordinary parquet statistics.

Caveat (documented, deliberate): values are clamped to ``bits`` low
bits, so columns must first be rank/bucket-encoded if they exceed the
range — ``bucketize`` below does the quantile-free power-of-two
downscale that real layouts use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension resolution; 2 dims × 16 bits = 32-bit key


def zorder_key(c1: Column, c2: Column, bits: int = Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative longs:
    result bit 2i = bit i of c1, bit 2i+1 = bit i of c2."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def bucketize(c: Column, lo: int, hi: int, bits: int = Z_BITS) -> Column:
    """Scale [lo, hi] into [0, 2^bits): the cheap monotone encode that
    makes any bounded numeric column z-orderable."""
    span = max(hi - lo, 1)
    return (
        (c.cast("double") - F.lit(lo)) * F.lit((1 << bits) - 1) / F.lit(span)
    ).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    key: Column,
    n_files: int,
    records_per_file: int | None = None,
) -> None:
    """Lay ``df`` out along the curve: range-partition by the z-key so
    each output file owns one contiguous curve segment (a spatial
    tile), sort within so row groups subdivide it."""
    out = (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    w = out.write.mode("overwrite")
    if records_per_file:
        w = w.option("maxRecordsPerFile", records_per_file)
    w.parquet(path)
