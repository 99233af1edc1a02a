"""Z-order layout: key correctness + the pruning property it exists
for — file-level min/max statistics must overlap a box filter on
FEWER files than a linearly sorted layout."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from labelmain_spark.labelstore.zorder import bucketize, write_zordered, zorder_key

N = 1 << 14  # 128 × 128 grid
SIDE = 1 << 7


def _grid(spark):
    return spark.range(N).select(
        (F.col("id") % SIDE).alias("x"), (F.col("id") / SIDE).cast("long").alias("y")
    )


def test_zorder_key_bits(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long"
    ).select(zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    # interleave(a=…ba1a0, b=…b1b0) = …b1 a1 b0 a0
    assert [r.z for r in rows] == [0, 1, 2, 0b100111]


def _files_overlapping(
    path: str, x: tuple[int, int], y: tuple[int, int]
) -> tuple[int, int]:
    """(#files whose x-range AND y-range overlap the given ranges,
    total files) — from real parquet footer statistics."""
    hits, total = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        mins = {"x": [], "y": []}
        maxs = {"x": [], "y": []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        total += 1
        if (
            min(mins["x"]) <= x[1]
            and max(maxs["x"]) >= x[0]
            and min(mins["y"]) <= y[1]
            and max(maxs["y"]) >= y[0]
        ):
            hits += 1
    return hits, total


def test_zorder_prunes_second_column(spark, tmp_path):
    """The property z-order exists for: a selective filter on the
    SECOND column prunes files. A layout sorted linearly by x cannot
    prune on y at all (every file spans the full y range); the
    z-ordered layout clusters both, so a y-strip overlaps only the
    files tiling that strip."""
    grid = _grid(spark)
    zkey = zorder_key(
        bucketize(F.col("x"), 0, SIDE - 1), bucketize(F.col("y"), 0, SIDE - 1)
    )
    zpath, lpath = str(tmp_path / "zord"), str(tmp_path / "linear")
    write_zordered(grid, zpath, zkey, n_files=16)
    # linear baseline: perfectly sorted by x (so y is unclustered)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(lpath)

    full = (0, SIDE - 1)
    strip = (0, 15)  # 1/8 of the y range
    z_hit, z_tot = _files_overlapping(zpath, full, strip)
    l_hit, l_tot = _files_overlapping(lpath, full, strip)
    assert z_tot >= 8 and l_tot >= 8
    assert l_hit == l_tot, "x-sorted files should all span the y strip"
    assert z_hit <= z_tot // 2, f"zorder y-strip hit {z_hit}/{z_tot} files"

    # and a box on BOTH columns still prunes at least as well as linear
    zb, _ = _files_overlapping(zpath, strip, strip)
    lb, _ = _files_overlapping(lpath, strip, strip)
    assert zb <= max(lb, z_tot // 4), f"box: zorder {zb} vs linear {lb}"

    # layout change must not change data
    assert spark.read.parquet(zpath).count() == N
    back = spark.read.parquet(zpath).filter(
        (F.col("x") <= 15) & (F.col("y") <= 15)
    )
    assert back.count() == 16 * 16
