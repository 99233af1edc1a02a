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


def _files_overlapping_box(path: str, lo: int, hi: int) -> tuple[int, int]:
    """(#files whose x-range AND y-range overlap [lo,hi]², total)."""
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
            min(mins["x"]) <= hi
            and max(maxs["x"]) >= lo
            and min(mins["y"]) <= hi
            and max(maxs["y"]) >= lo
        ):
            hits += 1
    return hits, total


def test_zorder_prunes_box_filters(spark, tmp_path):
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

    # 16×16 box in one corner = 1/64 of the grid
    z_hit, z_tot = _files_overlapping_box(zpath, 0, 15)
    l_hit, l_tot = _files_overlapping_box(lpath, 0, 15)
    assert z_tot >= 8 and l_tot >= 8
    # z-order: the box lives in one curve corner — a small fraction of
    # files; linear: every x-file spans all y, so the y-range never
    # prunes and only the x-range does.
    assert z_hit < l_hit, f"zorder {z_hit}/{z_tot} vs linear {l_hit}/{l_tot}"
    assert z_hit <= z_tot // 4

    # layout change must not change data
    assert spark.read.parquet(zpath).count() == N
    back = spark.read.parquet(zpath).filter(
        (F.col("x") <= 15) & (F.col("y") <= 15)
    )
    assert back.count() == 16 * 16
