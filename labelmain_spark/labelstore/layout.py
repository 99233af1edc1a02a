"""Physical layout for the label store — the engine-side answer to the
reference's MongoDB B-tree index on ``addr`` (the ``filter={"addr": x}``
point lookups at bitcoinabuse/main.go:245, walletexplorer/main.go:111,
chainabuse/main.py:85).

Two layouts, two query patterns:

1. **Hash-bucket partitioned parquet** (``write_partitioned`` /
   ``lookup_partitioned``): the store is written under
   ``bucket=N/`` directories where ``N = pmod(xxhash64(addr), buckets)``.
   A point lookup computes the bucket on the driver and filters on the
   partition column, so the scan touches ONE directory out of
   ``buckets`` — at 100 TB with 4096 buckets a lookup reads ~25 GB of
   files' footers instead of the whole store, and the addr equality
   filter is additionally pushed to parquet row groups.

2. **Bucketed managed table** (``write_bucketed``): ``bucketBy(addr)``
   pre-shuffles the store ONCE at write time. Every later
   consolidation merge (full-outer join on addr — the reference's
   per-refresh upsert) then plans with NO Exchange on the store side:
   the join reads co-located buckets. At 100 TB the store-side shuffle
   is the single biggest cost of a refresh, and this removes it from
   every refresh forever in exchange for one write-time shuffle.

Both are config/layout choices around plain DataFrames — no engine
code, which is the point: Spark's planner exploits the layout
automatically (partition pruning; bucket-aware SortMergeJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"
DEFAULT_BUCKETS = 64  # local demo size; thousands at 100 TB


def _bucket_expr(addr, buckets: int):
    return F.pmod(F.xxhash64(addr), F.lit(buckets)).cast("int")


def write_partitioned(store: DataFrame, path: str, buckets: int = DEFAULT_BUCKETS) -> None:
    """Land the store as bucket=N/ partitioned parquet.

    ``repartition(bucket)`` before ``partitionBy`` keeps it to one file
    per partition directory (without it every task writes a sliver of
    every bucket — the classic small-files trap at scale)."""
    (
        store.withColumn(BUCKET_COL, _bucket_expr(F.col("addr"), buckets))
        .repartition(F.col(BUCKET_COL))
        .write.mode("overwrite")
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def lookup_partitioned(
    spark: SparkSession, path: str, addr: str, buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Point lookup that prunes to one partition directory.

    The bucket predicate compares the PARTITION column against a value
    computed driver-side from the same hash — Catalyst turns it into a
    PartitionFilter (directory pruning at planning time); the addr
    equality is pushed to parquet as a data filter."""
    bucket = spark.range(1).select(_bucket_expr(F.lit(addr), buckets)).first()[0]
    return (
        spark.read.parquet(path)
        .filter((F.col(BUCKET_COL) == F.lit(bucket)) & (F.col("addr") == F.lit(addr)))
        .drop(BUCKET_COL)
    )


def write_bucketed(
    store: DataFrame, table: str, buckets: int | None = None, sorted_by: str = "addr"
) -> None:
    """Save the store as a managed table bucketed+sorted on addr —
    the write-once shuffle that makes every subsequent addr-join
    shuffle-free on this side.

    Bucket count must equal ``spark.sql.shuffle.partitions`` (the
    default here): with a mismatch the planner falls back to a plain
    scan ("Bucketed: false — disabled by query planner") and shuffles
    BOTH join sides, which silently forfeits the whole point (verified
    in tests/test_layout.py: 8 buckets under 32 shuffle partitions →
    2 exchanges; 32 → 1)."""
    if buckets is None:
        buckets = int(store.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        store.write.mode("overwrite")
        .bucketBy(buckets, "addr")
        .sortBy(sorted_by)
        .format("parquet")
        .saveAsTable(table)
    )


def write_digest_history(
    digests: DataFrame, table: str, buckets: int | None = None
) -> None:
    """Persist a corpus DIGEST history (1 column ``h``, 32 B/doc) as a
    bucketed+sorted managed table — the production artifact behind
    every incremental-dedup docstring's "history probe is co-located"
    claim (functions/dedup.py::dedup_incremental,
    pipeline.py::corpus_incremental stage 2,
    streaming/incremental.py::incremental_dedup_stream). Written once
    per snapshot; every day's batch then anti-joins it with NO
    Exchange under the history scan (asserted in
    tests/test_layout.py::test_digest_history_probe_is_colocated).
    Same bucket-count contract as write_bucketed."""
    if buckets is None:
        buckets = int(digests.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    (
        digests.write.mode("overwrite")
        .bucketBy(buckets, "h")
        .sortBy("h")
        .format("parquet")
        .saveAsTable(table)
    )


def probe_history_digests(
    spark: SparkSession, table: str, batch: DataFrame
) -> DataFrame:
    """Incremental-dedup history probe against the bucketed digest
    store: batch rows whose digest history has never seen (the 'new'
    survivors). The store side reads its buckets in place — only the
    (small) batch shuffles, and historical TEXT never exists in this
    plan at all: the store IS digests."""
    return batch.join(spark.table(table), "h", "left_anti")


def consolidate_against_bucketed(
    spark: SparkSession, table: str, fresh: DataFrame
) -> DataFrame:
    """The refresh merge against a bucketed store: full-outer join on
    addr where the store side reads its buckets in place (no Exchange
    under the store scan — asserted in tests/test_layout.py). The
    fresh side still shuffles, but fresh ≪ store at every refresh."""
    from labelmain_spark.labelstore.store import consolidate

    return consolidate(spark.table(table), fresh)
