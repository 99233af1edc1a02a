"""Training-data export writers — the sink side of the corpus pipeline
(SURVEY §2.1 sinks family, extended to the §2.11 north-star export
shapes: filtered/deduped/packed corpus → on-disk training shards).

Design for 100 TB:

- ``write_shards`` partitions the output BY SHARD (the assignment
  computed relationally by functions/packing.py), so a training job
  reads shard N with partition pruning — one directory listing, no
  scan of the rest. ``maxRecordsPerFile`` bounds individual file sizes
  without an extra repartition pass.
- The write itself is the standard distributed parquet sink: each task
  writes its own files under a job-scoped staging protocol, so failed
  executors retry without torn output. At object-store scale the same
  call targets s3a:// with the cloud committer — config, not code.
- JSONL export mirrors the parquet path (`format("json")`) for
  tokenizer pipelines that stream text; compression is a writer option
  (`.option("compression", "zstd")`), orthogonal to layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.functions.packing import shard_pack
from labelmain_spark.sources.readers import load_table

MAX_RECORDS_PER_FILE = 100_000


def write_shards(
    docs: DataFrame,
    assignments: DataFrame,
    path: str,
    fmt: str = "parquet",
) -> None:
    """Join documents to their shard assignment and write one directory
    per shard (``shard_id=N/``). The join is keyed on doc_id — at scale
    both sides carry the same doc_id layout from upstream, and AQE
    handles the rest; no collect, no driver loop."""
    out = docs.join(assignments.select("doc_id", "shard_id"), "doc_id")
    (
        out.repartition("shard_id")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", MAX_RECORDS_PER_FILE)
        .partitionBy("shard_id")
        .format(fmt)
        .save(path)
    )


def export_packed_corpus(
    spark: SparkSession, sf_dir: str, path: str, fmt: str = "parquet"
) -> None:
    """End-to-end export: shard-pack the documents table and write the
    sharded corpus."""
    docs = load_table(spark, sf_dir, "documents")
    write_shards(docs, shard_pack(spark, sf_dir), path, fmt=fmt)


def read_shard(spark: SparkSession, path: str, shard_id: int) -> DataFrame:
    """Read ONE shard with partition pruning (the filter prunes
    directories — asserted in tests, not just row-filtered)."""
    return spark.read.parquet(path).filter(F.col("shard_id") == shard_id)
