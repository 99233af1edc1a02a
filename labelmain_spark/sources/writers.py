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


def publish_corpus(spark: SparkSession, sf_dir: str, root: str) -> str:
    """Atomic versioned publish of the packed corpus — the batch twin
    of the streaming sink's commit protocol (streaming/incremental.py
    ``run_upsert_sink``): write the FULL new corpus under
    ``root/v<n+1>/``, then atomically swap the ``CURRENT`` pointer.
    Readers resolving through CURRENT see the old corpus until the
    instant of the swap and the new one after — never a torn mix. A
    crash mid-write leaves an orphan ``v`` dir and CURRENT untouched;
    the next publish overwrites it. The previous version is kept (one-
    step time travel / rollback), older ones pruned.

    At object-store scale the pointer file becomes a manifest commit
    (Delta/Iceberg); the layout here is the same contract on a
    filesystem. Returns the published version string."""
    import os
    import shutil
    import tempfile

    cur_file = os.path.join(root, "CURRENT")
    if os.path.isfile(cur_file):
        with open(cur_file) as f:
            prev = f.read().strip()
        nxt = f"v{int(prev[1:]) + 1}"
    else:
        os.makedirs(root, exist_ok=True)
        prev, nxt = None, "v0"
    export_packed_corpus(spark, sf_dir, os.path.join(root, nxt))
    fd, tmp = tempfile.mkstemp(dir=root, prefix="_current_")
    with os.fdopen(fd, "w") as f:
        f.write(nxt)
    os.replace(tmp, cur_file)  # the commit
    for d in os.listdir(root):
        if d.startswith("v") and d not in (nxt, prev):
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return nxt


def read_published(spark: SparkSession, root: str, version: str | None = None) -> DataFrame:
    """Read the published corpus: CURRENT by default, or a pinned
    version (the retained previous one) for rollback/repro reads."""
    import os

    if version is None:
        with open(os.path.join(root, "CURRENT")) as f:
            version = f.read().strip()
    return spark.read.parquet(os.path.join(root, version))
