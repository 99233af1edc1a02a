"""Bronze-layer file formats + quarantine (SURVEY.md §2.1 S9/S10).

The reference lands whatever the wire gives it and dumps undecodable
payloads to ``error_{ts}.log`` (chainabuse/main.py:65-66,72-73). The
engine's equivalents:

- explicit-schema JSON/CSV readers (never inferSchema in production —
  inference is a full extra pass and is nondeterministic under schema
  drift);
- PERMISSIVE mode with a ``_corrupt_record`` column, split into clean
  rows vs a quarantine DataFrame (the error-payload sink, but queryable
  instead of a log file);
- partitioned parquet writers for the silver layer (partition column =
  ingest date ⇒ partition pruning for every incremental read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_json_landing(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Read newline-JSON with explicit schema; return (clean, quarantine).

    Quarantine rows carry the raw payload for replay — the queryable
    form of the reference's error_{ts}.log dump.
    """
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    ).cache()  # one pass serves both splits
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, quarantine


def read_csv_landing(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    full = T.StructType(schema.fields + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    ).cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, quarantine


def write_silver(df: DataFrame, path: str, partition_col: str | None = None) -> None:
    """Silver-layer parquet write; partitioned when a partition column
    is given (ingest-date partitioning is what makes the T3 incremental
    high-watermark read a partition-pruned scan at 100 TB)."""
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (both are covered by test_sources round-trips; the engine is
    format-agnostic above the scan node)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, partition_col: str | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_col:
        w = w.partitionBy(partition_col)
    w.orc(path)
