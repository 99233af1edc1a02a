"""Column profiling — the data-quality pass every ingest pipeline runs
before trusting a new drop (null rates, cardinalities, ranges).

Long-format output (one row per column) so the profile of a 400-column
table is still one narrow result. All five stats per column ride ONE
aggregation over one scan — Spark computes the 5×N aggregate
expressions in a single partial→final HashAggregate pass, so profiling
cost is a single read of the table regardless of column count (the
naive per-column loop would be N scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "props"]


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-scan long-format profile of the given columns."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nn"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nn").alias("n_nonnull"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


def profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the events table's scalar columns."""
    ev = load_table(spark, sf_dir, "events")
    return profile(ev, PROFILE_COLS)


def _sql_profile_col(c: str) -> str:
    return f"""
        SELECT '{c}' AS column,
               COUNT({c}) AS n_nonnull,
               CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct,
               MIN(CAST({c} AS VARCHAR)) AS min_str,
               MAX(CAST({c} AS VARCHAR)) AS max_str
        FROM events"""


QUERIES = {"profile_stats": profile_stats}

ORACLE = {
    "profile_stats": "\nUNION ALL\n".join(_sql_profile_col(c) for c in PROFILE_COLS),
}
