"""Nested document model (SURVEY.md §1.1, M4): the chainabuse report
shape — a document with multiple array-of-struct children
(chainabuse/main.py:22: addresses[], evidences[], transactionHashes[],
...) — built relationally, queried via explode-flatten views.

The engine treats nested docs as first-class: build with
groupBy + collect_list(struct(...)), flatten with explode + field
access. Columnar storage keeps unqueried children unread (parquet
nested column pruning), so a metadata query over a billion nested docs
never touches the payload arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import DEC, stable_round
from labelmain_spark.sources.readers import load_table


def build_report_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assemble chainabuse-shaped nested docs from the fixtures: one doc
    per user with two array-of-struct children (reports + addresses
    analog) and scalar header fields."""
    ev = load_table(spark, sf_dir, "events")
    reports = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("event_id").alias("id"),
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("created_at"),
                F.col("event_type").alias("category"),
            )
        )
    )
    amounts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("event_id").alias("id"),
                F.col("value").cast(DEC).cast("double").alias("amount"),
            )
        )
    )
    return ev.groupBy("user_id").agg(
        reports.alias("reports"),
        amounts.alias("amounts"),
        F.count(F.lit(1)).alias("n_reports"),
    )


def nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip: build nested docs, explode a child back to rows,
    aggregate per category — proves build + flatten compose to the
    identity (the oracle computes the same directly from the flat
    table)."""
    docs = build_report_docs(spark, sf_dir)
    return (
        docs.select("user_id", F.explode("reports").alias("r"))
        .select("user_id", F.col("r.category").alias("category"))
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def nested_field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a nested child WITHOUT exploding: array sizes and
    a lambda-reduced sum over amounts, per doc — the 'how many labels
    does this address carry' query shape."""
    docs = build_report_docs(spark, sf_dir)
    total = F.aggregate(
        "amounts", F.lit(0.0), lambda acc, x: acc + x["amount"]
    )
    return docs.select(
        "user_id",
        F.size("reports").alias("n_reports_arr"),
        "n_reports",
        stable_round(total, 2).alias("total_amount"),
    )


QUERIES = {
    "nested_flatten": nested_flatten,
    "nested_field_stats": nested_field_stats,
}

ORACLE = {
    "nested_flatten": """
        SELECT event_type AS category, COUNT(*) AS n,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
    "nested_field_stats": """
        SELECT user_id,
               CAST(COUNT(*) AS INTEGER) AS n_reports_arr,
               COUNT(*) AS n_reports,
               (FLOOR(SUM(CAST(CAST(value AS DECIMAL(28,6)) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS total_amount
        FROM events GROUP BY user_id
    """,
}
