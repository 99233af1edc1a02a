"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship label-consolidation analog on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via labelmain_spark.registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark import registry
from labelmain_spark.sources.readers import load_table

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's whole pipeline as one plan.

    Scan events ("reports"), filter to error reports, nest them into a
    per-user labels array (bitcoinabuse/main.go:226-242 document build),
    then enrich with a broadcast-joined revenue aggregate per user from
    the star schema — scan → filter → agg-nest → join in one Catalyst
    plan.
    """
    ev = load_table(spark, SF0001, "events")
    orders = load_table(spark, SF0001, "orders")

    labels = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                        F.col("event_type").alias("name"),
                        F.lit("events").alias("src"),
                    )
                )
            ).alias("labels"),
            F.count(F.lit(1)).alias("n_labels"),
        )
    )
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("total_spend")
    )
    # No broadcast hint: spend is a per-customer aggregate with unbounded
    # cardinality at scale — let AQE pick broadcast only when it fits.
    return labels.join(
        spend, labels.user_id == spend.o_custkey, "left"
    ).select("user_id", "labels", "n_labels", "total_spend")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
