"""Heavier analytical queries over the star schema — the bench anchors
that exercise multi-operator plans end-to-end (scan → filter → join →
agg → sort/limit), in the shape of classic warehouse queries.

These stand in for the analytics a label store serves at 100 TB
("revenue per label source per month", "top reported addresses by
segment"):

- `pricing_summary` — TPC-H-Q1-shaped: one wide scan, grouped multi-agg
  with exact decimal sums. The plan to want: partial HashAggregate →
  single exchange on the tiny group key → final HashAggregate, filter
  pushed to parquet.
- `shipping_priority` — TPC-H-Q3-shaped: 3-way join (dim filter →
  broadcast) → agg → top-10 (TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import davg, dsum, sql_davg, sql_dsum
from labelmain_spark.sources.readers import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            F.round(davg("l_quantity"), 4).alias("avg_qty"),
            F.round(davg("l_extendedprice"), 4).alias("avg_price"),
            F.round(davg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01 00:00:00").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                "revenue",
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


QUERIES = {
    "pricing_summary": pricing_summary,
    "shipping_priority": shipping_priority,
}

ORACLE = {
    "pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
               {sql_dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
               ROUND({sql_davg('l_quantity')}, 4) AS avg_qty,
               ROUND({sql_davg('l_extendedprice')}, 4) AS avg_price,
               ROUND({sql_davg('l_discount')}, 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {sql_dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
}
