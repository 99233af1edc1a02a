"""Aggregation operators (SURVEY.md §2.4).

- A2 grouped list-collect (walletexplorer/main.go:226-244 walletType →
  walletNames directory): `wallet_map`.
- A3 nest-into-array (bitcoinabuse/main.go:226-242 builds the per-addr
  `labels` array of structs): `collect_nested` — the engine's core
  document-building aggregate. Serialized to canonical JSON so the
  nested value is hashable identically across engines.
- A5 running counters (chainabuse/main.py:58-60): `count_sum`.
- A6 count per group (bitcoinabuse/main.go:111): `group_count`.
- A7 distinct count per group: `count_distinct` (exact here; at 100 TB
  the approx variant is `approx_count_distinct` — see
  functions/text.py for the approximate twin).
- A8 rollup: `rollup_agg`.

All aggregates are partial→final (map-side combine) by construction —
Spark's HashAggregate always pre-aggregates before the shuffle, so the
exchange carries one row per (partition × group), not per input row.
Collect-list aggregates are the exception (no reduction in the partial
phase); they are bounded here by the per-key group size, which in the
label domain is the per-address report count (small by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import (
    DEC,
    davg,
    dsum,
    micro_units,
    sql_davg,
    sql_dsum,
    sql_micro_units,
    stable_round,
)
from labelmain_spark.sources.readers import load_table


def group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows per group (reports-per-page log line analog)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


def count_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-ish counters: count + exact sum + exact mean per type."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "total_value"),
        stable_round(davg("value"), 4).alias("avg_value"),
    )


def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct addresses per source analog: distinct users per type.

    Exact distinct = two-phase shuffle (expand by key, then count).
    At 100 TB prefer approx_count_distinct (HLL, single pass, no
    key expansion) when ±2% is acceptable.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def wallet_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """walletType → sorted distinct walletNames directory
    (walletexplorer/main.go:203-247), as p_type → brands."""
    part = load_table(spark, sf_dir, "part")
    return part.groupBy("p_type").agg(
        F.array_join(F.array_sort(F.collect_set("p_brand")), "|").alias("brands"),
        F.countDistinct("p_brand").alias("n_brands"),
    )


def collect_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key nested document build: user_id → sorted array of
    (ts, event_type, value) structs, serialized to canonical JSON.

    This is the bitcoinabuse labels-array shape: one row per address
    with all reports nested (main.go:226-242). Timestamps are
    pre-formatted to strings and floats pre-rounded so the JSON bytes
    are engine-independent.
    """
    ev = load_table(spark, sf_dir, "events")
    item = F.struct(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("event_type").alias("event_type"),
        stable_round(F.col("value").cast("decimal(28,6)").cast("double"), 2).alias("value"),
    )
    return (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(
            F.to_json(F.array_sort(F.collect_list(item))).alias("labels_json"),
            F.count(F.lit(1)).alias("n_labels"),
        )
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity stats: rollup(returnflag, linestatus).

    Late-r11 re-plan, two optimizations in one shape. (1) ROLLUP
    PUSHDOWN: the naive form's Expand node multiplies the FULL fact
    table ×3 before the shuffle; aggregating first at the finest
    (flag, status, partition) grain and rolling up the tiny partial
    table computes identical sums (count/sum are mergeable — the same
    argument as time_rollup's hour→day→month derivation) while the
    expand touches ≤ groups·partitions rows. (2) The same two-level
    micro-unit long form as pricing_summary (micro_units docstring:
    per-partition long partials bounded by maxPartitionBytes, decimal
    only at the merge; measured 3.1 → ~1 s class on the sf0.1
    fixture). NULL-key semantics are unchanged: data NULLs flow into
    the partial table as values and both forms conflate them with
    subtotal NULLs identically (no grouping_id column here — the
    grouping_sets_agg key carries that distinction)."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    part = (
        li.groupBy(
            "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
        )
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(micro_units(F.col("l_quantity"))).alias("mq"),
            F.sum(micro_units(revenue)).alias("mr"),
        )
    )
    dsum_partial = lambda c: F.sum(F.col(c).cast(DEC)).cast("double") / F.lit(1e6)  # noqa: E731
    return part.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n"),
        dsum_partial("mq").alias("sum_qty"),
        dsum_partial("mr").alias("revenue"),
    )


def _qty_partials(li: DataFrame) -> DataFrame:
    """Finest-grain (flag, status, partition) partials for the
    rollup/cube/grouping-sets trio — the late-r11 two-level micro-unit
    shape (see rollup_agg): long fixed-point sums on the scan side,
    decimal only above the first exchange, and the Expand node
    multiplies ≤ groups·partitions partial rows instead of the fact
    table."""
    return li.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("_pid")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(micro_units(F.col("l_quantity"))).alias("mq"),
    )


def _dsum_partial(c: str):
    return F.sum(F.col(c).cast(DEC)).cast("double") / F.lit(1e6)


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-granularity stats: cube(returnflag, linestatus) — rollup's
    superset (adds the (∅, linestatus) slices). At 100 TB the expand
    factor is the set count (4 here vs rollup's 3), which is exactly
    why it now expands the partial table, not the fact table
    (_qty_partials)."""
    li = load_table(spark, sf_dir, "lineitem")
    return _qty_partials(li).cube("l_returnflag", "l_linestatus").agg(
        F.sum("_n").alias("n"),
        _dsum_partial("mq").alias("sum_qty"),
    )


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the generalization rollup/cube compile
    to: exactly the requested slices ((returnflag), (linestatus), ()),
    with grouping_id disambiguating all-NULL group keys from NULL data.
    Same two-level partial shape as rollup/cube; grouping_id is
    computed over the partial table's expand and is identical to the
    fact-table form because the grouping COLUMNS are identical."""
    li = load_table(spark, sf_dir, "lineitem")
    return _qty_partials(li).groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().alias("gid"),
        F.sum("_n").alias("n"),
        _dsum_partial("mq").alias("sum_qty"),
    )


QUERIES = {
    "group_count": group_count,
    "count_sum": count_sum,
    "count_distinct": count_distinct,
    "wallet_map": wallet_map,
    "collect_nested": collect_nested,
    "rollup_agg": rollup_agg,
    "cube_agg": cube_agg,
    "grouping_sets_agg": grouping_sets_agg,
}

ORACLE = {
    "grouping_sets_agg": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM({sql_micro_units('l_quantity')}) AS DOUBLE) / 1000000.0 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    "group_count": """
        SELECT o_orderpriority, COUNT(*) AS n FROM orders GROUP BY o_orderpriority
    """,
    "count_sum": f"""
        SELECT event_type, COUNT(*) AS n,
               {sql_dsum('value')} AS total_value,
               (FLOOR({sql_davg('value')} * 10000.0 + 0.5) / 10000.0) AS avg_value
        FROM events GROUP BY event_type
    """,
    "count_distinct": """
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type
    """,
    "wallet_map": """
        SELECT p_type,
               array_to_string(list_sort(list(DISTINCT p_brand)), '|') AS brands,
               COUNT(DISTINCT p_brand) AS n_brands
        FROM part GROUP BY p_type
    """,
    "collect_nested": """
        SELECT user_id,
               to_json(list_sort(list({
                   'ts': strftime(ts, '%Y-%m-%d %H:%M:%S'),
                   'event_type': event_type,
                   'value': (FLOOR(CAST(CAST(value AS DECIMAL(28,6)) AS DOUBLE) * 100.0 + 0.5) / 100.0)
               }))) AS labels_json,
               COUNT(*) AS n_labels
        FROM events WHERE event_type = 'error'
        GROUP BY user_id
    """,
    # same floor-fixed-point spelling as the Spark plan (micro_units);
    # BIGINT sums accumulate in 128 bits duck-side, one level suffices.
    "rollup_agg": f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM({sql_micro_units('l_quantity')}) AS DOUBLE) / 1000000.0 AS sum_qty,
               CAST(SUM({sql_micro_units('l_extendedprice * (1.0 - l_discount)')}) AS DOUBLE) / 1000000.0 AS revenue
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM({sql_micro_units('l_quantity')}) AS DOUBLE) / 1000000.0 AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
}
