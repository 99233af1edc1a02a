"""Scans, point lookups, ordered pages, top-k (SURVEY.md §2.1, §2.6).

Reference behaviors re-expressed relationally:

- S1 paginated list scan (bitcoinabuse/main.go:86-119): pagination is an
  artifact of HTTP; over a columnar store it is simply a scan with
  projection+filter pushed down (`scan_project`).
- P11 point lookup by key (bitcoinabuse/main.go:245): `point_lookup`.
  100 TB layout note: served by partition pruning / Z-order on the key,
  not an index — the filter itself is pushed to the parquet footer.
- S5/O1/O2 ordered cursor page of 50 (chainabuse/main.py:18-26):
  `order_limit` (first page) and `cursor_page` (page after a cursor —
  the high-watermark form of T3 incremental reads).
- O3 top-k (most-reported addresses): `topk` — Catalyst compiles
  orderBy+limit to TakeOrderedAndProject: per-partition heap of k, then
  a k-row merge on the driver. No global sort, no full shuffle — this is
  the plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table


def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate, both pushed into the parquet scan.

    `.explain` shows PushedFilters: [LessThan(l_shipdate, ...)] and a
    ReadSchema of exactly the three selected columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-equality lookup (Mongo filter={'addr': x} analog)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") == F.lit(42)).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )


def order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First ordered page of 50 (GraphQL orderBy CREATED_AT ASC, first: 50).

    event_id tie-break keeps the page edge deterministic across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .select("event_id", "ts", "user_id", "event_type")
        .limit(50)
    )


def cursor_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page *after* a cursor: high-watermark filter + ordered limit
    (chainabuse endCursor semantics as a relational query)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .select("event_id", "ts", "user_id", "event_type")
        .limit(50)
    )


def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-referenced parts ("most-reported addresses" analog).

    Partial count per partition → shuffle on l_partkey → final count →
    TakeOrderedAndProject(10). Deterministic tie-break on the key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("l_partkey").asc())
        .limit(10)
    )


QUERIES = {
    "scan_project": scan_project,
    "point_lookup": point_lookup,
    "order_limit": order_limit,
    "cursor_page": cursor_page,
    "topk": topk,
}

ORACLE = {
    "scan_project": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1996-01-01'
    """,
    "point_lookup": """
        SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        FROM lineitem WHERE l_orderkey = 42
    """,
    "order_limit": """
        SELECT event_id, ts, user_id, event_type
        FROM events ORDER BY ts ASC, event_id ASC LIMIT 50
    """,
    "cursor_page": """
        SELECT event_id, ts, user_id, event_type
        FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
        ORDER BY ts ASC, event_id ASC LIMIT 50
    """,
    "topk": """
        SELECT l_partkey, COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
        ORDER BY cnt DESC, l_partkey ASC LIMIT 10
    """,
}
