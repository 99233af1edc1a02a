"""Stream-stream joins (SURVEY §2.9 extension): the click→purchase
attribution funnel — the canonical two-stream interval join every
event pipeline runs, and the one Structured Streaming surface the
batch join family doesn't cover.

Semantics: for each click, every purchase by the SAME user within
``ATTR_WINDOW`` after the click (inclusive bounds on both ends).

Scale shape: Spark's stream-stream inner join buffers both sides in
the state store keyed by the equi-join key (user_id). State is bounded
ONLY because both the watermark and an explicit time-range condition
relating the two event times are present — Spark derives from them a
state-eviction watermark per side (a click can be dropped once no
future purchase within its window can still arrive, and vice versa).
Omitting the range condition makes state grow forever; that is the
stream-stream-join footgun this module pins down with the batch-parity
test. At scale the state store is RocksDB-sharded by user_id like any
keyed state; the join itself never shuffles more than the two event
streams' (user_id, ts, value) columns.

The batch twin (`attribution_join`) is the identical join on the batch
events table — a full DuckDB-oracle registry key; the streaming form
must agree with it on every closed window (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

ATTR_WINDOW = "1 hour"
ATTR_WM = "2 hours"


def _split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def _attr_cond():
    return F.expr(
        "user_id = p_user_id AND "
        f"purchase_ts >= click_ts AND purchase_ts <= click_ts + INTERVAL {ATTR_WINDOW}"
    )


def attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin: clicks × purchases, same user, purchase within the
    attribution window after the click."""
    clicks, purchases = _split(load_table(spark, sf_dir, "events"))
    return (
        clicks.join(purchases, _attr_cond())
        .select("user_id", "click_id", "click_ts", "purchase_ts", "purchase_value")
    )


def stream_attribution(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Streaming form: both sides watermarked; the time-range condition
    plus watermarks bound the join state (see module docstring)."""
    c = clicks.withWatermark("click_ts", ATTR_WM)
    p = purchases.withWatermark("purchase_ts", ATTR_WM)
    return c.join(p, _attr_cond()).select(
        "user_id", "click_id", "click_ts", "purchase_ts", "purchase_value"
    )


def attribution_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the LEFT OUTER form: every click, attributed or
    not (purchase columns null when no purchase followed in-window) —
    the funnel-conversion denominator."""
    clicks, purchases = _split(load_table(spark, sf_dir, "events"))
    return (
        clicks.join(purchases, _attr_cond(), "left_outer")
        .select("user_id", "click_id", "click_ts", "purchase_ts", "purchase_value")
    )


def stream_attribution_outer(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Streaming LEFT OUTER stream-stream join: unmatched clicks emit
    with nulls — but only once the watermark proves no matching
    purchase can still arrive, so null rows trail by the watermark
    delay (the outer-join lateness contract; state bounds identical to
    the inner form)."""
    c = clicks.withWatermark("click_ts", ATTR_WM)
    p = purchases.withWatermark("purchase_ts", ATTR_WM)
    return c.join(p, _attr_cond(), "leftOuter").select(
        "user_id", "click_id", "click_ts", "purchase_ts", "purchase_value"
    )


QUERIES = {
    "attribution_join": attribution_join,
    "attribution_join_outer": attribution_join_outer,
}

ORACLE = {
    "attribution_join": """
        SELECT c.user_id,
               c.event_id AS click_id,
               c.ts AS click_ts,
               p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM events c
        JOIN events p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 1 HOUR
        WHERE c.event_type = 'click'
          AND p.event_type = 'purchase'
    """,
    "attribution_join_outer": """
        SELECT c.user_id,
               c.event_id AS click_id,
               c.ts AS click_ts,
               p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON p.user_id = c.user_id
         AND p.ts >= c.ts
         AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
}
