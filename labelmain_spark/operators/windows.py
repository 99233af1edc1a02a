"""Window functions + time bucketing (SURVEY.md §2.5, T6).

- W1 `window_rank` — latest report per address: the reference keeps only
  current state by overwriting the whole doc (bitcoinabuse/main.go:245);
  relationally that's row_number()=1 per key by recency.
- W2 `window_lag` — per-key sequence deltas.
- W3 `window_running` — the chainabuse running totals
  (main.py:58-60,92-94) as a frame-spec window. Running sums aggregate
  in DECIMAL so every prefix is exact (see operators/parity.py).
- T6 `window_tumbling` — event-time tumbling window aggregation
  (`F.window`), the batch twin of the Structured-Streaming form in
  streaming/. 1-hour tumbling ≡ date_trunc('hour') for the oracle.
- `date_trunc` — calendar bucketing of the orders fact.

Scale note: every window here partitions by a high-cardinality key
(user_id) — state per partition is small and the single shuffle is on
the natural key. No global (unpartitioned) windows anywhere: those
serialize the whole table through one task and are banned in this
codebase.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import DEC, dsum, sql_dsum, stable_round
from labelmain_spark.sources.readers import load_table


def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest event per user (row_number over recency, deterministic
    tie-break on event_id)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-to-event value delta (lag)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        stable_round(F.col("value") - F.lag("value").over(w), 4).alias("delta"),
    )


def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact running total of value per user (frame-spec window)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias("running_value"),
    )


def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: account-balance quartile + percent_rank of
    each customer within its nation — the segmentation shape ("which
    addresses are in the top quartile of report counts per chain")."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        stable_round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
    )


def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic over the silver layer: order age at a fixed
    as-of date, fulfilment-month distance, next-week follow-up date —
    datediff / date_add / month extraction in one projection."""
    orders = load_table(spark, sf_dir, "orders")
    asof = F.lit("1998-12-31").cast("date")
    od = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.datediff(asof, od).alias("age_days"),
        F.date_add(od, 7).alias("followup_date"),
        F.month(od).alias("order_month"),
        F.year(od).alias("order_year"),
    )


def date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order rollup via calendar truncation."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_price"),
        )
    )


SESSION_GAP = "30 minutes"


def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window): merge a user's events
    whose inter-event gap is < 30 min; window end = last event + gap.
    The streaming-capable twin of the manual gaps-and-islands
    `sessionize` (operators/advanced.py) — in Structured Streaming the
    identical expression runs stateful with watermark eviction. Spark
    starts a NEW session at gap >= 30 min (strict boundary), which the
    oracle's lag-epoch comparison mirrors."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "session_value",
        )
    )


def gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill with last-observation-carried-forward
    (the TimescaleDB `time_bucket_gapfill` + `locf` shape, and the
    feature-store backfill primitive): per user, an hourly bucket
    SPINE spanning [first event hour, last event hour], hours with no
    events emitted as gap rows carrying the previous bucket's value
    forward.

    Scale: one (user, hour) partial-agg shuffle builds the observed
    buckets; per-user bounds reduce from THOSE buckets (not the raw
    events); the spine explode is bounded by the time window per key
    (hours, not events); the LOCF window partitions by user_id — the
    high-cardinality natural key, never a global window. Per-bucket
    representative value is max_by(value, event_id) — unique event_id
    makes it deterministic in both engines, and NO float arithmetic
    happens anywhere (values are carried verbatim), so there is
    nothing to round."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.max_by("value", "event_id").alias("v"),
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = spine.join(hourly, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").alias("bucket_ts"),
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_events"),
        F.last("v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("n_obs").isNull().alias("is_gap"),
    )


QUERIES = {
    "window_rank": window_rank,
    "gap_fill": gap_fill,
    "window_lag": window_lag,
    "window_running": window_running,
    "window_tumbling": window_tumbling,
    "window_session": window_session,
    "window_ntile": window_ntile,
    "date_arith": date_arith,
    "date_trunc": date_trunc,
}

ORACLE = {
    "gap_fill": """
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS h,
                   COUNT(*) AS n_obs, max_by(value, event_id) AS v
            FROM events GROUP BY user_id, date_trunc('hour', ts)
        ), bounds AS (
            SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
            FROM hourly GROUP BY user_id
        ), spine AS (
            SELECT user_id,
                   unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
            FROM bounds
        )
        SELECT s.user_id, s.h AS bucket_ts,
               CAST(COALESCE(hy.n_obs, 0) AS BIGINT) AS n_events,
               last_value(hy.v IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_filled,
               (hy.n_obs IS NULL) AS is_gap
        FROM spine s
        LEFT JOIN hourly hy ON s.user_id = hy.user_id AND s.h = hy.h
    """,
    "window_rank": """
        SELECT user_id, event_id, ts, event_type FROM (
            SELECT user_id, event_id, ts, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "window_lag": """
        SELECT event_id, user_id, ts,
               (FLOOR((value - LAG(value) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id)) * 10000.0 + 0.5) / 10000.0) AS delta
        FROM events
    """,
    "window_running": """
        SELECT event_id, user_id, ts,
               CAST(SUM(CAST(value AS DECIMAL(28,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        FROM events
    """,
    "window_session": """
        WITH seq AS (
            SELECT user_id, ts, value,
                   CASE WHEN epoch(ts) - LAG(epoch(ts)) OVER w IS NULL
                             OR epoch(ts) - LAG(epoch(ts)) OVER w >= 1800
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sess AS (
            SELECT user_id, ts, value,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS seq
            FROM seq
        )
        SELECT user_id,
               MIN(ts) AS sess_start,
               MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS session_value
        FROM sess GROUP BY user_id, seq
    """,
    "window_tumbling": f"""
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               COUNT(*) AS n, {sql_dsum('value')} AS sum_value
        FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
    "date_trunc": f"""
        SELECT date_trunc('month', o_orderdate) AS month,
               COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS total_price
        FROM orders GROUP BY date_trunc('month', o_orderdate)
    """,
    "window_ntile": """
        SELECT c_custkey, c_nationkey,
               CAST(NTILE(4) OVER w AS INTEGER) AS bal_quartile,
               (FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0) AS bal_pct_rank
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    "date_arith": """
        SELECT o_orderkey,
               CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')
                    AS INTEGER) AS age_days,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS DATE) AS followup_date,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(year(o_orderdate) AS INTEGER) AS order_year
        FROM orders
    """,
}
