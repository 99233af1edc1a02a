"""A/B profile for the events flat-wall quartet at a work-dominated
tier: isolate WHERE each key's Spark wall goes (scan, expression eval,
decimal aggregation, window sort) by timing plan variants on the same
fixture. Informs the r11 re-plans; results land in PERF.md.

Usage: python scripts/events_floor_ab.py [--dir .scale_fixtures/ev_x200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(label, df):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{label:42s} {dt:6.2f}s", flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".scale_fixtures/ev_x200")
    args = ap.parse_args()

    from labelmain_spark.session import build_session
    from labelmain_spark.sources.readers import load_table

    spark = build_session(app_name="events_floor_ab")
    ev = load_table(spark, args.dir, "events")
    ev.count()  # warm

    print("# --- time_rollup decomposition ---")
    # scan + truncate + count only (no value aggregation)
    t("hour count only", ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("b"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n")))
    # current plan's per-row decimal cast + decimal sum
    t("hour count + DECIMAL sum", ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("b"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"),
          F.sum(F.col("value").cast("decimal(28,6)")).alias("s")))
    # double sum (non-deterministic order — ceiling probe only)
    t("hour count + DOUBLE sum", ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("b"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")))
    # exact micro-unit long sum
    t("hour count + micro-LONG sum", ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("b"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"),
          F.sum(F.round(F.col("value") * 1e6).cast("long")).alias("s")))

    print("# --- cms decomposition (d=4, w=64) ---")
    from labelmain_spark.functions.sketch import CMS_W

    keys = ev.select("user_id")
    # the RETIRED r7-r10 spelling, frozen here for the A/B record:
    # explode seeds then md5(seed:key) per (row, seed)
    def _old_bucket(seed_col, key_col):
        m = f"md5(concat(CAST({seed_col} AS STRING), ':', CAST({key_col} AS STRING)))"
        digit = "(instr('0123456789abcdef', substr({m}, {i}, 1)) - 1)"
        val = " + ".join(
            digit.format(m=m, i=i + 1) + f" * {16 ** (3 - i)}" for i in range(4)
        )
        return f"(({val}) % {CMS_W})"

    seeds = keys.select(
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("seed"),
        F.col("user_id").alias("k"),
    )
    t("cms retired r7-r10 (4 md5/row)", seeds.select(
        "seed", F.expr(_old_bucket("seed", "k")).alias("bucket")
    ).groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("n")))
    # one md5 per row, 4 hex slices via conv
    m = F.md5(F.col("user_id").cast("string"))
    bs = F.array(*[
        (F.conv(F.substring(m, 1 + 4 * i, 4), 16, 10).cast("int") % CMS_W)
        for i in range(4)
    ])
    t("cms 1 md5/row + conv slices", keys.select(
        F.posexplode(bs).alias("seed", "bucket")
    ).groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("n")))
    # one md5 per row, instr-fold slices (oracle spelling)
    def fold(i: int):
        digit = (
            "(instr('0123456789abcdef', substr(md5(CAST(user_id AS STRING)), {p}, 1)) - 1)"
        )
        val = " + ".join(
            digit.format(p=4 * i + j + 1) + f" * {16 ** (3 - j)}" for j in range(4)
        )
        return F.expr(f"(({val}) % {CMS_W})")

    t("cms 4 md5/row instr (md5 not shared)", keys.select(
        F.posexplode(F.array(*[fold(i) for i in range(4)])).alias("seed", "bucket")
    ).groupBy("seed", "bucket").agg(F.count(F.lit(1)).alias("n")))

    print("# --- funnel decomposition ---")
    steps = ["click", "view", "purchase"]
    fev = ev.select("user_id", "event_type", "ts").filter(
        F.col("event_type").isin(steps)
    )
    t("funnel scan+filter only", fev)
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(W.unboundedPreceding, W.currentRow)
    )
    t("funnel sort-window 1 running min", fev.select(
        "user_id", "ts",
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(w).alias("c"),
    ))
    wrow = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    t("funnel ROWS-frame variant (probe)", fev.select(
        "user_id", "ts",
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).over(wrow).alias("c"),
    ))
    spark.stop()


if __name__ == "__main__":
    main()
