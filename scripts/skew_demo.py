"""Measured AQE skew-join run (r4 verdict item 6 — numbers for
SCALE.md instead of prose).

Builds a deliberately pathological fact table — ONE user owns ~83% of
all rows — joins it to a keyed profile table with broadcast disabled
(forcing the sort-merge path a 100 TB fact-fact join takes), and times
the join with AQE skew-split off vs on. Also runs the explicit-salt
variant (operators/joins.py join_salted pattern) for the AQE-resistant
case. The skew thresholds are lowered so the local fixture (~200 MB
hot partition at real defaults would need 5e9 rows) trips the same
code path a production hot key trips at 256 MB.

Usage: python scripts/skew_demo.py [--hot-rows 5000000]
Prints per-variant wall times + the skew=true marker from the AQE plan.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_fixtures", "skewjoin"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot-rows", type=int, default=5_000_000)
    ap.add_argument("--cold-rows", type=int, default=1_000_000)
    ap.add_argument("--n-users", type=int, default=100_000)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from labelmain_spark.session import build_session

    spark = build_session(
        app_name="skew_demo",
        extra_conf={
            # force the sort-merge path: no broadcast anywhere
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            # trip skew handling at local fixture sizes (prod default
            # 256MB / factor 5 — same logic, scaled to the fixture:
            # the hot key's post-shuffle partition is ~25 MB compressed)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        },
    )

    fact_p, users_p = os.path.join(OUT, "fact.parquet"), os.path.join(OUT, "users.parquet")
    if not os.path.exists(fact_p):
        hot = spark.range(args.hot_rows).select(
            F.lit(1).alias("user_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.concat(F.lit("p"), F.col("id") % 97).alias("payload"),
        )
        cold = spark.range(args.cold_rows).select(
            (F.col("id") % args.n_users + 2).alias("user_id"),
            (F.col("id") % 1000).cast("double").alias("value"),
            F.concat(F.lit("p"), F.col("id") % 97).alias("payload"),
        )
        hot.unionAll(cold).write.mode("overwrite").parquet(fact_p)
        spark.range(args.n_users + 2).select(
            F.col("id").alias("user_id"),
            (F.col("id") % 50).alias("segment"),
        ).write.mode("overwrite").parquet(users_p)

    fact = spark.read.parquet(fact_p)
    users = spark.read.parquet(users_p)

    def joined():
        return (
            fact.join(users, "user_id")
            .groupBy("segment")
            .agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))
        )

    def salted():
        nsalt = 16
        f = fact.withColumn("salt", (F.rand(seed=7) * nsalt).cast("int"))
        u = users.crossJoin(spark.range(nsalt).select(F.col("id").cast("int").alias("salt")))
        return (
            f.join(u, ["user_id", "salt"])
            .groupBy("segment")
            .agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))
        )

    def run(tag, builder):
        # collect(), not a noop write: the write would spawn a FRESH
        # QueryExecution, so the inspected plan would be the pre-AQE
        # one (isFinalPlan=false, no skew markers). The agg output is
        # ~50 rows, so collect timing == join timing.
        ts = []
        for _ in range(args.passes):
            t0 = time.time()
            df = builder()
            df.collect()
            ts.append(round(time.time() - t0, 2))
        plan = df._jdf.queryExecution().executedPlan().toString()
        has_skew = "skew=true" in plan
        med = sorted(ts)[len(ts) // 2]
        print(f"{tag}: median {med}s {ts} skew-split-in-plan={has_skew}")
        return med

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    off = run("skewJoin OFF ", joined)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    on = run("skewJoin ON  ", joined)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    salt = run("salted (AQE off)", salted)
    print(f"speedup AQE {off / on:.2f}x, salted {off / salt:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
