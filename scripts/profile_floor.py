"""Attribute the trivial-key dispatch floor (r6 verdict item 5).

39/49 dual-engine bench keys run >2x their DuckDB twin at sf0.1 purely
on a fixed ~0.3-0.6 s wall cost with no scale content. This script
decomposes that cost on one trivial key (join_inner, pinned plan:
scan + broadcast hash join + small agg) by measuring, at sf0.1 on the
bench session:

  1. noop-job floor      — spark.range(1) noop write (pure job RPC +
                           scheduling, no IO, no shuffle, no AQE)
  2. scan-only floor     — one parquet scan + count-style noop (adds
                           file listing + columnar read + task fanout)
  3. the key itself      — baseline conf vs candidate cheap wins:
                           fewer initial shuffle partitions, AQE
                           coalesce floor, local shuffle reader
  4. plan-build time     — dataframe construction + executedPlan()
                           (Catalyst analysis/optimization, driver-only)

Each measurement is the median of N reps (default 9) with the cache
cleared; run on an idle box. Output: one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROFILE_REPS", "9"))


def median_time(fn, reps=REPS):
    xs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    return round(statistics.median(xs), 4), round(max(xs) - min(xs), 4)


def main() -> None:
    from labelmain_spark.operators.joins import join_inner
    from labelmain_spark.session import build_session

    spark = build_session(app_name="profile_floor")
    # Warm: JVM, codegen, parquet footer cache.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    join_inner(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    results = {}

    # 1. pure job dispatch: no IO, no shuffle, no AQE.
    one = spark.range(1)
    results["noop_job"] = median_time(
        lambda: one.write.format("noop").mode("overwrite").save()
    )

    # 2. scan + map only (no shuffle): full lineitem scan, pruned to one col.
    scan = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_orderkey")
    results["scan_only"] = median_time(
        lambda: scan.write.format("noop").mode("overwrite").save()
    )

    # 4. driver-side plan build + optimize for the key.
    def plan_only():
        df = join_inner(spark, SF_DIR)
        df._jdf.queryExecution().executedPlan()

    results["plan_build"] = median_time(plan_only)

    # 3. the key under conf variants.
    def run_key():
        spark.catalog.clearCache()
        join_inner(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    variants = {
        "baseline": {},
        "shuffle8": {"spark.sql.shuffle.partitions": "8"},
        "coalesce_min1": {
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64MB",
        },
        "shuffle8+min1": {
            "spark.sql.shuffle.partitions": "8",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64MB",
        },
        "no_aqe": {"spark.sql.adaptive.enabled": "false"},
    }
    saved = {}
    for name, conf in variants.items():
        for k, v in conf.items():
            if k not in saved:
                saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        results[f"key_{name}"] = median_time(run_key)
        for k in conf:
            if saved[k] is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, saved[k])

    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "median_spread": results}))
    spark.stop()


if __name__ == "__main__":
    main()
