"""kn4/kn5 at the ×200 splittable tier, run SAFELY (r10): the naive
scale_crossover run at ×200 was OOM-KILLED by the kernel — DuckDB's
in-process oracle reached 82 GB anon RSS (no memory_limit) while the
Spark JVM held its heap, and the box (125 GB) shot the python process.
This script measures the two engines SEQUENTIALLY per key — Spark
first (noop sink), then DuckDB under an explicit memory_limit with
disk spill enabled — so a DuckDB blow-up becomes a recordable outcome
instead of a dead process.

Usage: python scripts/kn_x200.py [--mem 80GB] [--keys quality_kn4_nll,quality_kn5_nll]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_fixtures", "x200",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mem", default="80GB")
    ap.add_argument("--keys", default="quality_kn4_nll,quality_kn5_nll")
    args = ap.parse_args()
    keys = args.keys.split(",")

    from labelmain_spark import registry
    from labelmain_spark.session import build_session

    qs, oracle = registry.queries(), registry.oracle_sql()
    spark = build_session(app_name="kn_x200")
    spark_t = {}
    for key in keys:
        spark.catalog.clearCache()
        t0 = time.time()
        qs[key](spark, FIXTURE).write.format("noop").mode("overwrite").save()
        spark_t[key] = round(time.time() - t0, 1)
        print(f"# spark {key}: {spark_t[key]} s", file=sys.stderr, flush=True)
    spark.stop()  # free the JVM heap before DuckDB gets the box

    import duckdb

    for key in keys:
        con = duckdb.connect(config={"memory_limit": args.mem})
        con.execute(f"SET temp_directory='{FIXTURE}/duck_tmp'")
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/documents.parquet')"
        )
        t0 = time.time()
        try:
            con.execute(oracle[key]).fetchall()
            dt = round(time.time() - t0, 1)
            print(
                f"RESULT {key}: spark={spark_t[key]} duck={dt} "
                f"ratio={round(spark_t[key] / dt, 2)}",
                flush=True,
            )
        except Exception as exc:
            dt = round(time.time() - t0, 1)
            print(
                f"RESULT {key}: spark={spark_t[key]} duck=FAILED after {dt}s "
                f"under memory_limit={args.mem} ({type(exc).__name__}: "
                f"{str(exc)[:200]})",
                flush=True,
            )
        con.close()


if __name__ == "__main__":
    main()
