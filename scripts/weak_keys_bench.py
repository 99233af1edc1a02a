"""Measure the r7 weak-list keys (flat >2x map-constant DuckDB ratios)
at a chosen scale fixture — the A/B harness for r7 verdict item 4
re-plans. Spark timing = noop-sink write (bench.py methodology),
DuckDB = fetchall on the registered oracle SQL; 3-pass medians.

Usage: python scripts/weak_keys_bench.py [fixture_dir] [key1,key2,...]
Default fixture: .scale_fixtures/x100 (documents-only keys).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = ["bm25_topk", "dataset_card", "entropy_filter", "pii_luhn", "keyword_tag"]


def main() -> int:
    fixture = sys.argv[1] if len(sys.argv) > 1 else ".scale_fixtures/x100"
    keys = sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_KEYS
    passes = int(os.environ.get("WEAK_PASSES", "3"))

    import duckdb

    from labelmain_spark import registry
    from labelmain_spark.session import build_session, release_caches

    spark = build_session(app_name="weak_keys_bench")
    qs = registry.queries()
    osql = registry.oracle_sql()

    con = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders",
              "customer", "supplier", "part", "nation", "region"]:
        p = os.path.join(fixture, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    out = {}
    for key in keys:
        st, dt = [], []
        for _ in range(passes):
            release_caches(spark)
            t0 = time.time()
            qs[key](spark, fixture).write.format("noop").mode("overwrite").save()
            st.append(time.time() - t0)
            if key in osql:
                t0 = time.time()
                con.execute(osql[key]).fetchall()
                dt.append(time.time() - t0)
        s = statistics.median(st)
        d = statistics.median(dt) if dt else None
        out[key] = {
            "spark_s": round(s, 2),
            "duck_s": round(d, 2) if d else None,
            "ratio": round(s / d, 2) if d else None,
        }
        print(f"{key:24s} spark={s:7.2f}s duck={d if d else float('nan'):7.2f}s "
              f"ratio={s / d if d else float('nan'):5.2f}x", flush=True)
    print(json.dumps({"fixture": fixture, "passes": passes, "keys": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
