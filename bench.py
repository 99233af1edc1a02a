"""Per-round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {key: sec}, "sf": ...}.

Headline set = the heavier representatives of each operator family
(scan, agg, rollup, distinct, nest, explode, topk, ...); extended as
families land. Each query is executed once (cold plans, warm JVM) and
timed to completion of the action (count of the materialized result).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "scan_project",
    "filter_nonempty",
    "count_sum",
    "count_distinct",
    "collect_nested",
    "rollup_agg",
    "topk",
    "filter_null",
    "join_inner",
    "join_asof",
    "merge_upsert",
    "window_rank",
    "window_running",
    "reshape_3col",
    "regex_extract",
    "text_quality",
    "dedup_exact",
    "dedup_minhash",
    "ngram_jaccard",
    "similarity_topk",
    # udaf_grouped stays a §2.10 surface pin but is not headline: a
    # grouped-map over a 5-value key is deliberately not the scale-safe
    # plan; approx_quantiles (mergeable JVM sketch) is its scalable twin.
    "approx_quantiles",
    "parse_html_reports",
    "pricing_summary",
    "shipping_priority",
    "region_revenue",
    "order_priority_count",
    "customer_distribution",
    "top_supplier",
    "sessionize",
    "window_session",
    "time_rollup",
    "join_range",
    "label_consolidate",
    "doc_winnow",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from labelmain_spark import registry
    from labelmain_spark.session import build_session

    spark = build_session(app_name="labelmain_spark_bench")
    qs = registry.queries()

    # Warm the JVM/codegen path once so per-query timings measure the
    # engine, not session startup.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for key in HEADLINE:
        if key not in qs:
            continue
        t0 = time.time()
        n = qs[key](spark, sf_dir).count()
        timings[key] = round(time.time() - t0, 3)
        print(f"# {key}: {timings[key]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
