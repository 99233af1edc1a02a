"""Cache-lifetime footprint (r14, VERDICT #6): run the heavy registry
keys in ONE session with NO release between them — the worst-case
long-lived-driver pattern — and record cumulative cached storage after
each key, then after one release_caches call. The table lands in
OPTIMIZATION_r14.md so the per-key storage cost of the internal
persists (audit pair tables, exploded shingles, KN pad table) is on
record at the bench SF.

Usage: python scripts/cache_footprint.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from labelmain_spark import registry  # noqa: E402
from labelmain_spark.session import build_session, release_caches  # noqa: E402

HEAVY = [
    "lsh_recall_audit",
    "containment_dedup",
    "dedup_minhash",
    "dedup_clusters",
    "dedup_incremental_near",
    "split_leakage_safe",
    "quality_kn5_nll",
    "dsir_weights",
    "corpus_incremental",
    "ngram_jaccard",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = build_session(app_name="cache_footprint")
    qs = registry.queries()
    jsc = spark.sparkContext._jsc.sc()  # noqa: SLF001

    def storage() -> tuple[int, int, int]:
        infos = list(jsc.getRDDStorageInfo())
        return (
            len(infos),
            sum(i.memSize() for i in infos),
            sum(i.diskSize() for i in infos),
        )

    rows = []
    for key in HEAVY:
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        n, mem, disk = storage()
        rows.append({"after_key": key, "cached_rdds": n,
                     "mem_mb": round(mem / 2**20, 1),
                     "disk_mb": round(disk / 2**20, 1)})
        print(json.dumps(rows[-1]), flush=True)
    release_caches(spark)
    n, mem, disk = storage()
    rows.append({"after_key": "release_caches", "cached_rdds": n,
                 "mem_mb": round(mem / 2**20, 1),
                 "disk_mb": round(disk / 2**20, 1)})
    print(json.dumps(rows[-1]), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
