"""Idle-box per-key timing: interleaved N-pass medians over a key
subset with the bench's exact methodology (clearCache before every
run, noop sink as the timed action) — the per-change measurement loop
of the optimization rounds (guide §1).

Usage: python scripts/time_keys.py key1,key2,... [passes]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from labelmain_spark import registry  # noqa: E402
from labelmain_spark.session import build_session  # noqa: E402


def main() -> None:
    keys = sys.argv[1].split(",")
    n_passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="time_keys")
    qs = registry.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm JVM
    samples: dict[str, list[float]] = {k: [] for k in keys}
    for p in range(n_passes):
        for key in keys:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"time_keys: {key} pass {p+1}")
            t0 = time.time()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            samples[key].append(dt)
            print(f"# pass {p+1}/{n_passes} {key}: {dt}s", file=sys.stderr)

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)

    out = {
        "medians": {k: median(v) for k, v in samples.items()},
        "samples": samples,
        "load1": round(os.getloadavg()[0], 2),
        "sf_dir": sf_dir,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
