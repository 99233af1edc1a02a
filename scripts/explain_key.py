"""Dump .explain('formatted') for one or more registry keys to
plans/<outdir>/<key>_<tag>.txt — the before/after plan evidence the
optimization rounds commit alongside the code.

Usage: python scripts/explain_key.py <tag> <key> [<key> ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_PLAN_DIR (default plans/r13)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from labelmain_spark import registry  # noqa: E402
from labelmain_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.environ.get("SPARK_GRAFT_PLAN_DIR", "plans/r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(app_name="explain_key")
    qs = registry.queries()
    for key in keys:
        df = qs[key](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
