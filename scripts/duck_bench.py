"""Single-node throughput comparison: run bench.py's headline set in
DuckDB (the oracle SQL, same parquet, same machine) and print one JSON
line per engine-comparable query — the baseline proxy BASELINE.md
prescribes ("record PySpark wall-clock vs DuckDB wall-clock on the
identical oracle SQL at sf0.1").

Usage: python scripts/duck_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    import bench
    import __spark_entry__ as entry

    oracle = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    timings: dict[str, float] = {}
    for key in bench.HEADLINE:
        if key not in oracle:  # rows-only keys have no SQL twin
            continue
        t0 = time.time()
        n = len(con.execute(oracle[key]).fetchall())
        timings[key] = round(time.time() - t0, 3)
        print(f"# {key}: {timings[key]}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "duckdb_headline_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
