"""Scale rows for the r10 seeded-oracle twins (`ann_ivf_seeded_topk`,
`semantic_dedup_seeded`): Spark registry key vs its own DuckDB oracle
on seeded gaussian corpora of growing size — the registry keys exactly
as shipped (k follows each key's own ∝N-with-cap rule), so the row
measures the DECISION PROCEDURE both engines re-derive; the fitted
family's vec_scale.py rows remain the deployment-scale (k ∝ N) story.

Usage: python scripts/seeded_scale.py [--sizes 2000,20000,60000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_fixtures"
)
DIM = 64


def gen(n: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(OUT_ROOT, f"vec{n}")
    out = os.path.join(out_dir, "embeddings.parquet")
    if not os.path.exists(out):
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.RandomState(7)
        v = rng.standard_normal((n, DIM)).astype(np.float32)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
                    "label": pa.array([i % 5 for i in range(n)], pa.int32()),
                }
            ),
            out,
            row_group_size=16384,
        )
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,20000,60000")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--keys", default="ann_ivf_seeded_topk,semantic_dedup_seeded")
    args = ap.parse_args()

    import duckdb

    from labelmain_spark import registry
    from labelmain_spark.session import build_session

    qs, oracle = registry.queries(), registry.oracle_sql()
    spark = build_session(app_name="seeded_scale")
    print("| key | N | spark | duck | ratio |")
    print("|---|---|---|---|---|")
    for n in [int(x) for x in args.sizes.split(",")]:
        sf_dir = gen(n)
        for key in args.keys.split(","):
            ts = []
            for _ in range(args.passes):
                spark.catalog.clearCache()
                t0 = time.time()
                qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
                ts.append(time.time() - t0)
            sp = round(min(ts), 2)
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')"
            )
            ts = []
            for _ in range(args.passes):
                t0 = time.time()
                con.execute(oracle[key]).fetchall()
                ts.append(time.time() - t0)
            du = round(min(ts), 2)
            con.close()
            print(f"| {key} | {n} | {sp} s | {du} s | {round(sp / du, 2)}× |",
                  flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
