"""Events-family scale tiers — the documents-only crossover harness's
sibling for the keys that read the EVENTS fact (time-series,
sessionization, funnel, sketch, graph families). Same methodology as
scale_crossover.py: base sf0.1 rows verbatim + seeded synthetic rows
preserving the measured shape (30-day window, ~67 events/user, uniform
5-type mix, props {"k": 0..99}); the USER POOL scales with the tier so
per-key densities stay production-shaped (more traffic, same retention
window) — per-user session/funnel state must NOT grow with corpus
size, which is exactly the property worth measuring.

Usage: python scripts/events_scale.py [--scales 10,50] [--passes 1]
       [--keys gap_fill,sessionize,...]
Prints one markdown table + one JSON line; paste into PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

BASE = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_fixtures",
)

KEYS = [
    "gap_fill",
    "sessionize",
    "window_session",
    "funnel_match",
    "time_rollup",
    "cms_user_sketch",
    "attribution_join",
    "pagerank",
    "user_components",
]

TYPES = ["signup", "purchase", "view", "click", "error"]
BASE_ROWS = 100_000
BASE_USERS = 1_500


def gen_fixture(scale: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(OUT_ROOT, f"ev_x{scale}")
    out = os.path.join(out_dir, "events.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    base = pq.read_table(os.path.join(BASE, "events.parquet"))
    n_new = BASE_ROWS * (scale - 1)
    rng = np.random.RandomState(911 + scale)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    t1 = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)
    ts = rng.randint(t0, t1, size=n_new).astype("datetime64[us]")
    tbl = pa.table(
        {
            "event_id": pa.array(
                range(BASE_ROWS, BASE_ROWS + n_new), pa.int64()
            ),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                BASE_USERS
                + rng.randint(0, max(1, BASE_USERS * (scale - 1)), size=n_new),
                pa.int64(),
            ),
            "event_type": pa.array(
                [TYPES[i] for i in rng.randint(0, len(TYPES), size=n_new)]
            ),
            "value": pa.array(
                np.round(rng.uniform(0, 200, size=n_new), 2), pa.float64()
            ),
            "props": pa.array(
                ['{"k": %d}' % k for k in rng.randint(0, 100, size=n_new)]
            ),
        }
    )
    # normalize the base table's ts to us so the concat schema is one
    base = base.set_column(
        base.schema.get_field_index("ts"),
        "ts",
        base.column("ts").cast(pa.timestamp("us")),
    )
    pq.write_table(pa.concat_tables([base.select(tbl.column_names), tbl]), out, row_group_size=16384)
    return out_dir


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="10,50")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--keys", default=",".join(KEYS))
    ap.add_argument("--duck-budget", type=float, default=600.0)
    args = ap.parse_args()
    scales = [int(x) for x in args.scales.split(",")]
    keys = args.keys.split(",")

    from labelmain_spark import registry
    from labelmain_spark.session import build_session, release_caches

    qs, oracle = registry.queries(), registry.oracle_sql()
    spark = build_session(app_name="events_scale")
    spark.read.parquet(os.path.join(BASE, "events.parquet")).count()

    results: dict[str, dict[int, dict[str, float]]] = {k: {} for k in keys}
    too_slow: set[tuple[str, str]] = set()
    for scale in scales:
        sf_dir = gen_fixture(scale)
        print(f"# scale x{scale}: fixture at {sf_dir}", file=sys.stderr)
        for key in keys:
            row: dict[str, float] = {}
            if ("spark", key) not in too_slow:
                ts = []
                for _ in range(args.passes):
                    release_caches(spark)
                    spark.catalog.clearCache()
                    t0 = time.time()
                    qs[key](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    ts.append(round(time.time() - t0, 3))
                row["spark"] = median(ts)
                # Spark medians print BEFORE the duck phase (r12: a
                # stalled oracle must not hold paid numbers hostage)
                print(f"#   {key}: spark={row['spark']} (duck pending)", file=sys.stderr)
                if row["spark"] > args.duck_budget:
                    too_slow.add(("spark", key))
            if key in oracle and ("duck", key) not in too_slow:
                con = duckdb.connect()
                con.execute(
                    "CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/events.parquet')"
                )
                ts = []
                for _ in range(args.passes):
                    t0 = time.time()
                    con.execute(oracle[key]).fetchall()
                    ts.append(round(time.time() - t0, 3))
                    if ts[-1] > args.duck_budget:
                        break
                row["duck"] = median(ts)
                if row["duck"] > args.duck_budget:
                    too_slow.add(("duck", key))
                con.close()
            results[key][scale] = row
            print(f"#   {key}: {row}", file=sys.stderr)
    spark.stop()

    hdr = " | ".join(f"x{s} spark / duck (ratio)" for s in scales)
    print(f"| key | {hdr} |")
    print("|" + "---|" * (len(scales) + 1))
    for key in keys:
        cells = []
        for s in scales:
            r = results[key].get(s, {})
            sp, du = r.get("spark"), r.get("duck")
            if sp is not None and du:
                cells.append(f"{sp:.2f} / {du:.2f} ({sp / du:.2f}×)")
            elif sp is not None:
                cells.append(f"{sp:.2f} / —")
            else:
                cells.append("—")
        print(f"| {key} | " + " | ".join(cells) + " |")
    print(
        json.dumps(
            {"scales": scales, "results": {k: {str(s): v for s, v in d.items()} for k, d in results.items()}}
        )
    )


if __name__ == "__main__":
    main()
