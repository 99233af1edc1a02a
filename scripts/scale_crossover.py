"""Empirical scale-crossover benchmark (r4 verdict item 1).

Three keys were >2× slower than DuckDB at sf0.1 with a *measured-at-
one-point, argued-beyond-it* claim that the ratio reverses with corpus
size (duplicate_spans / remove_duplicate_spans: digests-through-one-
shuffle vs the oracle's 32×-payload naive explode). This script makes
the trend a measurement: it generates seeded documents fixtures at
1×/2×/5×/10× the sf0.1 corpus — same statistical shape as the driver
fixture (30-word vocab, uniform 10-100 token lengths, 20 sources,
lang mix en 40% / 15% each, ~4% mutated-copy near-dups, ~0.3% exact
dups; shape measured from the sf0.1 parquet, base rows preserved
verbatim so 1× IS the driver fixture) — then times Spark (noop-sink
write, the bench.py methodology) against DuckDB (oracle SQL,
fetchall) on the contested keys at every scale.

Fixtures land under .scale_fixtures/ (gitignored — derived data).

Usage: python scripts/scale_crossover.py [--scales 1,2,5,10] [--passes 3]
Prints one markdown table + one JSON line; paste the table into PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OUT_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_fixtures")

KEYS = [
    "duplicate_spans",
    "remove_duplicate_spans",
    "dedup_minhash",
    "doc_winnow",
    "dedup_clusters",
]

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.40, 0.15, 0.15, 0.15, 0.15]
P_NEAR_DUP = 0.04   # mutated copy of an earlier doc (shared prefix)
P_EXACT_DUP = 0.003


def gen_fixture(scale: int) -> str:
    """Base sf0.1 rows verbatim + seeded synthetic rows to scale× size."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(OUT_ROOT, f"x{scale}")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    base = pq.read_table(os.path.join(BASE, "documents.parquet"))
    texts = [t.as_py() for t in base.column("text")]
    langs = [t.as_py() for t in base.column("lang")]
    sources = [t.as_py() for t in base.column("source")]

    rng = random.Random(4242 + scale)
    n_base = len(texts)
    n_total = n_base * scale
    for i in range(n_base, n_total):
        r = rng.random()
        if r < P_EXACT_DUP and i > n_base:
            txt = texts[rng.randrange(i)]
        elif r < P_EXACT_DUP + P_NEAR_DUP and i > n_base:
            toks = texts[rng.randrange(i)].split(" ")
            cut = max(1, int(len(toks) * 0.7))
            txt = " ".join(
                toks[:cut]
                + [rng.choice(VOCAB) for _ in range(len(toks) - cut)]
            )
        else:
            txt = " ".join(
                rng.choice(VOCAB) for _ in range(rng.randint(10, 100))
            )
        texts.append(txt)
        langs.append(rng.choices(LANGS, LANG_W)[0])
        sources.append(f"src{rng.randrange(20)}")

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_total), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, out, row_group_size=16384)
    return out_dir


def median(xs):
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,5,10")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--keys", default=",".join(KEYS))
    ap.add_argument("--duck-budget", type=float, default=900.0,
                    help="skip a (key, engine) at larger scales once one run exceeds this")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    keys = args.keys.split(",")

    import duckdb

    from labelmain_spark import registry
    from labelmain_spark.session import build_session

    qs, oracle = registry.queries(), registry.oracle_sql()
    spark = build_session(app_name="scale_crossover")
    # warm codegen/JVM once
    spark.read.parquet(os.path.join(BASE, "documents.parquet")).count()

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
                    spark.catalog.clearCache()
                    t0 = time.time()
                    qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
                    ts.append(round(time.time() - t0, 3))
                row["spark"] = median(ts)
                # print the Spark medians BEFORE the DuckDB phase —
                # r12 lesson: a duck CTE that stalls >20 min (or gets
                # the whole run killed) must not hold the already-paid
                # Spark numbers hostage
                print(f"#   {key}: spark={row['spark']} (duck pending)", file=sys.stderr)
                if row["spark"] > args.duck_budget:
                    too_slow.add(("spark", key))
            if ("duck", key) not in too_slow:
                con = duckdb.connect()
                con.execute(
                    "CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/documents.parquet')"
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
            sp, du = row.get("spark"), row.get("duck")
            ratio = round(sp / du, 2) if sp and du else None
            print(f"#   {key}: spark={sp} duck={du} ratio={ratio}", file=sys.stderr)

    print("| key | " + " | ".join(f"x{s} spark / duck (ratio)" for s in scales) + " |")
    print("|---|" + "---|" * len(scales))
    for key in keys:
        cells = []
        for s in scales:
            r = results[key].get(s, {})
            sp, du = r.get("spark"), r.get("duck")
            if sp and du:
                cells.append(f"{sp:.2f} / {du:.2f} ({sp / du:.2f}×)")
            else:
                cells.append(f"{sp or '—'} / {du or '—'}")
        print(f"| {key} | " + " | ".join(cells) + " |")
    print(json.dumps({"scales": scales, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
