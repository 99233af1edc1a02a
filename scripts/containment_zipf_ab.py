"""Zipfian-vs-uniform corpus tier for containment_dedup (VERDICT r12
item 5): the docstring and SCALE.md argue a real (zipfian) corpus both
prunes the df head AND shrinks prefix posting lists, compounding the
AllPairs cut — but every deep tier so far ran the uniform-30-word
worst case. This script makes the claim a measurement.

Two seeded ×N fixtures of identical doc count and length distribution
(10-100 tokens, same near/exact-dup injection rates as
scale_crossover.py):

- uniform: tokens uniform over the 30-word vocab (the pathological
  shape — every shingle's df tracks N/135, the df-threshold prune
  never bites and prefix postings stay fat);
- zipf: tokens Zipf(s=1.05) over a 5000-word vocab (the natural-text
  shape: a hot head, a long rare tail — most shingles are rare, so
  each doc's rarest-(1-t) prefix is nearly-unique and the candidate
  join collapses).

Runs containment_dedup (Spark, noop sink, bench methodology) and its
DuckDB oracle (naive unpruned candidates) on both.

Fixtures land under .scale_fixtures/ (gitignored — derived data).

Usage: python scripts/containment_zipf_ab.py [--scale 5] [--passes 2]
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
OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_fixtures"
)

UNI_VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
ZIPF_V = 5000
ZIPF_S = 1.05
P_NEAR_DUP = 0.04
P_EXACT_DUP = 0.003


def _zipf_picker(rng: random.Random):
    weights = [1.0 / (k + 1) ** ZIPF_S for k in range(ZIPF_V)]
    vocab = [f"w{k}" for k in range(ZIPF_V)]

    def pick(n: int) -> list[str]:
        return rng.choices(vocab, weights, k=n)

    return pick


def gen_fixture(shape: str, scale: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    n_total = 5000 * scale  # sf0.1 documents row count × scale
    out_dir = os.path.join(OUT_ROOT, f"contain_{shape}_x{scale}")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(777 + scale + (0 if shape == "uniform" else 1))
    zpick = _zipf_picker(rng)
    texts: list[str] = []
    for i in range(n_total):
        r = rng.random()
        if r < P_EXACT_DUP and i > 0:
            txt = texts[rng.randrange(i)]
        elif r < P_EXACT_DUP + P_NEAR_DUP and i > 0:
            toks = texts[rng.randrange(i)].split(" ")
            cut = max(1, int(len(toks) * 0.7))
            tail_n = len(toks) - cut
            tail = (
                [rng.choice(UNI_VOCAB) for _ in range(tail_n)]
                if shape == "uniform"
                else zpick(tail_n)
            )
            txt = " ".join(toks[:cut] + tail)
        else:
            n = rng.randint(10, 100)
            toks = (
                [rng.choice(UNI_VOCAB) for _ in range(n)]
                if shape == "uniform"
                else zpick(n)
            )
            txt = " ".join(toks)
        texts.append(txt)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_total), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_total, pa.string()),
            "source": pa.array(
                [f"src{i % 20}" for i in range(n_total)], pa.string()
            ),
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
    ap.add_argument("--scale", type=int, default=5)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    import duckdb

    from labelmain_spark import registry
    from labelmain_spark.session import build_session

    qs, oracle = registry.queries(), registry.oracle_sql()
    q, osql = qs["containment_dedup"], oracle["containment_dedup"]
    spark = build_session(app_name="containment_zipf_ab")
    spark.read.parquet(os.path.join(BASE, "documents.parquet")).count()

    rows = {}
    for shape in ("zipf", "uniform"):
        sf_dir = gen_fixture(shape, args.scale)
        print(f"# {shape} ×{args.scale}: fixture at {sf_dir}", file=sys.stderr)
        sp, du, n_pairs = [], [], None
        for p in range(args.passes):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(
                f"containment zipf_ab {shape} pass {p + 1}"
            )
            t0 = time.time()
            df = q(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            sp.append(round(time.time() - t0, 2))
            if n_pairs is None:
                n_pairs = df.count()
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')"
            )
            t0 = time.time()
            con.execute(osql).fetchall()
            du.append(round(time.time() - t0, 2))
            con.close()
            print(
                f"#   pass {p + 1}: spark {sp[-1]}s duck {du[-1]}s "
                f"pairs={n_pairs}",
                file=sys.stderr,
            )
        rows[shape] = {
            "spark": median(sp),
            "duck": median(du),
            "spark_samples": sp,
            "duck_samples": du,
            "n_pairs": n_pairs,
        }

    print("| corpus | spark s | duck s | ratio | pairs |")
    print("|---|---|---|---|---|")
    for shape, r in rows.items():
        ratio = round(r["spark"] / r["duck"], 2) if r["duck"] else float("nan")
        print(
            f"| {shape} ×{args.scale} | {r['spark']} | {r['duck']} "
            f"| {ratio}× | {r['n_pairs']} |"
        )
    print(json.dumps({"scale": args.scale, "rows": rows,
                      "load1": round(os.getloadavg()[0], 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
