"""Bloom prefilter A/B at the PRODUCTION shape (fixed benchmark).

The driver fixture's eval split is 5% of the corpus, so it GROWS with
scale — at ×5+ the 8 KiB bitset saturates and bloom_decontaminate's
guard correctly falls back to the exact join (scale_crossover.py
records that lane). But the design assumption of the operator is the
real one: a decontamination benchmark is a FIXED eval suite; the
corpus grows, the benchmark does not. This script measures that lane:
bench = the BASE (sf0.1) fixture's eval-split shingles, frozen across
tiers; train = the scaled corpus's non-eval docs; A = plain exact
semi-join plan, B = bloom-prefiltered plan, identical outputs asserted
per tier. Reports per-tier wall medians, the exact admit fraction
(set_bits/m)^k, and the measured candidate-row fraction.

Usage: python scripts/bloom_scale_ab.py [--scales 5,20] [--passes 3]
Prints one markdown table + one JSON line; paste into PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"


def median(xs):
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="5,20")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from labelmain_spark.functions import contamination as C
    from labelmain_spark.functions.dedup import _exploded_shingles
    from labelmain_spark.functions.sampling import _hash_bp_expr
    from labelmain_spark.session import build_session, release_caches
    from scripts.scale_crossover import gen_fixture

    spark = build_session(app_name="bloom_scale_ab")
    is_eval = F.expr(_hash_bp_expr("doc_id", "spark")) < C.CONTAM_EVAL_BP

    # the FIXED benchmark: base fixture's eval shingles, frozen
    bench_sh = (
        _exploded_shingles(spark, BASE).filter(is_eval).select("s").distinct()
    )
    words, admit = C._bloom_fit(bench_sh)
    n_bench = bench_sh.count()

    rows = []
    for scale in scales:
        sf_dir = gen_fixture(scale)
        train = (
            _exploded_shingles(spark, sf_dir)
            .filter(~is_eval)
            .select("doc_id", "s")
        )
        n_train = train.count()
        n_cand = C._bloom_candidates(train, words).count()

        # equality once per tier (identical outputs is the contract)
        a = {
            (r.doc_id, r.n_hits)
            for r in C._contaminated_docs(train, bench_sh).collect()
        }
        b = {
            (r.doc_id, r.n_hits)
            for r in C._contaminated_docs(
                C._bloom_candidates(train, words), bench_sh
            ).collect()
        }
        assert a == b, (scale, len(a), len(b))

        t_exact, t_bloom = [], []
        for _ in range(args.passes):
            release_caches(spark)
            spark.catalog.clearCache()
            tr = (
                _exploded_shingles(spark, sf_dir)
                .filter(~is_eval)
                .select("doc_id", "s")
            )
            t0 = time.time()
            C._contaminated_docs(tr, bench_sh).write.format("noop").mode(
                "overwrite"
            ).save()
            t_exact.append(round(time.time() - t0, 3))
            release_caches(spark)
            spark.catalog.clearCache()
            tr = (
                _exploded_shingles(spark, sf_dir)
                .filter(~is_eval)
                .select("doc_id", "s")
            )
            t0 = time.time()
            C._contaminated_docs(
                C._bloom_candidates(tr, words), bench_sh
            ).write.format("noop").mode("overwrite").save()
            t_bloom.append(round(time.time() - t0, 3))

        rows.append(
            {
                "scale": scale,
                "train_rows": n_train,
                "cand_rows": n_cand,
                "cand_frac": round(n_cand / max(1, n_train), 4),
                "exact_s": median(t_exact),
                "bloom_s": median(t_bloom),
            }
        )
        print(f"#   x{scale}: {rows[-1]}", file=sys.stderr)

    spark.stop()
    print(f"\nfixed benchmark: n_bench={n_bench}, admit={admit:.2e}\n")
    print("| docs | train rows | cand rows (frac) | exact s | bloom s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| ×{r['scale']} | {r['train_rows']:,} "
            f"| {r['cand_rows']:,} ({r['cand_frac']}) "
            f"| {r['exact_s']} | {r['bloom_s']} |"
        )
    print()
    print(json.dumps({"bench": n_bench, "admit": admit, "rows": rows}))


if __name__ == "__main__":
    main()
