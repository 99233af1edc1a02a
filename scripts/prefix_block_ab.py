"""Hostile-block A/B for the two prefix-dup paths (r12 continuation).

The dedup_prefix docstring claims the blocked candidate JOIN is
quadratic in block multiplicity while the lexicographic-successor
WINDOW path is O(N log N) — the lever for boilerplate openings at
corpus scale. This script measures both paths on a corpus that is ONE
hot block: every doc shares the same first PREFIX_W tokens (the
"breaking news update report" class of opening), random tails, ~2%
true truncation pairs injected.

Usage: python scripts/prefix_block_ab.py [--sizes 2000,8000,32000]
"""

from __future__ import annotations

import argparse
import random
import sys
import time

sys.path.insert(0, "/root/repo")

VOCAB = "spark window merge table column vector stream value data small".split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,8000,32000")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from labelmain_spark.functions.dedup import prefix_dup_flags_window, prefix_dups
    from labelmain_spark.session import build_session

    spark = build_session(app_name="prefix_block_ab")
    rows_out = []
    for n in (int(s) for s in args.sizes.split(",")):
        rng = random.Random(42)
        rows = []
        for i in range(n):
            tail = [rng.choice(VOCAB) for _ in range(rng.randint(6, 40))]
            rows.append((i, "breaking news update report " + " ".join(tail)))
            if rng.random() < 0.02:  # truncated re-crawl twin
                half = 4 + len(tail) // 2
                rows.append(
                    (i + 10_000_000,
                     " ".join(("breaking news update report " + " ".join(tail)).split()[:half]))
                )
        aug = spark.createDataFrame(rows, "doc_id long, text string").cache()
        aug.count()
        res = {}
        for name, fn in (("join", prefix_dups), ("window", prefix_dup_flags_window)):
            ts = []
            for _ in range(args.passes):
                t0 = time.time()
                out = fn(aug)
                flagged = out.filter(out.is_prefix_dup == 1).count()
                ts.append(time.time() - t0)
            ts.sort()
            res[name] = (round(ts[len(ts) // 2], 2), flagged)
        aug.unpersist()
        rows_out.append((n, res))
        print(f"# n={n}: join={res['join']} window={res['window']}", file=sys.stderr)

    print("| block size | join s (flagged) | window s (flagged) | join/window |")
    print("|---|---|---|---|")
    for n, res in rows_out:
        j, w = res["join"], res["window"]
        print(f"| {n} | {j[0]} ({j[1]}) | {w[0]} ({w[1]}) | {j[0] / max(w[0], 0.01):.1f}× |")


if __name__ == "__main__":
    main()
