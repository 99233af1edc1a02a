"""Tier-1 (create_map literal) vs tier-2 (broadcast join) A/B for
quality_unigram_nll as a function of VOCABULARY SIZE (r10 self-review:
Spark's GetMapValue on a map literal is a LINEAR key scan — no hash —
so the per-token cost of the 'no-join' tier grows with |V|, and the
×400 fixture's 30-word vocab never exercised that axis. This script
sets UNIGRAM_MAPLIT_MAX_TERMS where the measurement says the tiers
cross, not where the collect-size bound happens to sit).

Fixture: N_DOCS docs × TOKS_PER_DOC uniform-random tokens over V
distinct words (uniform = worst case for the scan: expected match
depth |V|/2 with no Zipf head to amortize). Both tiers run the SAME
key; the tier is forced through the module constant.

Usage: python scripts/unigram_tier_ab.py [--vocabs 30,1000,4000,10000]
"""

from __future__ import annotations

import argparse
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_fixtures"
)
N_DOCS = 60_000
TOKS_PER_DOC = 100


def gen_fixture(vocab: int) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # corpus shape is part of the cache key: a rerun after changing
    # N_DOCS/TOKS_PER_DOC must regenerate, not silently reuse the old
    # corpus (this table feeds the shipped UNIGRAM_MAPLIT_MAX_TERMS)
    out_dir = os.path.join(OUT_ROOT, f"vocab{vocab}_{N_DOCS}x{TOKS_PER_DOC}")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(77 + vocab)
    words = [f"w{i:05d}" for i in range(vocab)]
    texts = [
        " ".join(rng.choice(words) for _ in range(TOKS_PER_DOC))
        for _ in range(N_DOCS)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(N_DOCS), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * N_DOCS, pa.string()),
                "source": pa.array(["src0"] * N_DOCS, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        out,
        row_group_size=4096,
    )
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocabs", default="30,1000,4000,10000")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    import labelmain_spark.functions.text as T
    from labelmain_spark.session import build_session

    spark = build_session(app_name="unigram_tier_ab")
    rows = []
    for v in [int(x) for x in args.vocabs.split(",")]:
        sf_dir = gen_fixture(v)
        cell = {}
        for cap, label in [(10**9, "tier1_maplit"), (0, "tier2_join")]:
            orig = T.UNIGRAM_MAPLIT_MAX_TERMS
            T.UNIGRAM_MAPLIT_MAX_TERMS = cap
            try:
                ts = []
                for _ in range(args.passes):
                    spark.catalog.clearCache()
                    t0 = time.time()
                    T.quality_unigram_nll(spark, sf_dir).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    ts.append(round(time.time() - t0, 2))
                cell[label] = min(ts)
            finally:
                T.UNIGRAM_MAPLIT_MAX_TERMS = orig
            print(f"# vocab={v} {label}: {ts}", file=sys.stderr, flush=True)
        rows.append((v, cell))
    print("| vocab | tier1 (map literal) | tier2 (broadcast join) |")
    print("|---|---|---|")
    for v, cell in rows:
        print(f"| {v} | {cell['tier1_maplit']} s | {cell['tier2_join']} s |")
    spark.stop()


if __name__ == "__main__":
    main()
