"""Seeded sweep of the sign-LSH OR-construction (tables × bits) on the
fixture corpora — the r5 verdict item 3 decision artifact.

Question: does ANY (T, B) lift `ann_lsh_topk`'s recall floor to ≥ 0.8
at ≤ 50% scan on the fixture?  Method: for each config and three plane
seeds, compute every corpus signature in numpy (bit-identical sign
semantics to the Spark plan), take candidates = any-table collision
with the query, and score recall of the true rounded-cosine top-10
plus scanned fraction.

Answer (run 2026-08-14, sf0.001 + sf0.01): NO. Best floors across
seeds: T=12,B=4 holds recall 0.8 but scans 0.47-0.59; T=10,B=4 scans
0.42-0.51 but floors at 0.7; every deeper-bits config (B=5,6) floors
at 0.3-0.6 below 50%% scan.  This matches theory: the fixture's true
top-10 sit at cos ≈ 0.33-0.4 against a background of random gaussians
(p_collide/bit ≈ 0.61 vs 0.5 — an LSH gap too small for single-probe
OR-construction to separate).  Resolution: `ann_lsh_topk` is DEMOTED
to a labeled didactic baseline; `ann_multiprobe_topk` (flip-confidence
probing, recall ≥ 0.9 on planted near-dup neighbors at the production
operating point) is the family's named ANN path — see COVERAGE.md and
the docstrings in functions/vectors.py.

Usage: python scripts/lsh_sweep.py
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

CONFIGS = [
    (8, 4), (10, 4), (12, 4), (16, 4), (8, 3),
    (12, 5), (16, 5), (20, 5), (24, 5),
    (16, 6), (24, 6), (32, 6),
]
SEEDS = [7, 17, 27]
QUERY = 0
TOP_K = 10


def load(sf: str):
    t = pq.read_table(
        f"/root/testdata/{sf}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.array(t["vec_id"].to_pylist())
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, V


def brute_top10(ids, V):
    q = V[ids == QUERY][0]
    mask = ids != QUERY
    cos = (V[mask] @ q) / (np.linalg.norm(V[mask], axis=1) * np.linalg.norm(q))
    r = np.floor(cos * 1e4 + 0.5) / 1e4
    order = np.lexsort((ids[mask], -r))[:TOP_K]
    return set(ids[mask][order])


def main() -> None:
    for sf in ["sf0.001", "sf0.01"]:
        ids, V = load(sf)
        truth = brute_top10(ids, V)
        q = V[ids == QUERY][0]
        mask = ids != QUERY
        C, cids = V[mask], ids[mask]
        print(f"== {sf} n={len(ids)}")
        for T, B in CONFIGS:
            recalls, scans = [], []
            for seed in SEEDS:
                rng = np.random.RandomState(seed)
                planes = rng.standard_normal((T, B, 64))
                sigC = (
                    (np.einsum("tbd,nd->ntb", planes, C) >= 0) << np.arange(B)
                ).sum(axis=2)
                sigQ = ((np.einsum("tbd,d->tb", planes, q) >= 0) << np.arange(B)).sum(
                    axis=1
                )
                coll = (sigC == sigQ).any(axis=1)
                scans.append(float(coll.mean()))
                recalls.append(len(set(cids[coll]) & truth) / TOP_K)
            print(
                f"T={T} B={B} recall={[round(r, 2) for r in recalls]} "
                f"scan={[round(s, 2) for s in scans]}"
            )


if __name__ == "__main__":
    main()
