"""Hot-digest skew A/B for the duplicate-span family (r9 verdict
item 5).

The r9 fused span map finishes with a per-digest WINDOW
(count / count+row_number over ``partitionBy(gram_md5)``) — 3.5×
faster than the r5-r8 agg+join-back plan on the Zipf fixtures, but a
window shuffles EVERY occurrence of a digest into one task and AQE's
skew splitting applies to joins, not windows. On a real crawl the
hottest boilerplate span occurs 1e6-1e8 times → a one-task sort. The
alternative (``_duplicate_spans_agg`` / ``_remove_duplicate_spans_agg``
in functions/substrings.py) computes n_occ and the global-first
occurrence as MAP-SIDE-COMBINABLE partial aggregates
(count, min(struct(doc_id, pos))) and re-attaches them with a
size-gated JOIN — skew-splittable by AQE.

This script builds a hot-digest fixture the Zipf generators never
produce — the scale_crossover ×N corpus PLUS identical-single-token
docs sized so ONE gram_md5 holds ~40% of all span positions (the
boilerplate-padding shape) — and times both plans on both keys
(3-pass medians, noop-sink write). Row-count parity between the plans
is asserted on the first pass. Correctness parity at small scale is
pinned in tests/test_skew.py.

Usage: python scripts/span_skew_ab.py [--scale 20] [--passes 3]
Prints one markdown table + one JSON line; verdict recorded at the
code site (substrings.py docstrings) and PERF.md.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_crossover import gen_fixture  # noqa: E402

OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale_fixtures"
)
HOT_TOK = "boilerplate"
HOT_DOC_TOKENS = 131  # 100 spans per hot doc at L=32


def gen_hot_fixture(scale: int, hot_share: float) -> str:
    """scale_crossover ×scale documents + enough identical-token docs
    that one digest is ~hot_share of all span positions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from labelmain_spark.functions.substrings import DUP_SPAN_L as L

    out_dir = os.path.join(OUT_ROOT, f"span_skew_x{scale}_h{int(hot_share * 100)}")
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    base_dir = gen_fixture(scale)
    base = pq.read_table(os.path.join(base_dir, "documents.parquet"))
    texts = [t.as_py() for t in base.column("text")]
    n_base_spans = sum(max(0, t.count(" ") + 1 - L + 1) for t in texts)

    spans_per_hot = HOT_DOC_TOKENS - L + 1
    # hot / (hot + base) = HOT_SHARE
    n_hot_docs = round(hot_share * n_base_spans / (1 - hot_share) / spans_per_hot)
    hot_text = " ".join([HOT_TOK] * HOT_DOC_TOKENS)
    n0 = len(texts)
    hot = pa.table(
        {
            "doc_id": pa.array(range(n0, n0 + n_hot_docs), pa.int64()),
            "text": pa.array([hot_text] * n_hot_docs, pa.string()),
            "lang": pa.array(["en"] * n_hot_docs, pa.string()),
            "source": pa.array(["srchot"] * n_hot_docs, pa.string()),
            "n_chars": pa.array([len(hot_text)] * n_hot_docs, pa.int64()),
        }
    )
    tbl = pa.concat_tables([base.select(hot.column_names), hot])
    pq.write_table(tbl, out, row_group_size=16384)
    print(
        f"# fixture: {n0} base docs ({n_base_spans} spans) + {n_hot_docs} hot docs "
        f"({n_hot_docs * spans_per_hot} spans, one digest, "
        f"{n_hot_docs * spans_per_hot / (n_base_spans + n_hot_docs * spans_per_hot):.0%} share)",
        file=sys.stderr,
    )
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--hot-share", type=float, default=0.40)
    args = ap.parse_args()

    from labelmain_spark.functions import substrings as ss
    from labelmain_spark.session import build_session

    fixture = gen_hot_fixture(args.scale, args.hot_share)
    spark = build_session(app_name="span_skew_ab")
    spark.read.parquet(os.path.join(fixture, "documents.parquet")).count()

    plans = {
        "duplicate_spans/window": ss.duplicate_spans,
        "duplicate_spans/agg": ss._duplicate_spans_agg,
        "remove_duplicate_spans/window": ss.remove_duplicate_spans,
        "remove_duplicate_spans/agg": ss._remove_duplicate_spans_agg,
    }
    # row-count parity between the plans, untimed (also warms codegen
    # so pass-1 JIT doesn't land inside one plan's median)
    counts = {name: fn(spark, fixture).count() for name, fn in plans.items()}
    for key in ("duplicate_spans", "remove_duplicate_spans"):
        assert counts[f"{key}/window"] == counts[f"{key}/agg"], (
            key,
            counts[f"{key}/window"],
            counts[f"{key}/agg"],
        )

    out: dict[str, float] = {}
    for name, fn in plans.items():
        ts = []
        for _ in range(args.passes):
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, fixture).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = statistics.median(ts)
        print(f"# {name}: {out[name]} s (passes {ts})", file=sys.stderr)

    print("| key | window s | agg+join s | agg/window |")
    print("|---|---|---|---|")
    for key in ("duplicate_spans", "remove_duplicate_spans"):
        w, a = out[f"{key}/window"], out[f"{key}/agg"]
        print(f"| {key} x{args.scale} hot {args.hot_share:.0%} | {w} | {a} | {a / w:.2f}x |")
    print(json.dumps({"scale": args.scale, "hot_share": args.hot_share, "times": out, "rows": counts}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
