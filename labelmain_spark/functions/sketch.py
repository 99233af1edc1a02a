"""Count-Min sketch as a relational operator (SURVEY §2.11 north-star
"novel sketch" class, next to the built-in HLL/GK forms in
operators/advanced.py).

A CMS is d hash rows × w buckets of counters; point frequency estimate
= min over rows of the addressed counter — never under-estimates,
over-estimates by ≤ εN with ε = e/w at the usual depth. As a DataFrame
op the sketch IS a (seed, bucket, n) table: the groupBy is map-side
combinable, the shuffle carries ≤ d·w rows per partition, and two
sketches merge by adding cells — the mergeability that makes it work as
a distributed partial aggregate at any scale.

Engine-reproducible hashing (re-planned r11): ONE md5(key) per row,
row i's bucket = (hex digits 4i+1..4i+4 of the digest) mod w — the
standard one-digest/d-slices construction (md5's 128 bits are far more
than d·log2(w) = 24 need, and disjoint slices of one strong digest are
the textbook way to derive d hash rows). The r7-r10 form hashed
md5(seed:key) per (row, seed): d full digest computations per row, and
the ×200-events tier showed the ratio vs DuckDB RISING (2.4× → 3.3× →
6.2×) because the wall IS the digest arithmetic — both engines linear,
Spark's md5-over-UTF8String constant ~6× DuckDB's C md5. Measured at
×200 (scripts/events_floor_ab.py): 4 md5/row 5.2 s → 1 md5/row 3.3 s.
Two parity-safe spelling choices per engine: Spark computes the digest
ONCE via a projected column (codegen does NOT common-subexpression a
repeated md5 — respelling it per digit measured 8.9 s) and slices with
``conv(hex4, 16, 10)``; DuckDB re-derives the same integer with the
``instr('0123456789abcdef', c) - 1`` fold (it has no conv), positions
computed from the seed. Same integers, each engine's cheapest path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

CMS_D = 4   # hash rows (depth): P(overestimate > εN) ≤ 2^-d-ish
CMS_W = 64  # buckets per row (width): ε = e/w


def _duck_bucket_expr(seed_col: str, key_col: str) -> str:
    """DuckDB spelling of row ``seed``'s bucket: the instr-fold over
    hex digits 4·seed+1 .. 4·seed+4 of one md5(key) digest (DuckDB has
    no conv; its optimizer CSEs the repeated md5)."""
    m = f"md5(CAST({key_col} AS VARCHAR))"
    digit = f"(instr('0123456789abcdef', substr({m}, 4 * {seed_col} + {{j}} + 1, 1)) - 1)"
    val = " + ".join(
        digit.format(j=j) + f" * {16 ** (3 - j)}" for j in range(4)
    )
    return f"(({val}) % {CMS_W})"


def _spark_bucket_list(key_col: str, d: int) -> list[Column]:
    """Spark spelling: conv() on 4-hex-digit slices of a SHARED digest
    column (caller must have projected ``md5(key)`` as ``key_col`` —
    codegen does not CSE a respelled md5; see the module docstring)."""
    return [
        (F.conv(F.substring(F.col(key_col), 1 + 4 * i, 4), 16, 10)
         .cast("int") % CMS_W)
        for i in range(d)
    ]


def _spark_buckets(key_col: str, d: int) -> Column:
    return F.array(*_spark_bucket_list(key_col, d))


def cms_build(df: DataFrame, key_col: str, d: int = CMS_D) -> DataFrame:
    """Build the (seed, bucket, n) sketch table over a key column:
    one digest per row, posexplode of the d sliced buckets (a 2-int
    explode AFTER the hash — the expensive work is not duplicated),
    map-side-combinable groupBy carrying ≤ d·w rows per partition."""
    digests = df.select(
        F.md5(F.col(key_col).cast("string")).alias("m")
    )
    return (
        digests.select(F.posexplode(_spark_buckets("m", d)).alias("seed", "bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_point_estimate(sketch: DataFrame, key, d: int = CMS_D) -> int:
    """Frequency estimate for one key: min over rows of its cell."""
    spark = sketch.sparkSession
    probe = spark.createDataFrame([(str(key),)], "k string").select(
        F.md5(F.col("k")).alias("m")
    )
    cells = probe.select(
        F.posexplode(_spark_buckets("m", d)).alias("seed", "bucket")
    ).join(sketch, ["seed", "bucket"], "left")
    row = cells.agg(F.min(F.coalesce(F.col("n"), F.lit(0)))).first()
    return int(row[0])


def cms_user_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS over events.user_id — the heavy-hitter pre-filter a label
    pipeline runs before exact per-key work."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    return cms_build(ev, "user_id")


HH_THRESHOLD = 80  # events per key: 1 / 13 / 104 hitters at the three SFs
# Tier boundary: below this many DISTINCT keys the exact groupBy's
# exchange is trivially affordable (map-side combine collapses to one
# partial row per key per partition) and the sketch prefilter is pure
# overhead — measured at ev×400 (40M rows, 600k keys): sketch tier
# 12.3 s vs naive-class agg ~1.6 s. The sketch pays only when the
# DISTINCT-KEY count itself makes the exchange the bottleneck.
HH_SKETCH_MIN_KEYS = 5_000_000


def _hh_exact(ev: DataFrame, key_col: str) -> DataFrame:
    return (
        ev.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.lit(HH_THRESHOLD))
    )


def _hh_sketch_selectivity(cells: list, d: int = CMS_D) -> float:
    """Estimated admit fraction of the min-cell-estimate filter,
    computed FREE from the already-collected cells: a row passes only
    if ALL d of its cells hold ≥ T, and under independent hash rows
    that probability is the product of each row's ≥T cell-mass
    fraction. ≈1.0 means the sketch is SATURATED for this (N, w, T)
    — ε·N ≳ T, every cell looks heavy — and the filter prunes
    nothing."""
    frac = []
    for i in range(d):
        row = [r["n"] for r in cells if r["seed"] == i]
        heavy = sum(1 for n in row if n >= HH_THRESHOLD)
        frac.append(heavy / CMS_W)
    sel = 1.0
    for f in frac:
        sel *= f
    return sel


def _hh_sketch(ev: DataFrame, key_col: str, d: int = CMS_D) -> DataFrame:
    """The sketch-prefiltered tier: build the CMS, inline it as a
    DENSE d·w array literal (cells are dense integers 0..d·w-1, so
    element_at is one O(1) positional access — the first cut used a
    create_map literal, whose GetMapValue is a LINEAR key scan, and
    4 lookups × ~128 expected depth × 40M rows measured 12.3 s at
    ev×400; the same lesson as the unigram map-tier cap), then filter
    rows by the min cell estimate BEFORE the exact count's exchange.
    No false negatives (CMS never under-estimates) → output equals
    the naive form exactly."""
    # bounded collect: exactly d·w ≤ 256 cells regardless of corpus size
    cells = cms_build(ev, key_col).collect()
    if not cells:
        return _hh_exact(ev, key_col).filter(F.lit(False))
    return _hh_sketch_from_cells(ev, key_col, cells, d)


def _hh_sketch_from_cells(
    ev: DataFrame, key_col: str, cells: list, d: int = CMS_D
) -> DataFrame:
    dense = [0] * (d * CMS_W)
    for r in cells:
        dense[r["seed"] * CMS_W + r["bucket"]] = r["n"]
    arr = F.array(*[F.lit(int(c)).cast("long") for c in dense])
    keyed = ev.select(
        key_col, F.md5(F.col(key_col).cast("string")).alias("m")
    )
    est = None
    for i, b in enumerate(_spark_bucket_list("m", d)):
        cell_est = F.element_at(arr, F.lit(i * CMS_W + 1) + b)
        est = cell_est if est is None else F.least(est, cell_est)
    return _hh_exact(
        keyed.filter(est >= F.lit(HH_THRESHOLD)).select(key_col), key_col
    )


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters, sketch-prefiltered where that helps (r11):
    the production pattern the standalone sketch exists for. Because a
    CMS never under-estimates, a min-cell-estimate filter has no
    false negatives, so EITHER tier's output is exactly ``GROUP BY
    key HAVING count ≥ T`` — one trivial full oracle, the sketch only
    ever changes which rows shuffle.

    Tiering (the quality_unigram_nll discipline — pick the plan by
    measured cardinality, never by hope): one cheap pre-scan takes
    approx_count_distinct(key); below HH_SKETCH_MIN_KEYS the naive
    exact groupBy wins outright (its exchange carries ≤ one combined
    partial per key per partition — the ev×400 measurement above) and
    is what ships at every local SF. Past the gate — the 10^9+
    distinct-URL/user regimes where per-key partials ARE the
    bottleneck — the sketch tier prefilters map-side so only
    candidate-key rows reach the exchange. Its d·w = 256-cell literal
    prunes effectively while N ≲ w·T/e (ε = e/w over-admits beyond);
    production sizing raises w ∝ N/T, whose cell table outgrows a
    literal and rides a broadcast join probed from the same digest
    slices — the documented third tier, same ladder as the unigram
    broadcast/shuffle tiers. Past the gate a SECOND guard reads the
    already-collected cells before committing to the filter scan: if
    the estimated admit fraction (`_hh_sketch_selectivity` — the
    product of per-seed ≥T cell-mass fractions) shows the sketch
    SATURATED for this (N, w, T) — ε·N ≳ T, every cell looks heavy —
    the filter would prune nothing, and the tier falls back to naive
    rather than pay the per-row estimate math for free: a mis-sized
    sketch must never make the plan WORSE than not having one. The
    gates cannot affect correctness (every tier is exact); the plan
    test pins the sketch tier's filter-below-exchange shape by
    calling it directly."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    n_keys = ev.agg(F.approx_count_distinct("user_id").alias("k")).first()["k"]
    if n_keys < HH_SKETCH_MIN_KEYS:
        return _hh_exact(ev, "user_id")
    cells = cms_build(ev, "user_id").collect()
    if not cells:
        return _hh_exact(ev, "user_id").filter(F.lit(False))
    if _hh_sketch_selectivity(cells) > 0.5:
        return _hh_exact(ev, "user_id")
    return _hh_sketch_from_cells(ev, "user_id", cells)


QUERIES = {
    "cms_user_sketch": cms_user_sketch,
    "heavy_hitters": heavy_hitters,
}

ORACLE = {
    "cms_user_sketch": f"""
        SELECT seed, {_duck_bucket_expr("seed", "user_id")} AS bucket,
               COUNT(*) AS n
        FROM events CROSS JOIN (SELECT unnest(range({CMS_D})) AS seed)
        GROUP BY seed, {_duck_bucket_expr("seed", "user_id")}
    """,
    # the sketch is a plan accelerator, never a semantics change: the
    # oracle is the naive exact form the CMS candidate filter must
    # reproduce bit-for-bit (no false negatives by construction).
    "heavy_hitters": f"""
        SELECT user_id, COUNT(*) AS n
        FROM events GROUP BY user_id
        HAVING COUNT(*) >= {HH_THRESHOLD}
    """,
}
