"""Vector / embedding operators (SURVEY.md §2.11 north-star):
brute-force cosine top-k, LSH-bucketed ANN, centroid aggregation,
embedding-cosine near-dup.

Scale design:

- Brute-force top-k against one query vector is a narrow map + TakeOrdered
  — it scales fine (one pass, no shuffle) and is the correctness
  baseline every ANN variant is scored against.
- The ANN paths: `ann_multiprobe_topk` (named path — flip-confidence
  bucket probing) and `ann_ivf_topk` (sample-fitted coarse quantizer)
  prune the scan to probed buckets/cells — at 100 TB, partition
  pruning when the store is laid out by bucket — at a recall cost
  measured against the brute-force baseline in tests. `ann_pq_topk`
  (r7) is the orthogonal axis: product quantization shrinks the
  per-vector payload 32× so the query-time scan reads codes, not
  floats; IVF × PQ compose into IVF-ADC at real scale. `ann_lsh_topk`
  is the didactic single-probe OR-construction baseline (demoted r6,
  scripts/lsh_sweep.py).
- All dot products run on DOUBLE arrays with `zip_with` +
  `aggregate` — JVM-side, sequential fold, engine-reproducible (the
  DuckDB twin uses list_dot_product over the same doubles).
- Centroids: posexplode to (label, dim, component) and aggregate
  exactly — long format, no nested output, shuffle keyed on
  (label, dim) which is perfectly uniform.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import (
    DEC,
    micro_units,
    sql_micro_units,
    sql_stable_round,
    stable_round,
)
from labelmain_spark.sources.readers import (
    broadcast_if_bounded,
    load_table,
    table_row_count,
)

QUERY_VEC_ID = 0
TOP_K = 10


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k neighbors of the query vector
    (vec_id=0), deterministic rank on (rounded cosine desc, vec_id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("q")
    )
    scored = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(TOP_K)


def _micro_mean_partials(e: DataFrame, group_cols: list[str]) -> DataFrame:
    """Two-level exact mean over exploded embedding elements (the
    late-r11 micro-unit discipline, operators/parity.py::micro_units):
    long fixed-point sums per (group…, partition) on the scan side —
    per-partition bound ~1.2e11 micro at |x| ≤ 6 gaussian floats, 7
    orders of headroom — decimal only across the partial rows."""
    return e.groupBy(
        *group_cols, F.spark_partition_id().alias("_pid")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(micro_units(F.col("x"))).alias("mx"),
    )


def _micro_mean(df: DataFrame, group_cols: list[str], out: str, ndp: int) -> DataFrame:
    total = F.sum(F.col("mx").cast(DEC)).cast("double") / F.lit(1e6)
    return df.groupBy(*group_cols).agg(
        F.sum("_n").alias("_n_total"),
        total.alias("_total"),
    ).select(
        *group_cols,
        F.col("_n_total"),
        stable_round(F.col("_total") / F.col("_n_total"), ndp).alias(out),
    )


def _sql_micro_mean(expr: str, ndp: int) -> str:
    """DuckDB twin of the two-level mean: BIGINT sums accumulate in
    128 bits, so one level suffices; the op order (exact integer →
    double → /1e6 → /count → stable round) matches Spark's."""
    s = float(10**ndp)
    return (
        f"(FLOOR(((CAST(SUM({sql_micro_units(expr)}) AS DOUBLE) / 1000000.0)"
        f" / COUNT(*)) * {s} + 0.5) / {s})"
    )


def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long format: (label, dim, exact mean) —
    micro-unit two-level means (see _micro_mean_partials)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    return _micro_mean(
        _micro_mean_partials(e, ["label", "dim"]), ["label", "dim"], "centroid", 6
    ).drop("_n_total")


def _sampling_hash_bp_sql(key_col: str, salt: str) -> str:
    """DuckDB spelling of the sampling-family hash split (the oracle
    twin of the salted predicates embedding_drift builds in Spark)."""
    from labelmain_spark.functions.sampling import _hash_bp_expr

    return _hash_bp_expr(key_col, "duck", salt=salt)


DRIFT_MUT_DIMS = 8     # the fixture perturbation hits dims 0..7 only
DRIFT_MUT_SHIFT = 0.5  # +shift on those dims for the revised 5%
DRIFT_EPS = 0.015      # |Δmean| at/above which a dimension is flagged


def embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-DIMENSION mean drift between two corpus snapshots — the
    embedding-QA table a pipeline checks before mixing a re-embedded
    or re-crawled batch into an existing index: an embedding-model
    version bump or an ingest-distribution shift shows up as a
    localized per-dimension mean shift long before recall@k degrades.
    Output: (dim, prev_n, cur_n, prev_mean, cur_mean, delta,
    drift_flag) for all 64 dimensions.

    Snapshot convention shared with the corpus_delta family
    (dedup.delta_snapshots' salts, on vec_id): overlapping 90% hash
    snapshots, and — mirroring its 5% text revision — the CURRENT
    snapshot of the mut-salt 5% of vectors carries a deterministic
    +DRIFT_MUT_SHIFT on dims < DRIFT_MUT_DIMS (the "model swapped its
    first block" story), so the flag column discriminates on real
    rows in BOTH engines: dims 0-7 flag, dims 8-63 do not (margins
    measured ≥3× against subset noise at every SF; pinned in pytest —
    the set-op de-degeneracy lesson applied at birth).

    Scale shape: ONE posexplode of the vector column → two filtered
    algebraic aggs keyed by dim (map-side partials; exactly 64 rows
    per partition reach each exchange) → a 64-row full-outer merge.
    Sums are exact two-level micro-unit longs (_micro_mean_partials —
    the late-r11 fixed-point discipline; per-partition bound has 7
    orders of headroom), means stable_round(6)ed BEFORE the delta
    subtraction so both engines difference identical doubles; the
    flag compares that deterministic delta against DRIFT_EPS."""
    from labelmain_spark.functions.sampling import _hash_bp_expr

    emb = load_table(spark, sf_dir, "embeddings")
    in_prev = F.expr(_hash_bp_expr("vec_id", "spark", salt="snapA:")) < 9000
    in_cur = F.expr(_hash_bp_expr("vec_id", "spark", salt="snapB:")) < 9000
    revised = F.expr(_hash_bp_expr("vec_id", "spark", salt="mut:")) < 500
    e = emb.select(
        "vec_id",
        revised.alias("rev"),
        in_prev.alias("in_prev"),
        in_cur.alias("in_cur"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    cur_x = F.when(
        F.col("rev") & (F.col("dim") < DRIFT_MUT_DIMS),
        F.col("x") + F.lit(DRIFT_MUT_SHIFT),
    ).otherwise(F.col("x"))
    prev = _micro_mean(
        _micro_mean_partials(e.filter("in_prev"), ["dim"]),
        ["dim"],
        "prev_mean",
        6,
    ).withColumnRenamed("_n_total", "prev_n")
    cur = _micro_mean(
        _micro_mean_partials(
            e.filter("in_cur").select("dim", cur_x.alias("x")), ["dim"]
        ),
        ["dim"],
        "cur_mean",
        6,
    ).withColumnRenamed("_n_total", "cur_n")
    delta = stable_round(F.col("cur_mean") - F.col("prev_mean"), 6)
    return prev.join(cur, "dim", "full_outer").select(
        "dim",
        "prev_n",
        "cur_n",
        "prev_mean",
        "cur_mean",
        delta.alias("delta"),
        (F.abs(delta) >= F.lit(DRIFT_EPS)).cast("int").alias("drift_flag"),
    )


NEARDUP_R = 2  # bits per band
NEARDUP_BANDS = 24  # bands; r·b = 48 sign planes


def _neardup_planes() -> list[list[float]]:
    """48 independent gaussian hyperplanes, seeded — frozen at import
    and inlined as literals into BOTH the Spark plan and the DuckDB
    oracle, so the two engines share bit-identical planes. (Every LSH
    family in this module now draws seeded gaussian planes; the old
    `_plane` LCG — whose consecutive planes differed by 12345/2³¹ per
    component, nearly parallel, one effective band — is gone, r4
    verdict item 5.)"""
    import numpy as np

    rng = np.random.RandomState(42)
    return [[float(x) for x in row] for row in rng.standard_normal((NEARDUP_R * NEARDUP_BANDS, 64))]


_NEARDUP_PLANES = _neardup_planes()


def _sql_double(x: float) -> str:
    """Literal that DuckDB parses as DOUBLE via strtod (E-notation),
    never as DECIMAL — decimal-parse-then-cast can differ in the last
    ulp from Python's repr round-trip."""
    r = repr(x)
    return r if "e" in r or "E" in r else r + "e0"


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a label block via
    LSH-banded candidate generation + exact-cosine verification — the
    r2 label-blocked all-pairs join is gone (at 100 TB one label block
    was a straggler doing O(B²) work).

    Shape (the `dedup_minhash` band machinery applied to sign
    signatures):
      1. 48-bit random-hyperplane sign signature per vector (seeded
         gaussian planes, frozen at import, shared verbatim with the
         oracle), split into NEARDUP_BANDS=24 bands of NEARDUP_R=2
         bits.
      2. Explode to (label, band_id, band_val) and self-join — only
         vectors agreeing on ≥1 band within a label ever meet. The
         shuffle carries ids + a 24-int band array, never the vectors.
      3. Emit each candidate pair once WITHOUT a distinct shuffle: keep
         only the join row whose band_id is the FIRST agreeing band
         (both sides carry their band arrays; the filter is pure CPU in
         the join stage).
      4. Verify candidates with exact cosine via two scalar-key hash
         joins back to the vectors (ids shuffle; vectors join once,
         never pairwise).

    Parameters sit on the S-curve for the fixture's deliberately-low
    threshold (max within-label cos ≈ 0.47, so 0.4 keeps the result
    non-empty): r=2, b=24 → a pair at cos 0.4 shares a band with
    p = 1-(1-0.631²)²⁴ ≈ 1-5e-6, i.e. recall 1.0 on the fixture
    (asserted against the exact all-pairs result in tests). At a
    production near-dup threshold (~0.95) the same plan runs r=8, b=16,
    where the band join prunes ~94% of random pairs at 99.99% recall;
    at the fixture threshold banding admits most pairs — the *plan
    shape* is what scales, and the oracle mirrors the banded semantics
    exactly so correctness never depends on the S-curve.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    n_part = spark.sparkContext.defaultParallelism
    # Repartition the raw vectors FIRST: the signature work is CPU-bound
    # and the fixture arrives as one file split (one task otherwise); on
    # a real cluster the exchange keys the layout by vec_id for the
    # verify joins.
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).repartition(n_part, F.col("vec_id"))

    # The 48 planes ride in as ONE nested-array Literal node — inlining
    # them as 3072 scalar literals (the r2-style unrolled loop) blew the
    # serialized plan to 16 MiB task binaries and ~45 s of pure
    # plan/codegen overhead. Each band value computes its two plane dots
    # INLINE (element_at into the literal) rather than via a shared
    # `bits` array column: once a downstream Generate enters the plan,
    # CollapseProject inlines such an intermediate array into all 48
    # element_at references — a measured 48× recompute of the plane
    # dots (24 s for 2000 rows). Inline dots are evaluated exactly once
    # per band element by construction: 0.7 s for the same input.
    planes_lit = F.lit(_NEARDUP_PLANES)

    def _band_val(j: Column) -> Column:
        b0 = F.when(
            _dot(F.col("v"), F.element_at(planes_lit, j * NEARDUP_R + 1)) >= 0, 1
        ).otherwise(0)
        b1 = F.when(
            _dot(F.col("v"), F.element_at(planes_lit, j * NEARDUP_R + 2)) >= 0, 1
        ).otherwise(0)
        return (b0 + b1 * 2).cast("int")

    barr = F.transform(F.sequence(F.lit(0), F.lit(NEARDUP_BANDS - 1)), _band_val)
    sigs = e.select("vec_id", "label", barr.alias("barr"))

    bands = sigs.select(
        "vec_id", "label", "barr", F.posexplode("barr").alias("band_id", "band_val")
    )
    a = bands.select(
        F.col("vec_id").alias("vec_a"),
        "label",
        F.col("barr").alias("barr_a"),
        "band_id",
        "band_val",
    )
    b = bands.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("label_b"),
        F.col("barr").alias("barr_b"),
        F.col("band_id").alias("band_id_b"),
        F.col("band_val").alias("band_val_b"),
    )
    first_agree = F.element_at(
        F.filter(
            F.sequence(F.lit(1), F.lit(NEARDUP_BANDS)),
            lambda j: F.element_at(F.col("barr_a"), j) == F.element_at(F.col("barr_b"), j),
        ),
        1,
    )
    cands = (
        a.join(
            b,
            (F.col("label") == F.col("label_b"))
            & (F.col("band_id") == F.col("band_id_b"))
            & (F.col("band_val") == F.col("band_val_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .filter(first_agree == F.col("band_id") + 1)
        .select("vec_a", "vec_b", "label")
    )

    va = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    vb = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    cos = stable_round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", "label", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
    )


ANN_LSH_TABLES = 8
ANN_LSH_BITS = 4


def _lsh_table_planes() -> list[list[list[float]]]:
    """TABLES × BITS seeded gaussian hyperplanes — the standard
    E2LSH-style OR-construction (many short independent hash tables;
    a neighbor is a candidate if it collides in ANY table). Own seed,
    independent of the near-dup band planes and the multiprobe table.
    Parameters tuned on the fixture corpus (random 64-d vectors, true
    top-10 at cos ≈ 0.33): 8 tables × 4 bits measures recall 0.6-0.9
    at sf0.001/sf0.01 while pruning ~60% of candidates; a single
    longer signature (the r1-r4 shape) cannot hold recall on random
    vectors at single-probe — that finding replaced the old
    correlated-LCG-plane baseline rather than re-seeding it."""
    import numpy as np

    rng = np.random.RandomState(7)
    return [
        [[float(x) for x in row] for row in rng.standard_normal((ANN_LSH_BITS, 64))]
        for _ in range(ANN_LSH_TABLES)
    ]


_ANN_LSH_PLANES = _lsh_table_planes()


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIDACTIC BASELINE (demoted r6 — see scripts/lsh_sweep.py): the
    textbook multi-table random-hyperplane OR-construction — each
    vector gets ANN_LSH_TABLES independent ANN_LSH_BITS-bit sign
    signatures; candidates are vectors colliding with the query in at
    least one table; exact cosine + top-k within the candidate set.
    Recall vs brute force is measured in tests.

    Why demoted: the r6 seeded sweep (12 configs × 3 seeds on the
    fixture corpora) found NO (tables, bits) with a recall floor
    ≥ 0.8 at ≤ 50% scan — the fixture's true neighbors sit at
    cos ≈ 0.33-0.4 over random gaussians, a per-bit collision gap
    (0.61 vs 0.5) single-probe OR-construction cannot separate at
    bounded scan, matching LSH theory. The family's NAMED ANN paths
    are `ann_multiprobe_topk` (flip-confidence probing; recall ≥ 0.9
    on planted near-dup neighbors, the production operating point)
    and `ann_ivf_topk` (sample-fitted coarse quantizer). This key
    stays registered as the didactic single-probe reference the
    probing variants are measured against.

    Scale shape: signatures are a narrow JVM map (fixed literal
    planes); the single broadcast query makes the candidate test a
    map-side filter (any-table signature equality via zip_with — no
    shuffle, no explode), and TakeOrdered keeps the top-k a heap. For
    a query SET, the same signatures become an equi-join key on
    (table_id, sig) — `ann_multiprobe_topk` shows the probing variant,
    `ann_ivf_topk` the centroid-partitioned one."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))

    def signatures(v: Column) -> Column:
        sigs = []
        for planes in _ANN_LSH_PLANES:
            sig = F.lit(0).cast("long")
            for p, plane_vals in enumerate(planes):
                plane = F.array(*[F.lit(x) for x in plane_vals])
                bit = F.when(_dot(v, plane) >= 0, F.lit(1).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
                sig = sig.bitwiseOR(F.shiftleft(bit, p))
            sigs.append(sig)
        return F.array(*sigs)

    sigd = e.select("vec_id", "v", signatures(F.col("v")).alias("sigs"))
    q = sigd.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("q"), F.col("sigs").alias("qsigs")
    )
    collides = F.exists(
        F.zip_with(F.col("sigs"), F.col("qsigs"), lambda a, b: a == b),
        lambda x: x,
    )
    return (
        sigd.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .filter(collides)
        .select("vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def _sql_ann_lsh() -> str:
    """DuckDB twin of `ann_lsh_topk` (r8 — the multiprobe oracle
    precedent applied to the didactic baseline; its old 'impractical
    to inline' justification stopped being true the moment
    `_sql_ann_multiprobe` inlined plane literals): per-table 4-bit
    sign signatures over the 32 inlined hyperplanes, candidate = the
    row's signature equals the query's in ANY table, exact
    rounded-cosine top-k rerank."""
    tables = [
        ["[" + ", ".join(_sql_double(w) for w in row) + "]" for row in planes]
        for planes in _ANN_LSH_PLANES
    ]

    def sig(src: str, t: list[str]) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN list_dot_product({src}, {p}) >= 0 THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(t)
        ) + ")"

    collide = " OR ".join(f"{sig('v', t)} = {sig('qv', t)}" for t in tables)
    cos = sql_stable_round(
        "(list_dot_product(v, qv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))))",
        4,
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), q AS (
            SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}
        )
        SELECT vec_id, {cos} AS cos_sim
        FROM e CROSS JOIN q
        WHERE vec_id <> {QUERY_VEC_ID} AND ({collide})
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
    """


ANN_MP_BITS = 6
ANN_MP_PROBES = 8


def _mp_planes() -> list[list[float]]:
    """6 seeded gaussian hyperplanes for the multi-probe table (own
    seed — independent of the near-dup band planes)."""
    import numpy as np

    rng = np.random.RandomState(11)
    return [[float(x) for x in row] for row in rng.standard_normal((ANN_MP_BITS, 64))]


_ANN_MP_PLANES = _mp_planes()


def _mp_probe_buckets(qv: list[float], n_probes: int) -> list[int]:
    """Multi-probe sequence (Lv et al., VLDB'07): a true neighbor that
    misses the query's bucket most likely flipped the SIGNS the query
    was least confident about, so probe buckets in order of summed
    flip penalty Σ|q·plane| over the flipped bits. Pure driver-side
    arithmetic on one query vector — O(2^bits) tiny."""
    import itertools

    qd = [sum(w * x for w, x in zip(p, qv)) for p in _ANN_MP_PLANES]
    qsig = [1 if d >= 0 else 0 for d in qd]
    scored = sorted(
        (sum(abs(qd[c]) for c in combo), combo)
        for r in range(ANN_MP_BITS + 1)
        for combo in itertools.combinations(range(ANN_MP_BITS), r)
    )
    out = []
    for _, combo in scored[:n_probes]:
        s = list(qsig)
        for c in combo:
            s[c] ^= 1
        out.append(sum(b << i for i, b in enumerate(s)))
    return out


def _mp_sig() -> Column:
    """6-bit sign signature of column `v` against the probe planes."""
    planes_lit = F.lit(_ANN_MP_PLANES)
    sig = F.lit(0)
    for p in range(ANN_MP_BITS):
        bit = F.when(_dot(F.col("v"), F.element_at(planes_lit, p + 1)) >= 0, 1).otherwise(0)
        sig = sig + bit * (1 << p)
    return sig


def _ann_multiprobe(e: DataFrame, n_probes: int = ANN_MP_PROBES) -> DataFrame:
    """Core multi-probe ANN over e(vec_id, v): probe the `n_probes`
    most promising of the 2^6 sign buckets, exact cosine inside them.

    Scale shape: one narrow scan computing a 6-dot signature, a literal
    IN-list filter (pushes into the scan; with the corpus stored
    partitioned by bucket it becomes partition pruning), then
    exact-cosine TakeOrdered on the survivors — expected scan fraction
    ≈ n_probes/2^bits on separable data. The fixture embeddings are
    near-random (true top-10 at cos ≈ 0.4 vs background 0), where NO
    sign-LSH parameterization reaches recall 0.9 below ~50% scan — the
    numpy study in tests/test_properties.py pins what IS true: strictly
    better recall than the single-bucket probe at bounded extra scan,
    and recall ≥ 0.9 on planted true near-neighbors (cos ≈ 0.99), the
    production near-dup operating point."""
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").first()
    if q_row is None or q_row[0] is None:
        # Empty corpus / absent query vector: a valid empty top-k, not
        # a driver crash (the empty-partition contract every key holds
        # — tests/test_empty_inputs.py).
        return (
            e.select(
                "vec_id", F.lit(0.0).alias("cos_sim")
            ).filter(F.lit(False))
        )
    probes = _mp_probe_buckets(list(q_row[0]), n_probes)
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("q"))
    return (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("_sig", _mp_sig())
        .filter(F.col("_sig").isin(probes))
        .crossJoin(F.broadcast(q))
        .select("vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def ann_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe variant of `ann_lsh_topk`: same single hash table,
    recall lifted by probing the Hamming-near buckets ranked by flip
    confidence instead of growing tables or bits.

    Full oracle (r8, verdict item 2 — the semantic_dedup precedent):
    the fitted constants here are the SIX seeded hyperplanes, frozen
    at import, so `_sql_ann_multiprobe()` inlines them as DuckDB list
    literals and re-derives the ENTIRE decision procedure in SQL —
    per-plane query dots, the 64-mask flip-penalty ranking (left-to-
    right float adds with +0.0 identity, bit-exact with the driver's
    sequential `sum`; Python's (penalty, combo) tuple tie-break maps
    to ORDER BY penalty, combo-list lexicographic), XOR probe buckets,
    signature membership, exact rounded-cosine rerank. The 'rows-only
    by nature' objection the r7 window slot burned on is gone."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return _ann_multiprobe(e)


def _sql_ann_multiprobe() -> str:
    """DuckDB twin of `ann_multiprobe_topk` with the fitted plane
    literals inlined (semantic_dedup's `_sql_sem_cos` pattern).

    Exactness argument, term by term:
    - plane dots: `list_dot_product` is a sequential fold over the
      same doubles as the JVM `aggregate` fold and the driver's
      Python `sum` (module-header parity note).
    - penalty(mask): Spark's driver computes sum(abs(qd[c])) over set
      bits ascending; the SQL unrolls an explicit left-to-right chain
      with 0e0 for unset bits — IEEE +0.0 is an exact identity, so
      the float is bit-identical.
    - tie-break: Python sorts (penalty, combo-tuple); combo tuples
      compare lexicographically with shorter-prefix-first, exactly
      DuckDB's list comparison on the set-bit list.
    - bucket: flipping the combo bits of qsig IS qsig XOR mask.
    """
    planes = [
        "[" + ", ".join(_sql_double(w) for w in row) + "]" for row in _ANN_MP_PLANES
    ]
    d_cols = ",\n               ".join(
        f"list_dot_product(qv, {p}) AS d{i}" for i, p in enumerate(planes)
    )
    penalty = "\n             + ".join(
        f"(CASE WHEN (t.m >> {i}) & 1 = 1 THEN abs(d{i}) ELSE 0e0 END)"
        for i in range(ANN_MP_BITS)
    )
    qsig = "\n             + ".join(
        f"(CASE WHEN d{i} >= 0 THEN {1 << i} ELSE 0 END)" for i in range(ANN_MP_BITS)
    )
    bit_list = "[" + ", ".join(str(i) for i in range(ANN_MP_BITS)) + "]"
    row_sig = "\n                 + ".join(
        f"(CASE WHEN list_dot_product(v, {p}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos = sql_stable_round(
        "(list_dot_product(v, qv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))))",
        4,
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), q AS (
            SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}
        ), qd AS (
            SELECT qv,
               {d_cols}
            FROM q
        ), pen AS (
            SELECT t.m,
               {penalty} AS penalty,
               list_filter({bit_list}, p -> ((t.m >> p) & 1) = 1) AS combo,
               {qsig} AS qsig
            FROM range(0, {1 << ANN_MP_BITS}) t(m) CROSS JOIN qd
        ), probes AS (
            SELECT xor(CAST(m AS BIGINT), CAST(qsig AS BIGINT)) AS bucket
            FROM pen ORDER BY penalty ASC, combo ASC LIMIT {ANN_MP_PROBES}
        )
        SELECT vec_id, {cos} AS cos_sim
        FROM e CROSS JOIN q
        WHERE vec_id <> {QUERY_VEC_ID}
          AND CAST(({row_sig}) AS BIGINT) IN (SELECT bucket FROM probes)
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
    """


IVF_K = 16  # coarse-quantizer cells; ~sqrt(N) at real scale
IVF_NPROBE = 4


def _ivf_fit_assign(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, list[int], DataFrame, list[list[float]]]:
    """The IVF quantizer pipeline over the embeddings table — see
    `_ivf_fit_assign_df` for the corpus-generic core."""
    emb = load_table(spark, sf_dir, "embeddings")
    return _ivf_fit_assign_df(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    )


def _ivf_fit_assign_df(
    edf: DataFrame,
) -> tuple[DataFrame, list[int], DataFrame, list[list[float]]]:
    """The IVF quantizer pipeline shared by `ann_ivf_topk` (in-memory
    probe), the cell-partitioned store path (`write_ivf_store` /
    `probe_ivf_store`), and the IVF-ADC composition (`ann_ivf_pq_topk`):
    sampled spherical-k-means fit, narrow cell assignment, query-side
    probe-cell selection over an arbitrary (vec_id, v) corpus. Returns
    (assigned(vec_id, v, cell), probe_cells, q(one row: q),
    centroids) — the centroid list IS the frozen quantizer, persisted
    by `write_ivf_store` so later batches upsert consistently."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # L2-normalize before clustering: on unit vectors, L2 k-means is
    # spherical k-means, so cell assignment agrees with the cosine
    # metric the probe ranks by (unnormalized cells cut across cosine
    # neighborhoods; recall@10 with nprobe=4: 1.0 at sf0.001, 0.6 at
    # sf0.01 on the near-random fixture vectors).
    e = edf.withColumn(
        "fv", array_to_vector(F.transform("v", lambda x: x / _norm(F.col("v"))))
    )

    # k scales with corpus size (~N/60, capped): 16 cells over a
    # 500-vector fixture would leave ~30 vectors/cell — quantization
    # noise swamps the structure and recall collapses. At real scale
    # k ≈ sqrt(N) with a sampled fit, and N/k stays in the thousands.
    n = e.count()
    if n == 0:
        # Empty corpus: nothing to fit — a valid empty assignment/probe
        # (the empty-partition contract), not a KMeans crash.
        empty = e.select("vec_id", "v", F.lit(0).alias("cell")).filter(F.lit(False))
        return empty, [], e.select(F.col("v").alias("q")).filter(F.lit(False)), []
    k = max(2, min(IVF_K, n // 60))
    # Quantizer fit is sampled above a bound: k-means cost is O(N·k·i)
    # and the coarse centroids converge on a fraction of the corpus —
    # at 10^9+ vectors training on everything is pure waste. Seeded
    # sample keeps the model deterministic.
    fit_cap = 100_000
    fit_df = e if n <= fit_cap else e.sample(fraction=fit_cap / n, seed=42)
    model = KMeans(k=k, seed=42, featuresCol="fv", predictionCol="cell").fit(fit_df)
    assigned = model.transform(e)

    centroids = [list(c) for c in model.clusterCenters()]
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(vector_to_array("fv")).first()
    qv = list(q_row[0])

    def l2(a: list[float], b: list[float]) -> float:
        return sum((x - y) ** 2 for x, y in zip(a, b))

    probe = sorted(range(k), key=lambda c: l2(centroids[c], qv))[:IVF_NPROBE]

    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("q"))
    return assigned.select("vec_id", "v", "cell"), probe, q, centroids


def _ivf_score(cands: DataFrame, q: DataFrame) -> DataFrame:
    """Exact-cosine top-k over an (already cell-pruned) candidate set."""
    return (
        cands.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means coarse quantizer (MLlib KMeans, fixed seed) →
    every vector assigned to its nearest cell → probe the `IVF_NPROBE`
    cells nearest the query with exact cosine inside them.

    Scale shape: the quantizer trains on a sample (see
    ``_ivf_fit_assign``), the centroid set is tiny and broadcast with
    the assignment model, so assignment is a narrow map; the probe
    filters the scan to nprobe/k of the corpus BEFORE any scoring.
    Persisting the corpus partitioned by `cell` (``write_ivf_store``)
    turns the probe into PARTITION PRUNING — the IVF inverted list,
    literally; tests/test_layout.py proves a probe reads only the
    probed cells' files (r5 verdict item 6). Cell-size skew is the
    known hazard (popular cells → straggler tasks); mitigated by AQE
    skew splitting or splitting fat cells into sub-cells (IVF-HNSW
    hybrids do the same).
    """
    assigned, probe, q, _cents = _ivf_fit_assign(spark, sf_dir)
    return _ivf_score(assigned.filter(F.col("cell").isin(probe)), q)


def ann_ivf_seeded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF retrieval with a DETERMINISTIC HASH-SEEDED quantizer (r10) —
    `ann_ivf_topk`'s decision procedure made hash-checkable with
    DATA-DERIVED centroids, completing the fitted-ANN oracle program:
    the PQ and IVF-ADC axes got frozen-literal twins in r8/r9, the
    SemDeDup assignment got the hash-seed twin (`semantic_dedup_seeded`,
    whose recorded argument — MLlib k-means|| has no SQL replay —
    covers this key's fit too); this key puts the RETRIEVAL path
    (probe ranking → cell-pruned scan → exact top-k) under a full
    value-hash oracle with centroids the SQL twin re-derives from the
    data, not literals.

    The seeding rule is the fitted key's k ∝ N deployment rule
    (k = max(2, min(IVF_K, n//60))) over the k vectors with smallest
    md5(vec_id); probe selection is the query's 6-dp-rounded cosine to
    each seed centroid, top `IVF_NPROBE` by (sim DESC, cid ASC) —
    `ann_ivf_pq_frozen_topk`'s driver-side ranking, tie rule included;
    assignment shares `_centroid_assign_udf` (the banded Arrow matmul
    and its exactness proof) verbatim; scoring shares `_ivf_score`.

    Scale shape: seed selection is one bounded TakeOrdered collect
    (≤ IVF_K rows), assignment a narrow map over broadcast centroids,
    and the probe filters the scan to nprobe/k of the corpus before
    any scoring — with the cell-partitioned store this is partition
    pruning, exactly as the fitted key."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").first()
    if q_row is None or q_row[0] is None:
        return e.select("vec_id", F.lit(0.0).alias("cos_sim")).filter(F.lit(False))
    qv = [float(x) for x in q_row[0]]
    n = table_row_count(spark, sf_dir, "embeddings")  # row-preserving projection
    k = max(2, min(IVF_K, n // 60))
    seeds = (
        e.select("vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("hk"))
        .orderBy("hk", "vec_id")
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r.v] for r in seeds]
    qnorm = math.sqrt(_py_seq_dot(qv, qv))
    sims = [
        math.floor(
            (_py_seq_dot(qv, c) / (qnorm * math.sqrt(sum(x * x for x in c))))
            * 1e6
            + 0.5
        )
        / 1e6
        for c in cents
    ]
    probes = sorted(range(len(sims)), key=lambda c: (-sims[c], c))[:IVF_NPROBE]
    en = e.select("vec_id", "v", _norm(F.col("v")).alias("vn"))
    assign = _centroid_assign_udf(cents)
    assigned = en.select(
        "vec_id", "v", assign(F.col("v"), F.col("vn")).alias("s")
    ).select("vec_id", "v", F.col("s.cluster").alias("cell"))
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("q"))
    return _ivf_score(assigned.filter(F.col("cell").isin(probes)), q)


def _sql_ann_ivf_seeded() -> str:
    """DuckDB twin of :func:`ann_ivf_seeded_topk`: seeds, probe
    ranking, assignment argmax, and the exact-cosine top-k ALL
    re-derive from the data — no literals. Centroid norms use the
    sequential dot fold both engines agree on (the
    semantic_dedup_seeded oracle's assumption, same seed rows)."""
    qsim = sql_stable_round("list_dot_product(q.qv, s.c) / (q.qn * s.cn)", 6)
    asim = sql_stable_round("list_dot_product(en.v, s.c) / (en.vn * s.cn)", 6)
    cos = sql_stable_round(
        "list_dot_product(a.v, q.qv) / (sqrt(list_dot_product(a.v, a.v)) * q.qn)",
        4,
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), cnt AS (
            SELECT greatest(2, least({IVF_K}, COUNT(*) // 60)) AS k FROM e
        ), seeds AS (
            SELECT row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS cid,
                   v AS c, sqrt(list_dot_product(v, v)) AS cn
            FROM e
            QUALIFY row_number() OVER (
                        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                    ) <= (SELECT k FROM cnt)
        ), q AS (
            SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn
            FROM e WHERE vec_id = {QUERY_VEC_ID}
        ), probes AS (
            SELECT s.cid FROM q, seeds s
            ORDER BY {qsim} DESC, s.cid ASC LIMIT {IVF_NPROBE}
        ), en AS (
            SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn
            FROM e WHERE vec_id <> {QUERY_VEC_ID}
        ), a AS (
            SELECT vec_id, v, cid AS cell FROM (
                SELECT en.vec_id, en.v, s.cid, {asim} AS sim
                FROM en CROSS JOIN seeds s
            )
            QUALIFY row_number() OVER (
                        PARTITION BY vec_id ORDER BY sim DESC, cid ASC
                    ) = 1
        )
        SELECT a.vec_id, {cos} AS cos_sim
        FROM a CROSS JOIN q
        WHERE a.cell IN (SELECT cid FROM probes)
        ORDER BY cos_sim DESC, a.vec_id ASC LIMIT {TOP_K}
    """


def write_ivf_store(
    assigned: DataFrame, path: str, centroids: list[list[float]] | None = None
) -> None:
    """Persist an IVF-assigned corpus partitioned by cell — one file
    per cell directory (repartition first: the small-files trap), so a
    probe's `cell IN (...)` becomes directory-level partition pruning
    and reads nprobe/k of the store's files.

    When ``centroids`` is given, the frozen quantizer is persisted
    alongside under ``_quantizer/`` (underscore-prefixed → invisible
    to the data scan's file listing, the _SUCCESS convention), making
    the store SELF-DESCRIBING: later batches upsert with the same
    quantizer (`upsert_ivf_store`) without refitting — refitting would
    silently re-shard history (cell ids change meaning) and is the
    classic IVF-maintenance bug."""
    (
        assigned.repartition(F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )
    if centroids is not None:
        spark = assigned.sparkSession
        rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
        spark.createDataFrame(rows, "cell int, centroid array<double>").coalesce(
            1
        ).write.mode("overwrite").parquet(path + "/_quantizer")


def upsert_ivf_store(spark: SparkSession, path: str, batch: DataFrame) -> None:
    """Incremental IVF index maintenance — the daily-embedding-batch
    shape (the dedup_incremental / corpus_incremental discipline
    applied to the ANN index): assign the new batch with the store's
    FROZEN quantizer and APPEND into the existing cell directories.
    Existing files are never rewritten; a probe after the upsert sees
    old and new rows through the same partition pruning.

    Assignment rule: argmin squared-L2 against the persisted centroids
    over the L2-NORMALIZED vector (spherical assignment — identical to
    the fit-time `KMeans.transform` geometry), ties to the lowest cell
    id; computed as one numpy matmul per Arrow batch (the
    `_centroid_assign_udf` pattern — a narrow map, no shuffle until
    the per-cell repartition for file sizing). Pinned in pytest
    against a driver-side numpy reference and by the planted-neighbor
    probe property."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    cents = sorted(
        (r.cell, r.centroid)
        for r in spark.read.parquet(path + "/_quantizer").collect()
    )
    C = np.stack([np.asarray(c, dtype=np.float64) for _, c in cents])
    cell_ids = np.array([i for i, _ in cents], dtype=np.int32)

    @pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        V = V / np.sqrt(np.einsum("ij,ij->i", V, V))[:, None]
        # ||v - c||² = ||v||² + ||c||² - 2v·c → argmin over cells; numpy
        # argmin takes the FIRST minimum = lowest cell id on ties
        d = (
            np.einsum("ij,ij->i", V, V)[:, None]
            + np.einsum("ij,ij->i", C, C)[None, :]
            - 2.0 * (V @ C.T)
        )
        return pd.Series(cell_ids[np.argmin(d, axis=1)])

    assigned = batch.select(
        "vec_id", "v", _assign(F.col("v")).alias("cell")
    )
    (
        assigned.repartition(F.col("cell"))
        .write.mode("append")
        .partitionBy("cell")
        .parquet(path)
    )


def probe_ivf_store(
    spark: SparkSession, path: str, probe: list[int], q: DataFrame
) -> DataFrame:
    """Exact-cosine top-k over a cell-partitioned store, scanning only
    the probed cells (PartitionFilters — asserted in tests)."""
    store = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    return _ivf_score(store, q)


PQ_M = 8  # subspaces: 64-dim vectors → 8 sub-vectors of 8 dims each
PQ_KS = 16  # codewords per subspace (4-bit codes here; 256 = classic PQ at scale)
PQ_RERANK = 50  # ADC candidate pool re-ranked with exact cosine
PQ_FIT_CAP = 50_000  # driver-side training-sample bound (same argument as the BPE fit)
PQ_FIT_ITERS = 10


def _pq_fit(mat):
    """Per-subspace Lloyd's k-means over a normalized sample — the PQ
    codebook fit of Jégou/Douze/Schmid 2011 (TPAMI, "Product
    Quantization for Nearest Neighbor Search"). Deterministic by
    construction: seeded init, fixed iteration count, argmin ties to
    the lower index. Returns (M, k, dsub) codebooks."""
    import numpy as np

    n, dim = mat.shape
    dsub = dim // PQ_M
    rng = np.random.RandomState(42)
    books = []
    for m in range(PQ_M):
        sub = mat[:, m * dsub : (m + 1) * dsub]
        k = min(PQ_KS, n)
        idx = rng.choice(n, size=k, replace=False)
        cents = sub[idx].copy()
        for _ in range(PQ_FIT_ITERS):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(k):
                pts = sub[assign == j]
                if len(pts):
                    cents[j] = pts.mean(0)
        books.append(cents)
    return np.stack(books)


def _pq_normalize(mat):
    import numpy as np

    norms = np.sqrt((mat * mat).sum(1, keepdims=True))
    norms[norms == 0.0] = 1.0  # zero vectors encode as themselves
    return mat / norms


def _pq_encode_udf(books):
    """Arrow-batched encoder: normalize, then per-subspace nearest
    codeword → M small ints per vector. This is the stored
    representation — dim×4 bytes collapse to M codes (64-dim float32 →
    8 bytes, 32×), which is what lets a 100 TB embedding corpus keep
    its scannable form in memory."""
    import numpy as np

    dsub = books.shape[2]

    @F.pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        mat = _pq_normalize(np.array(vs.tolist(), dtype=np.float64))
        codes = np.empty((len(mat), PQ_M), dtype=np.int64)
        for m in range(PQ_M):
            sub = mat[:, m * dsub : (m + 1) * dsub]
            # ||s - c||² = ||s||² - 2s·c + ||c||²; argmin over c drops ||s||²
            d2 = (books[m] * books[m]).sum(1)[None, :] - 2.0 * (sub @ books[m].T)
            codes[:, m] = d2.argmin(1)
        return pd.Series(list(codes))

    return enc


def _pq_adc_udf(books, qnorm):
    """Asymmetric-distance scorer: the query stays un-quantized; a
    (M × k) lookup table of sub-inner-products is computed once on the
    driver and captured in the UDF closure (broadcast with the task
    binary — ~M·k·8 bytes). Score = Σ_m lut[m, code_m] ≈ ⟨q, v⟩ on
    normalized vectors ≈ cosine. A narrow map over the codes column —
    the corpus' float payload is never read at query time."""
    import numpy as np

    dsub = books.shape[2]
    lut = np.stack(
        [books[m] @ qnorm[m * dsub : (m + 1) * dsub] for m in range(PQ_M)]
    )  # (M, k)

    @F.pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        if codes.empty:
            return pd.Series([], dtype=np.float64)
        c = np.array(codes.tolist(), dtype=np.int64)  # (batch, M)
        return pd.Series(lut[np.arange(PQ_M)[None, :], c].sum(1))

    return adc


_PQ_BOOKS_CACHE: dict[tuple, object] = {}


def _ann_pq(
    spark: SparkSession, e: DataFrame, cache_key=None, universe: DataFrame | None = None
) -> DataFrame:
    """PQ encode → ADC scan → exact re-rank over an arbitrary
    (vec_id, v) corpus; `ann_pq_topk` binds it to the embeddings table.
    `cache_key` memoizes the fitted codebooks per immutable corpus.
    `universe` optionally restricts the ADC scan to a pre-pruned
    candidate subset (the IVF-ADC composition) — codebooks still fit on
    the full corpus, and the exact re-rank still reads from `e`."""
    import numpy as np

    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").first()
    if q_row is None:
        # empty-partition contract: valid empty result, not a crash
        return (
            e.select("vec_id", F.lit(0.0).alias("cos_sim")).filter(F.lit(False))
        )
    dim = len(q_row[0])
    if dim % PQ_M:
        raise ValueError(f"PQ needs dim divisible by {PQ_M}, got {dim}")
    qnorm = _pq_normalize(np.array([q_row[0]], dtype=np.float64))[0]

    books = _PQ_BOOKS_CACHE.get(cache_key) if cache_key else None
    if books is None:
        n = e.count()
        fit_df = e if n <= PQ_FIT_CAP else e.sample(fraction=PQ_FIT_CAP / n, seed=42)
        sample = np.array(
            [r[0] for r in fit_df.select("v").collect()], dtype=np.float64
        )
        books = _pq_fit(_pq_normalize(sample))
        if cache_key:
            _PQ_BOOKS_CACHE[cache_key] = books

    enc, adc = _pq_encode_udf(books), _pq_adc_udf(books, qnorm)
    base = e if universe is None else universe
    cands = (
        base.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("code", enc("v"))
        .withColumn("adc_ip", adc("code"))
        .orderBy(F.col("adc_ip").desc(), F.col("vec_id").asc())
        .limit(PQ_RERANK)
        .select("vec_id")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("q"))
    return (
        e.join(F.broadcast(cands), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou/Douze/Schmid 2011, TPAMI):
    per-subspace codebooks fit on a bounded seeded sample → vectors
    encoded to M 4-bit codes (narrow Arrow map) → query-time ADC scores
    the codes against a driver-built (M × k) lookup table (narrow map —
    the float payload is never read at query time) → top-`PQ_RERANK`
    candidates re-ranked with exact cosine → top-k. Complements the
    family: multiprobe/IVF prune WHICH vectors are scored; PQ shrinks
    WHAT is read per vector (64-dim float32 → 8 bytes, 32×) — at
    100 TB the two compose (IVF cells × PQ codes = IVF-ADC, the FAISS
    default).

    Scale shape: fit is O(sample) on the driver; encoding is
    embarrassingly parallel and stored once; the ADC scan shuffles
    nothing (TakeOrdered collects k·partitions candidates); the re-rank
    reads `PQ_RERANK` rows by id — a broadcast semi-join here, point
    lookups in the id-bucketed store at scale. Rows-only key: the
    fitted codebooks have no SQL twin; recall is property-tested
    against the brute-force baseline (tests/test_properties.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return _ann_pq(
        spark, e, cache_key=(spark.sparkContext.applicationId, sf_dir)
    )


PQF_SCALE = 0.125  # 1/sqrt(dim): codewords at the unit-normalized subvector magnitude


def _pq_frozen_books() -> list[list[list[float]]]:
    """PQ_M × PQ_KS × dsub codewords, seeded and FROZEN AT IMPORT and
    inlined as literals into BOTH engines (the `_sem_centroids`
    pattern, extended to PQ per the r8 verdict item 3): the production
    fitted-codebook key (`ann_pq_topk`) stays rows-only because a
    driver-side k-means fit has no SQL twin, but nothing about the PQ
    DECISION PROCEDURE — normalize, per-subspace argmin encode, ADC
    lookup-table scoring, exact re-rank — depends on where the
    codebooks came from. Frozen seeded codewords (scaled to the
    unit-normalized subvector magnitude so ADC scores live in the
    data's range) make the entire procedure oracle-checkable."""
    import numpy as np

    rng = np.random.RandomState(11)
    dsub = 64 // PQ_M
    return [
        [[float(x) for x in c] for c in rng.standard_normal((PQ_KS, dsub)) * PQF_SCALE]
        for _ in range(PQ_M)
    ]


_PQ_FROZEN_BOOKS = _pq_frozen_books()


def _pq_frozen_encode_udf():
    """Arrow-batched frozen-codebook encoder with the banded-exactness
    discipline of `_banded_round_matrix`: distances are computed as a
    numpy matmul (`c2 − 2·sub@books`, the fitted encoder's form), and a
    row's subspace is re-derived with exact sequential Python folds —
    the oracle's evaluation order, including the first-occurrence tie
    rule — whenever the two smallest distances sit within 1e-9 of each
    other. Matmul-vs-fold drift on these O(0.1)-magnitude doubles is
    ≲1e-13, so off-band argmins provably agree with the fold argmin
    and in-band rows ARE the fold's answer: every emitted code equals
    the oracle's `list_position(d, list_min(d))` bit-for-bit."""
    import numpy as np

    books_py = _PQ_FROZEN_BOOKS
    books = np.array(books_py, dtype=np.float64)  # (M, k, dsub)
    c2_py = [[_py_seq_dot(c, c) for c in books_py[m]] for m in range(PQ_M)]
    c2 = np.array(c2_py)
    M, k, dsub = books.shape

    def _rederive(vrow, m: int) -> int:
        vn2 = 0.0
        for x in vrow:
            vn2 = vn2 + x * x
        vn = math.sqrt(vn2)
        vn = vn if vn != 0.0 else 1.0
        sub = [x / vn for x in vrow[m * dsub : (m + 1) * dsub]]
        d = [
            c2_py[m][j] - 2.0 * _py_seq_dot(sub, books_py[m][j]) for j in range(k)
        ]
        return min(range(k), key=lambda j: (d[j], j))

    @F.pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        if vs.empty:
            return pd.Series([], dtype=object)
        mat = np.array(vs.tolist(), dtype=np.float64)
        norms = np.sqrt((mat * mat).sum(1, keepdims=True))
        norms[norms == 0.0] = 1.0
        nv = mat / norms
        codes = np.empty((len(mat), M), dtype=np.int64)
        for m in range(M):
            sub = nv[:, m * dsub : (m + 1) * dsub]
            d = c2[m][None, :] - 2.0 * (sub @ books[m].T)
            codes[:, m] = d.argmin(1)
            part = np.partition(d, 1, axis=1)
            for i in np.nonzero(part[:, 1] - part[:, 0] < 1e-9)[0]:
                codes[int(i), m] = _rederive(mat[int(i)], m)
        return pd.Series(list(codes))

    return enc


def ann_pq_frozen_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ann_pq_topk`'s oracle-checkable twin: the IDENTICAL
    encode→ADC→re-rank plan with the codebooks frozen at import
    (`_pq_frozen_books`) instead of fitted.

    Exactness argument (the `_sql_ann_multiprobe` discipline, term by
    term — every float on both sides is produced by the same
    sequential left-fold over the same doubles, per the module parity
    note Python `sum`/JVM `F.aggregate`/DuckDB `list_dot_product`):
    - normalization: ``x / norm`` elementwise with the zero-vector
      guard (norm 0 → 1) — one IEEE division per element both sides.
    - encode: per-subspace distance to codeword i is
      ``c2_i − 2·dot(sub, c_i)`` (the ‖s‖²-dropped form the fitted
      encoder uses); c2_i is a Python sequential self-dot inlined as a
      literal in BOTH engines. The Spark side encodes via the banded
      Arrow UDF (`_pq_frozen_encode_udf` — numpy matmul, near-tie
      rows re-derived with exact folds), whose emitted code provably
      equals the oracle's ``list_position(d, list_min(d))`` first-min
      index.
    - ADC: the (M × k) lookup table is the query's per-subspace dots
      with each codeword — computed ONCE driver-side as Python floats
      and inlined as array literals on the Spark side; the oracle
      recomputes the same values in SQL from its own query row (same
      fold). Score = left-to-right chain over the M looked-up entries.
    - cutoff and re-rank: top-`PQ_RERANK` by (adc DESC, vec_id) on
      bit-identical doubles, then the family's rounded exact cosine.

    Scale shape = `ann_pq_topk`'s verbatim: narrow encode map (the
    codes column is what a 100 TB store persists), zero-shuffle ADC
    scan, TakeOrdered candidate pool, broadcast-semi-join re-rank.
    (A first cut unrolled all M·k codeword distances as JVM fold
    expressions — bit-exact by construction but Catalyst paid ~90 s
    analyzing the 128-HOF tree at sf0.01; the banded Arrow encode
    below is the measured replacement, same proof class as
    `_banded_round_matrix`.)"""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").first()
    if q_row is None or q_row[0] is None:
        return e.select("vec_id", F.lit(0.0).alias("cos_sim")).filter(F.lit(False))
    qv = list(q_row[0])
    dim = len(qv)
    if dim != PQ_M * (64 // PQ_M):
        raise ValueError(f"frozen PQ codebooks assume dim 64, got {dim}")
    return _pq_frozen_rank(e, qv)


def _pq_frozen_rank(e: DataFrame, qv: list, universe: DataFrame | None = None) -> DataFrame:
    """The frozen-codebook ADC → exact-rerank tail shared by
    `ann_pq_frozen_topk` (universe = whole corpus) and
    `ann_ivf_pq_frozen_topk` (universe = the probed IVF cells).
    The LUT is Python sequential-fold floats inlined as literals; the
    ADC sum is an exact left-to-right chain over the looked-up
    doubles — the same floats the oracle's lut{m}[code{m}] chain
    adds."""
    dsub = len(qv) // PQ_M
    qn2 = 0.0
    for x in qv:
        qn2 = qn2 + x * x
    qnorm = math.sqrt(qn2)
    qnorm = qnorm if qnorm != 0.0 else 1.0
    qn = [x / qnorm for x in qv]
    lut = [
        [_py_seq_dot(qn[m * dsub : (m + 1) * dsub], c) for c in _PQ_FROZEN_BOOKS[m]]
        for m in range(PQ_M)
    ]

    enc = _pq_frozen_encode_udf()
    adc = None
    for m in range(PQ_M):
        term = F.element_at(
            F.lit(lut[m]), (F.element_at("codes", m + 1) + F.lit(1)).cast("int")
        )
        adc = term if adc is None else adc + term
    base = e if universe is None else universe
    cands = (
        base.filter(F.col("vec_id") != QUERY_VEC_ID)
        .withColumn("codes", enc("v"))
        .select("vec_id", adc.alias("adc_ip"))
        .orderBy(F.col("adc_ip").desc(), F.col("vec_id").asc())
        .limit(PQ_RERANK)
        .select("vec_id")
    )
    q = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("v").alias("q"))
    return (
        e.join(F.broadcast(cands), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


def _sql_ann_pq_frozen(ivf: bool = False, seeded: bool = False) -> str:
    """DuckDB twin of `ann_pq_frozen_topk` with the frozen codebooks
    inlined as list literals — the PQ/ADC extension of
    `_sql_ann_multiprobe`'s inlined-literal technique the r8 verdict
    asked for. The LUT is recomputed in SQL from the oracle's own
    query row (same sequential fold as the driver's Python floats);
    codeword self-dots are the SAME Python-computed literals both
    engines consume. With ``ivf`` the ADC scan is additionally
    restricted to the query's `IVF_NPROBE` probed cells: the
    semantic_dedup assignment CTE (frozen centroid literals,
    first-position argmax) plus a probe ranking of the query's own
    rounded centroid cosines (sim DESC, cell ASC — the driver's
    (−sim, k) sort) — `ann_ivf_pq_frozen_topk`'s twin. With
    ``seeded`` the cell restriction instead re-derives the quantizer
    FROM THE DATA — `_sql_ann_ivf_seeded`'s cnt/seeds/probes/
    assignment CTEs verbatim (k ∝ N deployment rule, md5-smallest
    seed rows, 6-dp rounded cosines, (sim DESC, cid ASC) ties) —
    composed with the same frozen-codebook ADC tail:
    `ann_ivf_pq_seeded_topk`'s twin, the r10-verdict-item-7 key."""
    dsub = 64 // PQ_M
    books = _PQ_FROZEN_BOOKS
    c2 = [[_py_seq_dot(c, c) for c in books[m]] for m in range(PQ_M)]
    code_exprs, lut_exprs, adc_terms = [], [], []
    for m in range(PQ_M):
        lo, hi = m * dsub + 1, (m + 1) * dsub
        d_list = "[" + ",\n                   ".join(
            f"({_sql_double(c2[m][i])} - 2e0 * list_dot_product(nv[{lo}:{hi}], "
            + "["
            + ", ".join(_sql_double(w) for w in books[m][i])
            + "]))"
            for i in range(len(books[m]))
        ) + "]"
        code_exprs.append(f"list_position({d_list}, list_min({d_list})) AS code{m}")
        lut_list = "[" + ", ".join(
            f"list_dot_product(qn[{lo}:{hi}], ["
            + ", ".join(_sql_double(w) for w in books[m][i])
            + "])"
            for i in range(len(books[m]))
        ) + "]"
        lut_exprs.append(f"{lut_list} AS lut{m}")
        adc_terms.append(f"lut{m}[code{m}]")
    adc = "\n                 + ".join(adc_terms)
    cos = sql_stable_round(
        "(list_dot_product(v, qv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))))",
        4,
    )
    ivf_ctes, scan_src = "", f"e WHERE vec_id <> {QUERY_VEC_ID}"
    if seeded:
        qsim = sql_stable_round(
            "list_dot_product(q.qv, s.c) / "
            "(sqrt(list_dot_product(q.qv, q.qv)) * s.cn)",
            6,
        )
        asim = sql_stable_round(
            "list_dot_product(en.v, s.c) / (en.vn * s.cn)", 6
        )
        ivf_ctes = f""", cnt AS (
            SELECT greatest(2, least({IVF_K}, COUNT(*) // 60)) AS k FROM e
        ), seeds AS (
            SELECT row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS cid,
                   v AS c, sqrt(list_dot_product(v, v)) AS cn
            FROM e
            QUALIFY row_number() OVER (
                        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                    ) <= (SELECT k FROM cnt)
        ), probes AS (
            SELECT s.cid FROM q, seeds s
            ORDER BY {qsim} DESC, s.cid ASC LIMIT {IVF_NPROBE}
        ), asg AS (
            SELECT vec_id, cid AS cluster FROM (
                SELECT en.vec_id, s.cid, {asim} AS sim
                FROM (SELECT vec_id, v,
                             sqrt(list_dot_product(v, v)) AS vn FROM e) en
                CROSS JOIN seeds s
            )
            QUALIFY row_number() OVER (
                        PARTITION BY vec_id ORDER BY sim DESC, cid ASC
                    ) = 1
        )"""
        scan_src = (
            f"e JOIN asg USING (vec_id) WHERE vec_id <> {QUERY_VEC_ID}"
            " AND cluster IN (SELECT cid FROM probes)"
        )
    elif ivf:
        sims = "[" + ", ".join(_sql_sem_cos(c) for c in _SEM_CENTROIDS) + "]"
        qsims = "[" + ", ".join(_sql_sem_cos(c, col="qv") for c in _SEM_CENTROIDS) + "]"
        ivf_ctes = f""", qs AS (
            SELECT {qsims} AS qsims FROM q
        ), probes AS (
            SELECT CAST(u.k - 1 AS INTEGER) AS cell FROM (
                SELECT unnest(qsims) AS sim,
                       generate_subscripts(qsims, 1) AS k
                FROM qs
            ) u ORDER BY sim DESC, k ASC LIMIT {IVF_NPROBE}
        ), asg AS (
            SELECT vec_id,
                   CAST(list_position(cl_sims, list_max(cl_sims)) - 1 AS INTEGER) AS cluster
            FROM (SELECT vec_id, {sims} AS cl_sims FROM e)
        )"""
        scan_src = (
            f"e JOIN asg USING (vec_id) WHERE vec_id <> {QUERY_VEC_ID}"
            " AND cluster IN (SELECT cell FROM probes)"
        )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), q AS (
            SELECT v AS qv,
                   list_transform(v, x -> x / (
                       CASE WHEN sqrt(list_dot_product(v, v)) = 0e0 THEN 1e0
                            ELSE sqrt(list_dot_product(v, v)) END)) AS qn
            FROM e WHERE vec_id = {QUERY_VEC_ID}
        ){ivf_ctes}, lut AS (
            SELECT qv, {", ".join(lut_exprs)} FROM q
        ), coded AS (
            SELECT vec_id, {", ".join(code_exprs)}
            FROM (
                SELECT vec_id,
                       list_transform(v, x -> x / (
                           CASE WHEN sqrt(list_dot_product(v, v)) = 0e0 THEN 1e0
                                ELSE sqrt(list_dot_product(v, v)) END)) AS nv
                FROM {scan_src}
            )
        ), cands AS (
            SELECT vec_id,
                   ({adc}) AS adc_ip
            FROM coded CROSS JOIN lut
            ORDER BY adc_ip DESC, vec_id ASC LIMIT {PQ_RERANK}
        )
        SELECT e.vec_id, {cos} AS cos_sim
        FROM e JOIN cands USING (vec_id) CROSS JOIN q
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
    """


def ann_ivf_pq_frozen_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ann_ivf_pq_topk`'s oracle-checkable twin (r9, extending the
    r8-verdict inlined-literal technique to the COMPOSED production
    shape): IVF cell pruning over the FROZEN `_SEM_CENTROIDS`
    (semantic_dedup's assignment machinery and exactness proof,
    shared verbatim via `_centroid_assign_udf`) × frozen-codebook
    ADC (`_pq_frozen_rank`, shared verbatim with
    `ann_pq_frozen_topk`) × exact rounded-cosine re-rank. Every
    fitted constant in the fitted key has a frozen analogue here, so
    the ENTIRE two-axis decision procedure — which cells to probe,
    which codes each vector gets, how the LUT scores them, who
    survives the rerank — re-derives in DuckDB.

    Probe selection: the query's rounded (6 dp) cosine to each
    frozen centroid, computed driver-side with exact sequential
    folds (the same floats `_sql_sem_cos` produces from its inlined
    literals), top `IVF_NPROBE` cells by (sim DESC, cell ASC) — the
    oracle's ORDER BY, tie rule included. At 100 TB the universe
    filter becomes partition pruning against the cell-partitioned
    store (`write_ivf_store`), and the ADC scan reads
    nprobe/k of the corpus as codes only — the family's
    sublinear-in-rows-AND-bytes member, now hash-checkable."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").first()
    if q_row is None or q_row[0] is None:
        return e.select("vec_id", F.lit(0.0).alias("cos_sim")).filter(F.lit(False))
    qv = list(q_row[0])
    if len(qv) != PQ_M * (64 // PQ_M):
        raise ValueError(f"frozen PQ codebooks assume dim 64, got {len(qv)}")
    qnorm = math.sqrt(_py_seq_dot(qv, qv))
    sims = [
        math.floor(
            (_py_seq_dot(qv, c) / (qnorm * math.sqrt(sum(x * x for x in c))))
            * 1e6
            + 0.5
        )
        / 1e6
        for c in _SEM_CENTROIDS
    ]
    probes = sorted(range(len(sims)), key=lambda k: (-sims[k], k))[:IVF_NPROBE]
    en = e.select("vec_id", "v", _norm(F.col("v")).alias("vn"))
    assign = _centroid_assign_udf(_SEM_CENTROIDS)
    assigned = en.select(
        "vec_id", "v", assign(F.col("v"), F.col("vn")).alias("s")
    ).select("vec_id", "v", F.col("s.cluster").alias("cluster"))
    universe = assigned.filter(F.col("cluster").isin(probes)).select("vec_id", "v")
    return _pq_frozen_rank(e, qv, universe=universe)


def ann_ivf_pq_seeded_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed IVF-ADC pipeline with a DATA-DERIVED hash-seeded
    quantizer (r11, closing the r10 verdict's item 7): the one fitted
    composition still rows-only after r10 was `ann_ivf_pq_topk` —
    its two halves each had oracle twins (`ann_ivf_seeded_topk`
    re-derives the quantizer from data; `ann_pq_frozen_topk` checks
    the ADC under frozen codebooks) but the COMPOSITION (which cells
    the data-derived quantizer prunes, then which codes survive ADC
    inside exactly those cells) did not automatically inherit either
    argument. This key composes them end-to-end: the seeded-IVF head
    (`ann_ivf_seeded_topk`'s k ∝ N rule, md5-smallest seed rows,
    `_centroid_assign_udf` assignment, 6-dp probe ranking — shared
    verbatim) feeding `_pq_frozen_rank`'s frozen-codebook ADC →
    exact-rerank tail (shared verbatim with `ann_pq_frozen_topk`),
    under one full value-hash oracle whose SQL twin re-derives the
    quantizer from the data AND replays the ADC from inlined
    codebook literals (`_sql_ann_pq_frozen(seeded=True)`).

    What remains genuinely un-oracle-able in `ann_ivf_pq_topk` is
    only the sampled k-means/codebook FIT itself (no SQL replay of
    Lloyd iterations — the recorded `semantic_dedup_seeded`
    argument); every DECISION the fitted pipeline makes at query
    time is now hash-checked through this twin.

    Scale shape: identical to `ann_ivf_pq_frozen_topk` — seed
    selection is one bounded TakeOrdered collect (≤ IVF_K rows),
    assignment a narrow Arrow map over broadcast centroids, the ADC
    scan reads nprobe/k of the corpus (partition pruning against a
    cell-partitioned store), codes-only bytes per vector, exact
    rerank on a PQ_RERANK-bounded broadcast pool."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q_row = e.filter(F.col("vec_id") == QUERY_VEC_ID).select("v").first()
    if q_row is None or q_row[0] is None:
        return e.select("vec_id", F.lit(0.0).alias("cos_sim")).filter(F.lit(False))
    qv = [float(x) for x in q_row[0]]
    if len(qv) != PQ_M * (64 // PQ_M):
        raise ValueError(f"frozen PQ codebooks assume dim 64, got {len(qv)}")
    n = table_row_count(spark, sf_dir, "embeddings")  # row-preserving projection
    k = max(2, min(IVF_K, n // 60))
    seeds = (
        e.select("vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("hk"))
        .orderBy("hk", "vec_id")
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r.v] for r in seeds]
    qnorm = math.sqrt(_py_seq_dot(qv, qv))
    sims = [
        math.floor(
            (_py_seq_dot(qv, c) / (qnorm * math.sqrt(sum(x * x for x in c))))
            * 1e6
            + 0.5
        )
        / 1e6
        for c in cents
    ]
    probes = sorted(range(len(sims)), key=lambda c: (-sims[c], c))[:IVF_NPROBE]
    en = e.select("vec_id", "v", _norm(F.col("v")).alias("vn"))
    assign = _centroid_assign_udf(cents)
    assigned = en.select(
        "vec_id", "v", assign(F.col("v"), F.col("vn")).alias("s")
    ).select("vec_id", "v", F.col("s.cluster").alias("cell"))
    universe = assigned.filter(F.col("cell").isin(probes)).select("vec_id", "v")
    return _pq_frozen_rank(e, qv, universe=universe)


def _ann_ivf_pq(spark: SparkSession, e: DataFrame, cache_key=None) -> DataFrame:
    """IVF-ADC over an arbitrary (vec_id, v) corpus: IVF prunes WHICH
    vectors are scanned (probed cells), PQ shrinks WHAT is read per
    vector (ADC over codes), exact cosine re-ranks the pool."""
    assigned, probe, _q, _cents = _ivf_fit_assign_df(e)
    universe = assigned.filter(F.col("cell").isin(probe)).select("vec_id", "v")
    return _ann_pq(spark, e, cache_key=cache_key, universe=universe)


def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed production ANN shape — IVF-ADC (the FAISS default:
    IVFx,PQy): the sampled spherical-k-means coarse quantizer restricts
    the scan to `IVF_NPROBE` cells (partition pruning once the store is
    laid out by cell — `write_ivf_store`), product-quantization codes
    shrink the per-vector payload inside those cells 32×, ADC ranks the
    pool, and exact cosine re-ranks the top-`PQ_RERANK`. The two
    orthogonal axes the family ships separately (`ann_ivf_topk`,
    `ann_pq_topk`), composed and tested end-to-end: at 100 TB this is
    nprobe/k of the corpus read as codes-only — the only family member
    whose query cost is sublinear in BOTH rows and bytes-per-row.
    Rows-only key: fitted quantizer + codebooks have no SQL twin;
    planted-neighbor recall tested in tests/test_properties.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return _ann_ivf_pq(
        spark, e, cache_key=(spark.sparkContext.applicationId, sf_dir)
    )


SEM_K = 16
SEM_THRESHOLD = 0.4


def _sem_centroids() -> list[list[float]]:
    """SEM_K seeded gaussian cluster centers, frozen at import and
    inlined as literals into BOTH engines (the neardup-planes pattern).
    A production SemDeDup fits k-means first (ann_ivf_topk shows the
    MLlib path); frozen random centers keep the operator fully
    oracle-checkable and exercise the identical plan — the paper's
    result depends on the cluster-then-pairwise structure, not on
    centroid quality."""
    import numpy as np

    rng = np.random.RandomState(5)
    return [[float(x) for x in row] for row in rng.standard_normal((SEM_K, 64))]


_SEM_CENTROIDS = _sem_centroids()


def _py_seq_dot(a, b) -> float:
    """Sequential left-fold dot — the exact JVM `_dot` evaluation
    order, reproduced in Python for band re-derivation."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _banded_round_matrix(raw, digits: int, rederive):
    """HALF-UP round a raw cosine matrix to ``digits`` dp with the
    exact-fold safety band (the proof obligation shared by
    `_centroid_assign_udf` and `knn_join`'s scorer — ONE
    implementation so the band/tie rules can never drift apart):
    matmul raw values differ from the sequential JVM fold by ≲1e-12
    relative, which can only change the rounded value when the scaled
    value sits within that Δ of an integer; every entry within 1e-4
    of an integer (a ~10^8× safety band) is re-derived via
    ``rederive(i, j)`` — the caller's exact sequential-evaluation-
    order cosine — so every entry of the result equals
    stable_round(fold_value, digits) bit-for-bit. Off-band entries
    provably agree; in-band entries ARE the fold's value."""
    import numpy as np

    scale = 10.0 ** digits
    t = raw * scale + 0.5
    R = np.floor(t) / scale
    flag = np.abs(t - np.rint(t)) < 1e-4
    if flag.any():
        for i, j in zip(*np.nonzero(flag)):
            R[i, j] = math.floor(rederive(int(i), int(j)) * scale + 0.5) / scale
    return R


_ASSIGN_UDF_CACHE: dict[tuple, object] = {}


def _centroid_assign_udf(cents: list[list[float]]):
    """Scalar pandas_udf scoring ALL centroids per vector as one numpy
    matmul, returning (cluster, c2c) — the r6 re-plan of the
    assignment stage (r5 verdict item 1: the 16 interpreted
    `zip_with`+`aggregate` folds per vector were a measured flat ~15×
    constant behind vectorized engines; the pair stage's Arrow-matmul
    pattern transfers here verbatim).

    Exactness (numpy prunes, never decides — extended to "numpy
    decides only where it provably equals the fold"): the published
    semantics are stable_round(fold_cosine, 6) → first-position
    argmax. ``stable_round`` is pure IEEE ops (floor(x·1e6 + 0.5)/1e6,
    operators/parity.py:85), which numpy evaluates bit-identically on
    the SAME raw input; the only divergence source is the raw cosine
    itself (matmul pairwise summation vs the JVM's sequential fold,
    |Δ| ≲ 1e-12 relative for 64-dim unit-scale vectors). A differing
    raw can only change the ROUNDED value when the scaled value
    x·1e6 + 0.5 sits within |Δ|·1e6 ≈ 1e-6 of an integer, so every
    entry within 1e-4 of an integer (a 100× safety band that flags
    ~0.02% of entries) is re-derived with the exact JVM evaluation
    order: products, sequential left-fold sum, divide by
    (vn · literal-centroid-norm), stable_round. Off-band entries are
    PROVABLY equal to the fold's rounded value; in-band entries ARE
    the fold's value — so cluster/c2c are bit-identical to the r5
    all-JVM plan by construction, on every input."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(cents, dtype=np.float64)
    # the JVM plan divides by F.lit(math.sqrt(sum(x*x for x in c))) —
    # reuse those exact Python-computed literals, not numpy norms
    # Memoize on centroid CONTENT: the registry key passes the frozen
    # module-level list on every call, and rebuilding the pandas_udf
    # (capture + registration) was ~0.2 s of every plan build. The
    # cache key is the full value tuple, not id() — vec_scale passes
    # freshly-fitted lists that must never alias.
    cache_key = tuple(tuple(c) for c in cents)
    cached = _ASSIGN_UDF_CACHE.get(cache_key)
    if cached is not None:
        return cached

    cn = np.array([math.sqrt(sum(x * x for x in c)) for c in cents])

    @pandas_udf("struct<cluster:int,c2c:double>")
    def assign(v: pd.Series, vn: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame(
                {"cluster": pd.array([], dtype="int32"),
                 "c2c": pd.array([], dtype="float64")}
            )
        V = np.stack(v.to_numpy())
        w = vn.to_numpy(dtype=np.float64)
        S = (V @ C.T) / (w[:, None] * cn[None, :])
        R = _banded_round_matrix(
            S, 6, lambda i, j: _py_seq_dot(V[i], C[j]) / (w[i] * cn[j])
        )
        cl = np.argmax(R, axis=1).astype("int32")  # first max == array_position rule
        return pd.DataFrame({"cluster": cl, "c2c": R[np.arange(len(cl)), cl]})

    _ASSIGN_UDF_CACHE[cache_key] = assign
    return assign


def semantic_dedup_plan(
    spark: SparkSession, e: DataFrame, cents: list[list[float]]
) -> DataFrame:
    """The SemDeDup plan over ``e`` = (vec_id, v: array<double>) with an
    arbitrary centroid list — shared by the registry key (frozen
    SEM_K centroids, oracle-checkable) and scripts/vec_scale.py
    (k ∝ N, the paper's deployment rule), so the measured scale trend
    exercises the exact shipped plan. See ``semantic_dedup`` for
    semantics and scale analysis."""
    from pyspark import StorageLevel

    e = e.select("vec_id", "v", _norm(F.col("v")).alias("vn"))
    assign = _centroid_assign_udf(cents)
    assigned = (
        e.select(
            "vec_id",
            F.expr("transform(v, x -> x / vn)").alias("nv"),
            assign(F.col("v"), F.col("vn")).alias("s"),
        )
        .select(
            "vec_id",
            "nv",
            F.col("s.cluster").alias("cluster"),
            F.col("s.c2c").alias("c2c"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    thr = SEM_THRESHOLD

    def _cluster_candidates(pdf):
        import numpy as np
        import pandas as pd

        m = np.stack(pdf["nv"].to_numpy())
        s = m @ m.T
        # margin = 4-dp rounding half-step (5e-5) + matmul ulp slack
        ii, jj = np.nonzero(s >= thr - 6e-5)
        keep = ii != jj
        ii, jj = ii[keep], jj[keep]
        ids = pdf["vec_id"].to_numpy()
        nv = pdf["nv"].to_numpy()
        c2c = pdf["c2c"].to_numpy()
        # Emit the pair's vectors and centroid-sims WITH the candidate
        # row (Arrow doubles roundtrip bit-exactly), so the JVM verify
        # below needs NO re-attach joins. Candidates ≈ actual
        # duplicates — sparse by definition — so the widened shuffle
        # rows cost less than the two extra shuffle joins they replace
        # (r6: 1.3 s → sub-second at sf0.1; at scale the pair count,
        # not the row width, is the term that matters).
        return pd.DataFrame(
            {
                "a_id": ids[ii],
                "b_id": ids[jj],
                "nva": nv[ii],
                "nvb": nv[jj],
                "c2c_a": c2c[ii],
                "c2c_b": c2c[jj],
            }
        )

    cand = assigned.groupBy("cluster").applyInPandas(
        _cluster_candidates,
        "a_id long, b_id long, nva array<double>, nvb array<double>, "
        "c2c_a double, c2c_b double",
    )
    removed_ids = (
        cand.filter(stable_round(_dot(F.col("nva"), F.col("nvb")), 4) >= thr)
        .filter(
            (F.col("c2c_a") < F.col("c2c_b"))
            | ((F.col("c2c_a") == F.col("c2c_b")) & (F.col("a_id") < F.col("b_id")))
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("rm", F.lit(1))
    )
    return assigned.join(removed_ids, "vec_id", "left").select(
        "vec_id",
        "cluster",
        stable_round(F.col("c2c"), 4).alias("c2c"),
        F.coalesce(F.col("rm") == 1, F.lit(False)).alias("removed"),
    )


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): assign every
    embedding to its nearest cluster center, then WITHIN each cluster
    flag semantic duplicates — a vector is removed when a same-cluster
    neighbor with cosine ≥ SEM_THRESHOLD outranks it (lower
    centroid-similarity wins, the paper's keep-the-atypical rule;
    vec_id breaks ties). Output: (vec_id, cluster, c2c, removed) for
    every vector — the audit table whose `removed` column IS the
    dedup decision.

    Scale shape: assignment is a narrow map against SEM_K literal
    centroids (no fit job at query time); the pairwise stage is the
    paper's blocking structure — all-pairs only WITHIN a cluster, via
    one self-join keyed by cluster id, so cost is Σ|cluster|², bounded
    by choosing k ∝ N/target_cluster_size at fit time (the 100 TB
    deployment fits k-means on a sample — ann_ivf_topk's quantizer —
    and k is millions, keeping clusters O(thousands)). Vectors ride
    the cluster join once; the exists-style removal is a semi-join.

    Determinism: per-centroid cosines are stable_round-ed to 1e-6
    before the argmax (first-max-position tie rule in both engines),
    pair cosines to 1e-4 before the threshold — raw-double argmax
    would hinge engine agreement on last-ulp summation order.

    Cost shape (r6 re-plan — both vector-heavy stages now Arrow):
    each vector is L2-NORMALIZED ONCE and the assignment table is
    persisted. ASSIGNMENT batch-scores all SEM_K centroids per Arrow
    batch as one numpy matmul inside a scalar pandas_udf, with the
    few rounding-boundary entries re-derived in the exact JVM fold
    order so (cluster, c2c) are bit-identical to the r5 all-JVM plan
    on every input — see ``_centroid_assign_udf`` for the proof
    obligation (r5 measured the 16 interpreted folds per vector as a
    flat ~14× constant vs DuckDB at sf0.1; this removes it). The
    Σ|cluster|² pair stage is CANDIDATES-THEN-EXACT-VERIFY (the
    embedding_neardup pattern): an Arrow-batched ``applyInPandas``
    per cluster computes all pairwise dots as ONE numpy matmul and
    emits every pair above SEM_THRESHOLD − 6e−5. The margin is NOT
    arbitrary: the exact filter accepts on the 4-dp HALF-UP ROUNDED
    dot, which admits raw dots down to T − 5e−5, and matmul pairwise
    summation differs from the sequential fold by ~1e−13 relative —
    so T − 6e−5 strictly covers every pair any rounding can accept
    (a first cut used T − 1e−6 and scripts/vec_scale.py caught 4
    missed removals at n=20k: boundary pairs with raw dot in
    [T−5e−5, T−1e−6) round UP into acceptance). The few surviving
    candidates are then re-scored with the sequential JVM fold and
    the EXACT rounded threshold/ordering rule, so the final answer is
    bit-identical to the oracle by construction — numpy only prunes
    (and, in assignment, decides only where provably equal to the
    fold). The grouped-map contract is honest: one cluster
    materializes in one Python worker, and cluster size is bounded
    ~N/k BY CONSTRUCTION (k grows with N at fit time; the
    ``semantic_dedup_plan`` entry point takes the fitted centroid
    list, and scripts/vec_scale.py measures it with k ∝ N)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return semantic_dedup_plan(spark, e, _SEM_CENTROIDS)


def semantic_dedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with a FITTED quantizer — the production path the
    frozen-centroid `semantic_dedup` key documents (r5 verdict item
    8): centroids come from the sampled spherical-k-means fit
    (`_ivf_fit_assign`'s recipe: L2-normalize, seeded KMeans on a
    bounded sample, k ∝ N so cluster size stays ~constant), then the
    IDENTICAL `semantic_dedup_plan` runs over them — assignment
    matmul, cluster-blocked candidate matmul, exact JVM verify.

    Rows-only by design: fitted centroids are a model artifact DuckDB
    cannot reproduce; instead tests/test_properties.py re-derives the
    full removal set in numpy FROM THIS KEY'S OWN audit output
    (cluster + c2c columns) against brute-force pair cosines — an
    exact decision-procedure oracle, stronger than a hash compare of
    frozen fixtures. The fit is one bounded eager driver action (the
    ann_ivf class)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    n = table_row_count(spark, sf_dir, "embeddings")  # row-preserving projection
    if n < 2:
        # nothing to cluster (empty partition / day filter): the plan
        # over frozen centroids yields the correct empty/degenerate
        # audit without a quantizer fit
        return semantic_dedup_plan(spark, e, _SEM_CENTROIDS[:2])
    k = max(2, min(64, n // 125))
    fit_cap = 100_000
    fe = e.withColumn(
        "fv", array_to_vector(F.transform("v", lambda x: x / _norm(F.col("v"))))
    )
    fit_df = fe if n <= fit_cap else fe.sample(fraction=fit_cap / n, seed=42)
    model = KMeans(k=k, seed=42, featuresCol="fv", predictionCol="cell").fit(fit_df)
    cents = [[float(x) for x in c] for c in model.clusterCenters()]
    return semantic_dedup_plan(spark, e, cents)


def semantic_dedup_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over a DETERMINISTIC HASH-SEEDED quantizer (r10, r9
    verdict item 8) — the fitted path's ENTIRE decision procedure made
    hash-checkable with DATA-DERIVED (non-literal) centroids.

    Why the fitted key itself cannot gain a SQL oracle (the recorded
    argument item 8 asked for): `semantic_dedup_ivf`'s centroids come
    from MLlib KMeans — seed-deterministic WITHIN Spark, but its
    k-means|| initialization draws from Spark's per-partition RNG
    stream and its Lloyd updates accumulate float means in partition
    order; no SQL engine can replay either, so equality of fitted
    centroids across engines is unachievable by construction (and
    inlining one engine's fit as literals into the other's query is a
    frozen twin, which `semantic_dedup` already is).

    This key closes the remaining gap: replace the fit with a
    deterministic seeding rule BOTH engines can compute exactly — the
    k vectors with the smallest md5(vec_id) (k = max(2, min(64,
    n//125)), the fitted key's k ∝ N deployment rule) become the
    centroids, raw (cosine normalizes, so seed vectors need no
    arithmetic beyond the shared norm fold). Everything downstream —
    the Arrow matmul assignment with its banded exact re-derive, the
    cluster-blocked candidate matmul, the exact JVM verify, the
    keep-the-atypical removal rule — is `semantic_dedup_plan`
    VERBATIM, i.e. the exact code path the fitted key runs, now under
    a full value-hash oracle that re-derives the seeds in SQL.

    Scale shape: seed selection is a global top-k by hash (one
    TakeOrdered, k ≤ 64 rows ≈ 32 KB collected — a bounded driver
    action like the fit it replaces); the plan's scale argument is
    semantic_dedup's. Hash seeding is also the honest production
    fallback when no fit artifact is available — uniform over the id
    space, scale-invariant, reproducible across reruns."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    n = table_row_count(spark, sf_dir, "embeddings")  # row-preserving projection
    if n == 0:
        # empty corpus: nothing to seed — any centroid set yields the
        # same (empty) result; the frozen pair keeps the assign UDF's
        # nonempty-centroids contract. n == 1 MUST take the seed path:
        # the oracle derives the lone vector as centroid 0 (cluster=0,
        # c2c=1.0), which frozen random centroids would not match.
        return semantic_dedup_plan(spark, e, _SEM_CENTROIDS[:2])
    k = max(2, min(64, n // 125))
    seeds = (
        e.select("vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("hk"))
        .orderBy("hk", "vec_id")
        .limit(k)
        .collect()
    )
    cents = [[float(x) for x in r.v] for r in seeds]
    return semantic_dedup_plan(spark, e, cents)


def _sql_semantic_dedup_seeded() -> str:
    """SQL twin of :func:`semantic_dedup_seeded`: the seeds CTE
    re-derives the hash-selected centroids from the data (no
    literals), then mirrors the frozen oracle's normalize → rounded
    argmax (first-max = lowest cid) → pair threshold → removal rule.
    Centroid norms use the same sequential dot fold both engines
    already agree on for vector norms (the shipped semantic_dedup
    oracle's assumption, extended to the seed rows)."""
    pair_cos = sql_stable_round("list_dot_product(x.nv, y.nv)", 4)
    sim = sql_stable_round(
        "list_dot_product(en.v, s.c) / (en.vn * s.cn)", 6
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), cnt AS (
            SELECT greatest(2, least(64, COUNT(*) // 125)) AS k FROM e
        ), seeds AS (
            SELECT row_number() OVER (
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) - 1 AS cid,
                   v AS c, sqrt(list_dot_product(v, v)) AS cn
            FROM e
            QUALIFY row_number() OVER (
                        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                    ) <= (SELECT k FROM cnt)
        ), en AS (
            SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e
        ), sims AS (
            SELECT en.vec_id, en.v, en.vn, s.cid, {sim} AS sim
            FROM en CROSS JOIN seeds s
        ), a AS (
            SELECT vec_id,
                   list_transform(v, x -> x / vn) AS nv,
                   CAST(cid AS INTEGER) AS cluster,
                   sim AS c2c
            FROM sims
            QUALIFY row_number() OVER (
                        PARTITION BY vec_id ORDER BY sim DESC, cid ASC
                    ) = 1
        ), rm AS (
            SELECT DISTINCT y.vec_id
            FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
            WHERE {pair_cos} >= {SEM_THRESHOLD}
              AND (x.c2c < y.c2c OR (x.c2c = y.c2c AND x.vec_id < y.vec_id))
        )
        SELECT a.vec_id, a.cluster,
               {sql_stable_round('a.c2c', 4)} AS c2c,
               (rm.vec_id IS NOT NULL) AS removed
        FROM a LEFT JOIN rm ON a.vec_id = rm.vec_id
    """


def _sql_sem_cos(c: list[float], col: str = "v") -> str:
    import math

    lit = "[" + ", ".join(repr(x) for x in c) + "]"
    return sql_stable_round(
        f"(list_dot_product({col}, {lit}) / (sqrt(list_dot_product({col}, {col})) * {math.sqrt(sum(x * x for x in c))!r}))",
        6,
    )


def _sql_semantic_dedup() -> str:
    sims = "[" + ", ".join(_sql_sem_cos(c) for c in _SEM_CENTROIDS) + "]"
    # normalize-then-dot, mirroring the Spark plan's once-per-vector
    # L2 normalization (vn computed BEFORE sims, exactly as Spark's
    # projection orders it)
    pair_cos = sql_stable_round("list_dot_product(x.nv, y.nv)", 4)
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), en AS (
            SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e
        ), s AS (
            SELECT vec_id, v, vn, {sims} AS cl_sims FROM en
        ), a AS (
            SELECT vec_id,
                   list_transform(v, x -> x / vn) AS nv,
                   CAST(list_position(cl_sims, list_max(cl_sims)) - 1 AS INTEGER) AS cluster,
                   list_max(cl_sims) AS c2c
            FROM s
        ), rm AS (
            SELECT DISTINCT y.vec_id
            FROM a x JOIN a y ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
            WHERE {pair_cos} >= {SEM_THRESHOLD}
              AND (x.c2c < y.c2c OR (x.c2c = y.c2c AND x.vec_id < y.vec_id))
        )
        SELECT a.vec_id, a.cluster,
               {sql_stable_round('a.c2c', 4)} AS c2c,
               (rm.vec_id IS NOT NULL) AS removed
        FROM a LEFT JOIN rm ON a.vec_id = rm.vec_id
    """


CLUSTER_TOPICS_K = 10  # distinctive terms reported per cluster


def cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-profiling report (new r8) — the companion every
    embedding-clustered curation run needs (SemDeDup / DataComp-style
    audits): WHAT is in each cluster, in words. Each document's
    embedding is assigned to its nearest frozen centroid (the
    semantic_dedup assignment, shared machinery and shared exactness
    proof), then each cluster is described by its χ²-most-distinctive
    terms (the chi2_keywords statistic with cluster id as the slice
    key) plus its document count. Output: (cluster, n_docs, rk, term,
    a, chi2) — the table a curator reads before deciding which
    clusters to drop, downsample, or upweight.

    Composition, not new machinery: the Arrow-matmul centroid
    assignment (bit-exact to the JVM fold, `_centroid_assign_udf`'s
    proof) joins documents on the shared id, and the χ² contingency
    plan is one (cluster, term) partial-agg shuffle with a SIZE-GATED
    per-term marginal join (``broadcast_if_bounded`` — broadcast on
    fixtures, co-partitioned shuffle at web-scale vocabulary) and
    rank-limit-pushdown top-K — both shapes carry
    in-window driver rows via semantic_dedup and chi2_keywords. At
    100 TB the id join is the only corpus×corpus edge and it is
    layout-co-partitioned (both sides keyed by the document id);
    everything downstream is vocab- or k-bounded."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).select("vec_id", "v", _norm(F.col("v")).alias("vn"))
    assign = _centroid_assign_udf(_SEM_CENTROIDS)
    assigned = e.select(
        "vec_id", assign(F.col("v"), F.col("vn")).alias("s")
    ).select("vec_id", F.col("s.cluster").alias("cluster"))

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    jd = docs.join(assigned, docs.doc_id == assigned.vec_id).select(
        "cluster", "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    nd = jd.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_docs"))
    ct = (
        jd.select("cluster", F.explode("toks").alias("term"))
        .groupBy("cluster", "term")
        .agg(F.count(F.lit(1)).alias("a"))
    )
    termtot = ct.groupBy("term").agg(F.sum("a").alias("term_total"))
    cltot = ct.groupBy("cluster").agg(F.sum("a").alias("cl_total"))
    tot = ct.agg(F.sum("a").alias("nn"))
    # per-term marginal = corpus vocabulary cardinality — size-gated
    # hint (r9, the chi2_keywords gate shared verbatim): broadcast on
    # fixtures, co-partitioned shuffle join on `term` at web scale.
    # cltot (k centroids) and the 1-row total stay broadcast.
    j = (
        ct.join(broadcast_if_bounded(termtot), "term")
        .join(F.broadcast(cltot), "cluster")
        .crossJoin(F.broadcast(tot))
    )
    a = F.col("a").cast("double")
    b = (F.col("term_total") - F.col("a")).cast("double")
    c = (F.col("cl_total") - F.col("a")).cast("double")
    d = (F.col("nn") - F.col("term_total") - F.col("cl_total") + F.col("a")).cast(
        "double"
    )
    chi2 = stable_round(
        F.col("nn").cast("double")
        * F.pow(a * d - b * c, F.lit(2.0))
        / ((a + b) * (c + d) * (a + c) * (b + d)),
        4,
    )
    ranked = j.select("cluster", "term", "a", chi2.alias("chi2")).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("cluster").orderBy(F.col("chi2").desc(), F.col("term").asc())
        ),
    )
    return (
        ranked.filter(F.col("rk") <= CLUSTER_TOPICS_K)
        .join(F.broadcast(nd), "cluster")
        .select(
            "cluster", "n_docs", F.col("rk").cast("int").alias("rk"),
            "term", "a", "chi2",
        )
    )


def _sql_cluster_topics() -> str:
    """DuckDB twin: the semantic_dedup assignment CTE (inlined frozen
    centroid literals, list_position argmax) feeding the chi2_keywords
    contingency SQL with cluster as the slice key."""
    sims = "[" + ", ".join(_sql_sem_cos(c) for c in _SEM_CENTROIDS) + "]"
    chi2 = sql_stable_round(
        "CAST(nn AS DOUBLE)"
        " * power(CAST(ct.a AS DOUBLE) * CAST(nn - term_total - cl_total + ct.a AS DOUBLE)"
        "         - CAST(term_total - ct.a AS DOUBLE) * CAST(cl_total - ct.a AS DOUBLE), 2.0)"
        " / ((CAST(ct.a AS DOUBLE) + CAST(term_total - ct.a AS DOUBLE))"
        "    * (CAST(cl_total - ct.a AS DOUBLE) + CAST(nn - term_total - cl_total + ct.a AS DOUBLE))"
        "    * (CAST(ct.a AS DOUBLE) + CAST(cl_total - ct.a AS DOUBLE))"
        "    * (CAST(term_total - ct.a AS DOUBLE) + CAST(nn - term_total - cl_total + ct.a AS DOUBLE)))",
        4,
    )
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), en AS (
            SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS vn FROM e
        ), s AS (
            SELECT vec_id, {sims} AS cl_sims FROM en
        ), asg AS (
            SELECT vec_id,
                   CAST(list_position(cl_sims, list_max(cl_sims)) - 1 AS INTEGER) AS cluster
            FROM s
        ), jd AS (
            SELECT asg.cluster, d.doc_id, string_split(d.text, ' ') AS toks
            FROM documents d JOIN asg ON d.doc_id = asg.vec_id
        ), nd AS (
            SELECT cluster, COUNT(*) AS n_docs FROM jd GROUP BY cluster
        ), ct AS (
            SELECT cluster, term, CAST(COUNT(*) AS BIGINT) AS a FROM (
                SELECT cluster, unnest(toks) AS term FROM jd
            ) GROUP BY cluster, term
        ), tt AS (
            SELECT term, SUM(a) AS term_total FROM ct GROUP BY term
        ), lt AS (
            SELECT cluster, SUM(a) AS cl_total FROM ct GROUP BY cluster
        ), n AS (SELECT SUM(a) AS nn FROM ct),
        x AS (
            SELECT ct.cluster, ct.term, ct.a, {chi2} AS chi2
            FROM ct JOIN tt USING (term) JOIN lt USING (cluster) CROSS JOIN n
        )
        SELECT r.cluster, nd.n_docs, CAST(rk AS INTEGER) AS rk, term, a, chi2
        FROM (
            SELECT cluster, term, a, chi2,
                   ROW_NUMBER() OVER (
                       PARTITION BY cluster ORDER BY chi2 DESC, term ASC
                   ) AS rk
            FROM x
        ) r JOIN nd USING (cluster) WHERE rk <= {CLUSTER_TOPICS_K}
    """


KNN_K = 5
KNN_Q_MOD = 100  # vec_id % 100 == 0 → the query set
KNN_SALT = 8
KNN_Q_CAP = 100_000  # hard bound on the collected query set (~50 MB at 64-dim doubles)


def knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN JOIN: for EVERY vector in a query set (here
    vec_id % KNN_Q_MOD == 0 — a stand-in for "the new batch" /
    "the eval set"), the KNN_K nearest corpus vectors by cosine.
    ``similarity_topk`` answers one query; this is the many-query
    form production uses for cross-dataset near-dup checks and
    retrieval-index evaluation. Exact brute-force scoring — the
    correctness baseline the ANN paths are scored against; output
    (q_id, vec_id, cos, rank).

    Scale shape (r6 re-plan — the r5 verdict's matmul transfer): the
    query set is collected ONCE at plan build and rides to every
    executor in the ``mapInPandas`` closure. That collect is now a
    HARD CONTRACT, enforced (r9, closing the r8 verdict's last
    driver-side bottleneck): at most ``KNN_Q_CAP`` query vectors
    (~50 MB of doubles — driver- and task-closure-bounded), checked
    with a ``limit(cap+1)`` probe so the overflow case never pulls
    the full set either. Above the cap the correct plan is a
    DIFFERENT operator, and the error says so: route queries through
    the IVF cell store (`write_ivf_store`/`probe_ivf_store`) or run
    bounded external query blocks — a chunked-union variant here
    would NOT fix memory (every block's matrix still lives in the
    one plan's closures) and would re-scan the corpus per block. Scoring is a narrow Arrow map over
    the corpus: each batch computes ALL |batch| × |Q| cosines as one
    numpy matmul — r5's per-pair interpreted `zip_with`+`aggregate`
    fold was the same flat constant the semantic_dedup assignment
    stage carried — and emits only its LOCAL top-KNN_K per query
    under the exact (rounded cos desc, vec_id asc) order. That
    per-batch prune is lossless: any non-emitted row is strictly
    outranked by ≥ KNN_K same-batch rows in the global total order,
    so it cannot reach the global top-k. Only batches × KNN_K rows
    per query ever enter the final rank — the reducer-side hot-key
    exposure the r5 salted two-phase bounded at ~N/SALT is now
    bounded at ~KNN_K per (batch, query), strictly better, with the
    |corpus| × |Q| scored-row shuffle gone entirely.

    Determinism/exactness: cosines are stable_round-ed to 4 dp before
    ranking, vec_id ascending as tie-break. stable_round is pure IEEE
    ops, bit-identical in numpy on the same raw; raw matmul-vs-fold
    divergence (≲1e-12) only matters within ~1e-8 of a rounding
    boundary, so entries inside a 1e-4 safety band are re-derived in
    the exact JVM fold order (products → sequential sum → divide) —
    the ``_centroid_assign_udf`` proof obligation, same discipline."""
    import numpy as np

    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    qrows = (
        e.filter(F.col("vec_id") % KNN_Q_MOD == 0)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
        .limit(KNN_Q_CAP + 1)
        .collect()
    )
    if len(qrows) > KNN_Q_CAP:
        raise ValueError(
            f"knn_join query set exceeds KNN_Q_CAP={KNN_Q_CAP}: the "
            "brute-force batch k-NN join collects the query side to "
            "the driver by contract. Route large query sets through "
            "the IVF cell store (write_ivf_store/probe_ivf_store) or "
            "submit bounded external query blocks."
        )
    out_schema = "q_id long, vec_id long, cos double"
    c = e.filter(F.col("vec_id") % KNN_Q_MOD != 0)
    if not qrows:
        return (
            spark.createDataFrame([], out_schema + ", rank int")
        )
    q_ids = np.array([r.q_id for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r.qv, dtype=np.float64) for r in qrows])

    # exact JVM-order query norms, computed once: sqrt(sequential fold
    # of the squared components) — _norm()'s evaluation order
    qn = np.array([math.sqrt(_py_seq_dot(r.qv, r.qv)) for r in qrows])

    def _score_batches(it):
        import pandas as pd

        nq = len(q_ids)
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            V = np.stack(pdf["v"].to_numpy())
            nv = np.sqrt(np.einsum("ij,ij->i", V, V))
            R = _banded_round_matrix(
                (V @ Q.T) / (nv[:, None] * qn[None, :]),
                4,
                lambda i, j: _py_seq_dot(V[i], Q[j])
                / (math.sqrt(_py_seq_dot(V[i], V[i])) * qn[j]),
            )
            n = len(ids)
            k = min(KNN_K, n)
            # the local top-k per query, vectorized across ALL queries
            # in one argpartition (the per-query lexsort loop was the
            # measured ×100-scale bottleneck: 2 000 python-level sorts
            # + 2 000 DataFrame builds per batch). R sits on the 1e-4
            # grid, so c = rint(R·1e4) is its exact integer image and
            # key = c·n + (n−1−pos) — pos the batch-local ascending
            # ordinal of vec_id — totally orders every row by
            # (cos desc, vec_id asc); keys are unique, so the
            # argpartition SET is the exact lexsort head.
            c = np.rint(R * 10000.0).astype(np.int64)
            pos = np.empty(n, dtype=np.int64)
            pos[np.argsort(ids, kind="stable")] = np.arange(n)
            key = c * np.int64(n) + (np.int64(n - 1) - pos)[:, None]
            if n > k:
                top = np.argpartition(-key, k - 1, axis=0)[:k]
            else:
                top = np.broadcast_to(np.arange(n)[:, None], (n, nq))
            cols = np.broadcast_to(np.arange(nq), top.shape)
            yield pd.DataFrame(
                {
                    "q_id": np.broadcast_to(q_ids, top.shape).ravel(),
                    "vec_id": ids[top].ravel(),
                    "cos": R[top, cols].ravel(),
                }
            )

    # the scorer is CPU-dense (≈6 s single-thread per 10k-row Arrow
    # batch at Q=2 000), but Spark sizes scan partitions by BYTES —
    # a 200k-vector corpus is ~50 MB = ONE split, serializing every
    # batch through one Python worker (measured: the ×100 wall was
    # ~20 batches × 6.3 s ≈ the single-thread sum, 169 s total).
    # Rebalance to the core count when the scan under-splits AND the
    # work is dense enough to cover the shuffle (Q is a free
    # corpus-size proxy at plan build — Q = N/KNN_Q_MOD by the key's
    # rule; below the threshold the whole job is sub-second and the
    # extra stage would only re-add dispatch floor). A real multi-TB
    # corpus already carries ≥ parallelism splits and never pays the
    # shuffle (vectors are ~0.5 KB/row — MBs moved vs minutes of
    # matmul). Measured at ×100 (200k vectors, Q=2 000): 169 → 25 s,
    # 0.36× the DuckDB twin — the brute-force key's crossover.
    if len(qrows) >= 200:
        par = spark.sparkContext.defaultParallelism
        if c.rdd.getNumPartitions() < par:
            c = c.repartition(par)
    scored = c.mapInPandas(_score_batches, out_schema)
    w2 = W.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= KNN_K)
        .select("q_id", "vec_id", "cos", "rank")
    )


_SQL_KNN_JOIN = f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    q AS (
        SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % {KNN_Q_MOD} = 0
    ),
    scored AS (
        SELECT q_id, vec_id,
               {sql_stable_round(
                   "(list_dot_product(v, qv) / "
                   "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))))",
                   4,
               )} AS cos
        FROM e CROSS JOIN q
        WHERE e.vec_id % {KNN_Q_MOD} <> 0
    )
    SELECT q_id, vec_id, cos, CAST(rank AS INTEGER) AS rank FROM (
        SELECT q_id, vec_id, cos,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY cos DESC, vec_id ASC
               ) AS rank
        FROM scored
    ) WHERE rank <= {KNN_K}
"""


def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k audit of the seeded-IVF retrieval against exact brute
    force — the index-QA report every ANN deployment runs before
    serving from it (recall at the operating point is THE number that
    decides nprobe/k). Composes two already-hash-checked decision
    procedures verbatim: ``ann_ivf_seeded_topk`` (the candidate set)
    and ``similarity_topk`` (the ground truth), so the audit itself
    gets a full oracle by nesting their SQL twins. Output is one row —
    (k, n_ann, n_exact, n_hits, recall_bp) — with recall in exact
    integer basis points (n_hits * 10000 DIV n_exact, 10000 when the
    exact set is empty): no float surface, and correct even when the
    corpus holds fewer than TOP_K vectors (advisor r12).

    Scale shape: both sub-plans are TOP_K-row results (persisted here
    so the hit-join does not re-run the underlying scans); the audit
    adds one broadcast join over k rows and three 1-row aggregates —
    free at any corpus size. Run per query batch, the same composition
    audits recall continuously as the corpus grows — the drift signal
    that tells an operator the quantizer needs refitting."""
    ann = ann_ivf_seeded_topk(spark, sf_dir).select("vec_id").persist()
    exact = similarity_topk(spark, sf_dir).select("vec_id").persist()
    hits = ann.join(F.broadcast(exact), "vec_id", "inner")
    return (
        ann.agg(F.count(F.lit(1)).cast("long").alias("n_ann"))
        .crossJoin(exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact")))
        .crossJoin(hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
        .select(
            F.lit(TOP_K).cast("int").alias("k"),
            "n_ann",
            "n_exact",
            "n_hits",
            # recall over the TRUE result size, not the nominal k
            # (advisor r12): with fewer than TOP_K corpus vectors the
            # exact set is shorter than k and dividing by k understates
            # recall even at perfect retrieval. n_exact = TOP_K on
            # every fixture, so the emitted value is unchanged there;
            # both engines changed together.
            F.expr(
                "CASE WHEN n_exact = 0 THEN 10000"
                " ELSE n_hits * 10000 DIV n_exact END"
            )
            .cast("long")
            .alias("recall_bp"),
        )
    )


QUERIES = {
    "similarity_topk": similarity_topk,
    "ann_recall_audit": ann_recall_audit,
    "embedding_centroid": embedding_centroid,
    "embedding_drift": embedding_drift,
    "embedding_neardup": embedding_neardup,
    "ann_lsh_topk": ann_lsh_topk,  # full oracle since r8: all 32 table planes inlined (multiprobe precedent)
    "ann_multiprobe_topk": ann_multiprobe_topk,  # full oracle since r8: fitted planes inlined as SQL literals
    "ann_ivf_seeded_topk": ann_ivf_seeded_topk,  # full oracle (r10): hash-seeded data-derived quantizer, the IVF retrieval path made hash-checkable
    "ann_pq_frozen_topk": ann_pq_frozen_topk,  # full oracle (r9): frozen codebooks inlined as SQL literals
    "ann_ivf_pq_frozen_topk": ann_ivf_pq_frozen_topk,  # full oracle (r9): the composed IVF-ADC shape, frozen twin
    "ann_ivf_pq_seeded_topk": ann_ivf_pq_seeded_topk,  # full oracle (r11): data-derived seeded quantizer × frozen-codebook ADC — the composed pipeline's every query-time decision hash-checked
    # SUPERSEDED rows-only keys retired from the registry r12 (r11
    # verdict item 6): ann_ivf_topk, ann_pq_topk, ann_ivf_pq_topk and
    # semantic_dedup_ivf ran the SAME query-time decision procedures
    # as their seeded/frozen oracle twins above, differing only in
    # where the quantizer/codebook constants come from (a fitted
    # k-means/PQ training run vs hash-seeded or import-frozen
    # literals). The fitted-path CODE stays (ann_ivf_topk,
    # ann_pq_topk, ann_ivf_pq_topk, semantic_dedup_ivf functions +
    # fit_ivf_quantizer/fit_pq_codebooks) and its recall / stability /
    # decision-procedure properties stay pinned in
    # tests/test_properties.py and tests/test_layout.py — but the
    # registry no longer carries permanently-unverifiable duplicates
    # of hash-checked plans (rows-only surface 15 → 11).
    "semantic_dedup": semantic_dedup,
    "semantic_dedup_seeded": semantic_dedup_seeded,  # full oracle (r10): hash-seeded data-derived centroids, the fitted path's plan made hash-checkable
    "knn_join": knn_join,
    "cluster_topics": cluster_topics,
}

# brute-force cosine top-k twin — shared by similarity_topk and the
# recall audit's ground-truth CTE
_SQL_SIM_TOPK = f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), q AS (
            SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}
        )
        SELECT vec_id,
               (FLOOR((list_dot_product(v, qv)
                     / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))) * 10000.0 + 0.5) / 10000.0) AS cos_sim
        FROM e, q WHERE vec_id != {QUERY_VEC_ID}
        ORDER BY cos_sim DESC, vec_id ASC LIMIT {TOP_K}
    """

ORACLE = {
    "ann_ivf_seeded_topk": _sql_ann_ivf_seeded(),
    "semantic_dedup": _sql_semantic_dedup(),
    "semantic_dedup_seeded": _sql_semantic_dedup_seeded(),
    "ann_multiprobe_topk": _sql_ann_multiprobe(),
    "ann_pq_frozen_topk": _sql_ann_pq_frozen(),
    "ann_ivf_pq_frozen_topk": _sql_ann_pq_frozen(ivf=True),
    "ann_ivf_pq_seeded_topk": _sql_ann_pq_frozen(seeded=True),
    "ann_lsh_topk": _sql_ann_lsh(),
    "cluster_topics": _sql_cluster_topics(),
    "knn_join": _SQL_KNN_JOIN,
    "similarity_topk": _SQL_SIM_TOPK,
    # the recall audit nests the two already-checked twins verbatim —
    # integer basis points, no float surface of its own
    "ann_recall_audit": f"""
        WITH ann AS (
            SELECT vec_id FROM ({_sql_ann_ivf_seeded()})
        ), exact AS (
            SELECT vec_id FROM ({_SQL_SIM_TOPK})
        )
        SELECT CAST({TOP_K} AS INTEGER) AS k,
               (SELECT CAST(count(*) AS BIGINT) FROM ann) AS n_ann,
               (SELECT CAST(count(*) AS BIGINT) FROM exact) AS n_exact,
               (SELECT CAST(count(*) AS BIGINT)
                  FROM ann JOIN exact USING (vec_id)) AS n_hits,
               (SELECT CASE WHEN (SELECT count(*) FROM exact) = 0
                            THEN CAST(10000 AS BIGINT)
                            ELSE CAST(count(*) * 10000
                                      // (SELECT count(*) FROM exact)
                                      AS BIGINT) END
                  FROM ann JOIN exact USING (vec_id)) AS recall_bp
    """,
    "embedding_centroid": f"""
        SELECT label, CAST(dim - 1 AS INTEGER) AS dim,
               {_sql_micro_mean('x', 6)} AS centroid
        FROM (
            SELECT label,
                   unnest(CAST(embedding AS DOUBLE[])) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        ) GROUP BY label, dim
    """,
    # same snapshot salts and decimal-exact means as the Spark plan;
    # delta and flag computed from the ROUNDED means so both engines
    # difference identical doubles.
    "embedding_drift": f"""
        WITH e AS (
            SELECT ({{mut}} < 500) AS rev,
                   ({{snap_a}} < 9000) AS in_prev,
                   ({{snap_b}} < 9000) AS in_cur,
                   unnest(CAST(embedding AS DOUBLE[])) AS x,
                   CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim
            FROM embeddings
        ), p AS (
            SELECT dim, CAST(COUNT(*) AS BIGINT) AS prev_n,
                   {_sql_micro_mean('x', 6)} AS prev_mean
            FROM e WHERE in_prev GROUP BY dim
        ), c AS (
            SELECT dim, CAST(COUNT(*) AS BIGINT) AS cur_n,
                   {_sql_micro_mean(
                       f"CASE WHEN rev AND dim < {DRIFT_MUT_DIMS}"
                       f" THEN x + {DRIFT_MUT_SHIFT} ELSE x END",
                       6,
                   )} AS cur_mean
            FROM e WHERE in_cur GROUP BY dim
        )
        SELECT COALESCE(p.dim, c.dim) AS dim, prev_n, cur_n,
               prev_mean, cur_mean,
               {sql_stable_round('cur_mean - prev_mean', 6)} AS delta,
               CAST(ABS({sql_stable_round('cur_mean - prev_mean', 6)})
                    >= {DRIFT_EPS} AS INTEGER) AS drift_flag
        FROM p FULL OUTER JOIN c ON p.dim = c.dim
    """.format(
        mut=_sampling_hash_bp_sql("vec_id", "mut:"),
        snap_a=_sampling_hash_bp_sql("vec_id", "snapA:"),
        snap_b=_sampling_hash_bp_sql("vec_id", "snapB:"),
    ),
    # Mirrors the banded semantics exactly: same frozen planes, same 48-bit
    # sign signature, same band split — candidates via DISTINCT (set-
    # identical to Spark's first-agreeing-band emission), then the same
    # exact-cosine verify. Correctness therefore never depends on the
    # LSH S-curve.
    "embedding_neardup": f"""
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), planes AS (
            SELECT p, w FROM (VALUES {", ".join(f"({p}, [{', '.join(_sql_double(w) for w in row)}])" for p, row in enumerate(_NEARDUP_PLANES))}) t(p, w)
        ), sigs AS (
            SELECT vec_id, label,
                   CAST(SUM(CASE WHEN list_dot_product(e.v, planes.w) >= 0
                                 THEN CAST(1 AS BIGINT) << CAST(p AS INTEGER)
                                 ELSE 0 END) AS BIGINT) AS sig
            FROM e CROSS JOIN planes GROUP BY vec_id, label
        ), bands AS (
            SELECT vec_id, label, j AS band_id,
                   (sig >> CAST(j * {NEARDUP_R} AS INTEGER)) & {(1 << NEARDUP_R) - 1} AS band_val
            FROM sigs, range(0, {NEARDUP_BANDS}) t(j)
        ), cands AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label
            FROM bands a JOIN bands b
              ON a.label = b.label AND a.band_id = b.band_id
             AND a.band_val = b.band_val AND a.vec_id < b.vec_id
        )
        SELECT c.vec_a, c.vec_b, c.label,
               (FLOOR((list_dot_product(ea.v, eb.v)
                     / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))) * 10000.0 + 0.5) / 10000.0) AS cos_sim
        FROM cands c
        JOIN e ea ON ea.vec_id = c.vec_a
        JOIN e eb ON eb.vec_id = c.vec_b
        WHERE (FLOOR((list_dot_product(ea.v, eb.v)
                    / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))) * 10000.0 + 0.5) / 10000.0) >= 0.4
    """,
}
