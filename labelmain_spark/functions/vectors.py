"""Vector / embedding operators (SURVEY.md §2.11 north-star):
brute-force cosine top-k, LSH-bucketed ANN, centroid aggregation,
embedding-cosine near-dup.

Scale design:

- Brute-force top-k against one query vector is a narrow map + TakeOrdered
  — it scales fine (one pass, no shuffle) and is the correctness
  baseline every ANN variant is scored against.
- The ANN path (`ann_lsh_topk`) buckets vectors by random-hyperplane
  signs (SimHash for vectors): at 100 TB the scan prunes to matching
  buckets only — the probe cost drops by ~2^bits — at a recall cost
  measured against the brute-force baseline in tests.
- All dot products run on DOUBLE arrays with `zip_with` +
  `aggregate` — JVM-side, sequential fold, engine-reproducible (the
  DuckDB twin uses list_dot_product over the same doubles).
- Centroids: posexplode to (label, dim, component) and aggregate
  exactly — long format, no nested output, shuffle keyed on
  (label, dim) which is perfectly uniform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.operators.parity import (
    davg,
    sql_davg,
    sql_stable_round,
    stable_round,
)
from labelmain_spark.sources.readers import load_table

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


def embedding_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long format: (label, dim, exact mean)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
        )
        .groupBy("label", "dim")
        .agg(stable_round(davg("x"), 6).alias("centroid"))
    )


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a label block:
    cosine above threshold → same-content candidates. The fixture embeddings are not true duplicates, so the threshold is set to the top of the fixture similarity distribution (max within-label cos ≈ 0.47); production near-dup would use ~0.95+."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("vec_a"), "label", F.col("v").alias("va"))
    b = e.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"), F.col("v").alias("vb")
    )
    cos = stable_round(cosine(F.col("va"), F.col("vb")), 4)
    return (
        a.join(
            b,
            (F.col("label") == F.col("label_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .select("vec_a", "vec_b", "label", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.4)
    )


N_PLANES = 8


def _plane(dim: int, p: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    a fixed LCG on (dim, p) — reproducible everywhere, no RNG state."""
    x = (dim * 1103515245 + p * 12345 + 42) % 2147483647
    return (x / 2147483647.0) * 2.0 - 1.0


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN variant of `similarity_topk`: random-hyperplane LSH bucket
    (8-bit sign signature), probe only the query's bucket, exact cosine
    within it. Recall vs brute force is measured in tests.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))

    def signature(v: Column) -> Column:
        sig = F.lit(0).cast("long")
        for p in range(N_PLANES):
            plane = F.array(*[F.lit(_plane(d, p)) for d in range(64)])
            bit = F.when(_dot(v, plane) >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            sig = sig.bitwiseOR(F.shiftleft(bit, p))
        return sig

    sigd = e.select("vec_id", "v", signature(F.col("v")).alias("sig"))
    q = sigd.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("q"), F.col("sig").alias("qsig")
    )
    return (
        sigd.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .filter(F.col("sig") == F.col("qsig"))
        .select("vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


IVF_K = 16  # coarse-quantizer cells; ~sqrt(N) at real scale
IVF_NPROBE = 4


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means coarse quantizer (MLlib KMeans, fixed seed) →
    every vector assigned to its nearest cell → probe the `IVF_NPROBE`
    cells nearest the query with exact cosine inside them.

    Scale shape: the quantizer trains on a sample (here: all rows —
    fixture-sized), the centroid set is tiny and broadcast with the
    assignment model, so assignment is a narrow map; the probe filters
    the scan to nprobe/k of the corpus BEFORE any scoring. Persisting
    the corpus partitioned by `cell` (see labelstore.layout) turns the
    probe into partition pruning — the IVF inverted list, literally.
    Cell-size skew is the known hazard (popular cells → straggler
    tasks); mitigated by AQE skew splitting or splitting fat cells into
    sub-cells (IVF-HNSW hybrids do the same).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    emb = load_table(spark, sf_dir, "embeddings")
    # L2-normalize before clustering: on unit vectors, L2 k-means is
    # spherical k-means, so cell assignment agrees with the cosine
    # metric the probe ranks by (unnormalized cells cut across cosine
    # neighborhoods; recall@10 with nprobe=4: 1.0 at sf0.001, 0.6 at
    # sf0.01 on the near-random fixture vectors).
    e = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn(
        "fv", array_to_vector(F.transform("v", lambda x: x / _norm(F.col("v"))))
    )

    # k scales with corpus size (~N/60, capped): 16 cells over a
    # 500-vector fixture would leave ~30 vectors/cell — quantization
    # noise swamps the structure and recall collapses. At real scale
    # k ≈ sqrt(N) with a sampled fit, and N/k stays in the thousands.
    n = e.count()
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
    return (
        assigned.filter(F.col("cell").isin(probe) & (F.col("vec_id") != QUERY_VEC_ID))
        .crossJoin(F.broadcast(q))
        .select("vec_id", stable_round(cosine(F.col("v"), F.col("q")), 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
    )


QUERIES = {
    "similarity_topk": similarity_topk,
    "embedding_centroid": embedding_centroid,
    "embedding_neardup": embedding_neardup,
    "ann_lsh_topk": ann_lsh_topk,  # rows-only: LSH plane constants are impractical to inline in SQL
    "ann_ivf_topk": ann_ivf_topk,  # rows-only: k-means quantizer has no SQL twin
}

ORACLE = {
    "similarity_topk": f"""
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
    """,
    "embedding_centroid": f"""
        SELECT label, CAST(dim - 1 AS INTEGER) AS dim,
               {sql_stable_round(sql_davg('x'), 6)} AS centroid
        FROM (
            SELECT label,
                   unnest(CAST(embedding AS DOUBLE[])) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        ) GROUP BY label, dim
    """,
    "embedding_neardup": """
        WITH e AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               (FLOOR((list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 10000.0 + 0.5) / 10000.0) AS cos_sim
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE (FLOOR((list_dot_product(a.v, b.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))) * 10000.0 + 0.5) / 10000.0) >= 0.4
    """,
}
