"""Scale trend for the embedding-family heavyweights: semantic_dedup's
cluster-then-pairwise structure and knn_join's brute top-k, Spark vs
DuckDB on seeded gaussian corpora of growing size.

The registry keys are pinned to the sf fixtures (2 000 vectors, k=16
frozen centroids) for oracle checkability; THIS script runs the same
plan shapes with k scaled ∝ N (the paper's deployment rule — cluster
size stays ~N/k) so the measured trend reflects how the operator is
actually run at scale, not a fixed-k blowup neither engine would ship.

Usage: python scripts/vec_scale.py  → one JSON line per (op, N).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
# r7: extended past the x10 class — override with VEC_SIZES=...; the
# x100-class row (200k vectors vs the 2k registry fixture) is what the
# r6 verdict's task 2 demands.
SIZES = [int(x) for x in os.environ.get("VEC_SIZES", "2000,8000,20000").split(",")]
TARGET_CLUSTER = 125  # k = N / TARGET_CLUSTER
KNN_Q_FRac = 100  # queries = N / 100
THRESH = 0.4


def make_corpus(n: int, path: str) -> None:
    rng = np.random.RandomState(7)
    v = rng.standard_normal((n, DIM)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
            "label": pa.array([i % 5 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, path, row_group_size=16384)


def centroids(k: int) -> list[list[float]]:
    rng = np.random.RandomState(5)
    return [[float(x) for x in r] for r in rng.standard_normal((k, DIM))]


def spark_semantic(spark, path: str, cents) -> float:
    """Runs the SHIPPED plan — ``semantic_dedup_plan`` with k ∝ N
    centroids (r6: the registry key and this harness share one code
    path, so the measured trend is the trend of the code users run)."""
    from pyspark.sql import functions as F

    from labelmain_spark.functions.vectors import semantic_dedup_plan

    t0 = time.time()
    e = spark.read.parquet(path).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = (
        semantic_dedup_plan(spark, e, cents)
        .filter(~F.col("removed"))
        .count()
    )
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt, n


def duck_semantic(path: str, cents) -> float:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    if len(cents) > 300:
        # k ∝ N makes the inline-literal form unparseable past the x10
        # class (1600 centroids × 64 floats ≈ 1.6 MB of SQL): register
        # the centroids as a table and pick each vector's argmax
        # cluster by rank (sim DESC, cluster ASC = first-max, the
        # list_position tie rule) — numerically identical: same
        # round(dot/(|v|·|c|), 6) similarity.
        import pandas as pd  # noqa: F401 — duckdb reads the frame by name

        cent_df = pd.DataFrame(
            {
                "cluster": range(len(cents)),
                "cv": [list(map(float, c)) for c in cents],
                "cnorm": [math.sqrt(sum(x * x for x in c)) for c in cents],
            }
        )
        con.register("centroids", cent_df)
        sql = f"""
            WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
            en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) vn FROM e),
            sims AS (
                SELECT en.vec_id,
                       c.cluster,
                       round(list_dot_product(en.v, c.cv) / (en.vn * c.cnorm), 6) AS sim
                FROM en CROSS JOIN centroids c
            ),
            pick AS (
                SELECT vec_id, CAST(cluster AS INTEGER) AS cluster, sim AS c2c
                FROM (
                    SELECT vec_id, cluster, sim,
                           ROW_NUMBER() OVER (
                               PARTITION BY vec_id ORDER BY sim DESC, cluster ASC
                           ) AS rn
                    FROM sims
                ) WHERE rn = 1
            ),
            a AS (
                SELECT en.vec_id, list_transform(en.v, x -> x / en.vn) AS nv,
                       p.cluster, p.c2c
                FROM en JOIN pick p ON en.vec_id = p.vec_id
            ),
            rm AS (SELECT DISTINCT y.vec_id FROM a x JOIN a y
                   ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
                   WHERE round(list_dot_product(x.nv, y.nv), 4) >= {THRESH}
                     AND (x.c2c < y.c2c OR (x.c2c = y.c2c AND x.vec_id < y.vec_id)))
            SELECT COUNT(*) FROM a WHERE vec_id NOT IN (SELECT vec_id FROM rm)
        """
        t0 = time.time()
        n = con.execute(sql).fetchone()[0]
        return time.time() - t0, n
    sims = "[" + ", ".join(
        f"round(list_dot_product(v, {c}) / (vn * {math.sqrt(sum(x * x for x in c))!r}), 6)"
        for c in cents
    ) + "]"
    sql = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
        en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) vn FROM e),
        s AS (SELECT vec_id, v, vn, {sims} cl_sims FROM en),
        a AS (SELECT vec_id, list_transform(v, x -> x / vn) AS nv,
                     CAST(list_position(cl_sims, list_max(cl_sims)) - 1 AS INTEGER) AS cluster,
                     list_max(cl_sims) AS c2c FROM s),
        rm AS (SELECT DISTINCT y.vec_id FROM a x JOIN a y
               ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
               WHERE round(list_dot_product(x.nv, y.nv), 4) >= {THRESH}
                 AND (x.c2c < y.c2c OR (x.c2c = y.c2c AND x.vec_id < y.vec_id)))
        SELECT COUNT(*) FROM a WHERE vec_id NOT IN (SELECT vec_id FROM rm)
    """
    t0 = time.time()
    n = con.execute(sql).fetchone()[0]
    return time.time() - t0, n


def main() -> None:
    from labelmain_spark.session import build_session

    spark = build_session("vec_scale")
    out = []
    with tempfile.TemporaryDirectory() as tmp:
        # warm the session (JVM codegen + Arrow python workers) on the
        # smallest corpus so the first measured row isn't startup cost
        wpath = os.path.join(tmp, "warmup.parquet")
        make_corpus(SIZES[0], wpath)
        spark_semantic(spark, wpath, centroids(16))
        for n in SIZES:
            path = os.path.join(tmp, f"emb_{n}.parquet")
            make_corpus(n, path)
            k = max(16, n // TARGET_CLUSTER)
            cents = centroids(k)
            ds, ns = spark_semantic(spark, path, cents)
            dd, nd = duck_semantic(path, cents)
            row = {
                "op": "semantic_dedup", "n": n, "k": k,
                "spark_sec": round(ds, 2), "duck_sec": round(dd, 2),
                "ratio": round(ds / dd, 2),
                "kept_spark": ns, "kept_duck": nd,
            }
            print(json.dumps(row), flush=True)
            out.append(row)

            # knn_join over the same corpus — the SHIPPED registry key
            # (queries Q = N/KNN_Q_MOD by the key's own % rule) vs its
            # registry oracle on the identical parquet.
            kdir = os.path.join(tmp, f"knn_{n}")
            os.makedirs(kdir, exist_ok=True)
            os.replace(path, os.path.join(kdir, "embeddings.parquet"))
            ds, ns = spark_knn(spark, kdir)
            dd, nd = duck_knn(os.path.join(kdir, "embeddings.parquet"))
            row = {
                "op": "knn_join", "n": n,
                "spark_sec": round(ds, 2), "duck_sec": round(dd, 2),
                "ratio": round(ds / dd, 2),
                "rows_spark": ns, "rows_duck": nd,
            }
            print(json.dumps(row), flush=True)
            out.append(row)
    spark.stop()


def spark_knn(spark, sf_dir: str):
    from labelmain_spark.functions.vectors import knn_join

    t0 = time.time()
    n = knn_join(spark, sf_dir).count()
    dt = time.time() - t0
    spark.catalog.clearCache()
    return dt, n


def duck_knn(path: str):
    from labelmain_spark import registry

    sql = registry.oracle_sql()["knn_join"]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    t0 = time.time()
    rows = con.execute(sql).fetchall()
    return time.time() - t0, len(rows)


if __name__ == "__main__":
    main()
