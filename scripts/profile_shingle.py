"""Micro-profile of the shingle materialization path."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from labelmain_spark.session import build_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label:45s} {time.time()-t0:6.2f}s  {out}")
    return out


def main():
    spark = build_session(app_name="profile_shingle")
    spark.read.parquet(f"{SF}/lineitem.parquet").count()  # warm

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from labelmain_spark.functions import dedup
    from labelmain_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    n = spark.sparkContext.defaultParallelism

    t("raw docs count", lambda: docs.count())
    split_rep = docs.select("doc_id", F.split(F.col("text"), " ").alias("t")).repartition(n)
    t("split+repartition count", lambda: split_rep.count())
    sh = split_rep.select("doc_id", dedup._shingles_from_tokens(F.col("t")).alias("shingles"))
    t("shingle arrays count", lambda: sh.count())
    ex = sh.select("doc_id", F.explode_outer("shingles").alias("s"))
    t("exploded count", lambda: ex.count())
    ex2 = ex.repartition(n, F.col("doc_id"))
    t("exploded+repart count", lambda: ex2.count())
    p = ex2.persist(StorageLevel.MEMORY_AND_DISK)
    t("persist+count", lambda: p.count())
    t("re-count cached", lambda: p.count())
    p.unpersist()

    # candidate alternative: ONE repartition of raw docs by doc_id,
    # shingle on the reduce side
    raw = docs.select("doc_id", "text").repartition(n, F.col("doc_id"))
    tok = raw.select("doc_id", F.split(F.col("text"), " ").alias("t"))
    sh2 = tok.select("doc_id", dedup._shingles_from_tokens(F.col("t")).alias("shingles"))
    ex3 = sh2.select("doc_id", F.explode_outer("shingles").alias("s"))
    t("ALT single-repart exploded count", lambda: ex3.count())
    p2 = ex3.persist(StorageLevel.MEMORY_AND_DISK)
    t("ALT persist+count", lambda: p2.count())
    p2.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
