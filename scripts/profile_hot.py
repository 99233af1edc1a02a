"""Profile the bench-flagged queries (dedup_minhash, join_range) stage
by stage at sf0.1 to separate real plan cost from box contention."""

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
    print(f"{label:35s} {time.time()-t0:6.2f}s  {out}")
    return out


def main():
    spark = build_session(app_name="profile_hot")
    spark.read.parquet(f"{SF}/lineitem.parquet").count()  # warm

    from pyspark.sql import functions as F

    from labelmain_spark.functions import dedup
    from labelmain_spark.operators import joins
    from labelmain_spark.sources.readers import load_table

    # ---- join_range, 3 runs
    for i in range(3):
        t(f"join_range run{i}", lambda: joins.join_range(spark, SF).count())

    # ---- dedup_minhash end-to-end, cold cache
    spark.catalog.clearCache()
    for i in range(3):
        spark.catalog.clearCache()
        t(f"dedup_minhash run{i} (cold cache)", lambda: dedup.dedup_minhash(spark, SF).count())

    # ---- stage decomposition (cold)
    spark.catalog.clearCache()
    n_docs = t("n_docs count", lambda: load_table(spark, SF, "documents").count())
    e = None

    def build_e():
        nonlocal e
        e = dedup._exploded_shingles(spark, SF)
        return e.count()

    t("exploded shingles + persist+count", build_e)
    ep = dedup._pruned_index(e, dedup._max_df(n_docs))
    t("pruned index count", lambda: ep.count())
    sig = dedup.minhash_signatures(ep)
    t("signatures count", lambda: sig.count())

    rows_per_band = dedup.MINHASH_K // dedup.BANDS
    band_cols = []
    for b in range(dedup.BANDS):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.concat(*cols).alias("sig")))
    bands = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )
    a, b2 = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    t("candidates count", lambda: cand.count())
    t("pair jaccard + filter", lambda: dedup._pair_jaccard(e, cand).filter(F.col("jaccard") >= dedup.JACCARD_THRESHOLD).count())

    spark.stop()


if __name__ == "__main__":
    main()
