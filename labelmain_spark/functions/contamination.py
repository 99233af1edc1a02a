"""Benchmark-contamination check — the decontamination pass every
LLM training pipeline runs before trusting an eval number (GPT-3
appendix C / PaLM style): an eval document is contaminated when a high
fraction of its n-grams also occur anywhere in the training corpus.

Here the held-out "benchmark" is the deterministic hash split of the
documents table (same portable md5-basis-point predicate as
functions/sampling.py, so the split itself is reproducible in the
oracle), train = everything else, n-grams = the word-3-gram shingles
shared with the dedup family.

Scale shape (the only viable one at 100 TB):
- shingles come from the ONE persisted exploded-shingle table the
  dedup diamond already materializes — zero extra shingling;
- the train n-gram set is `distinct` over postings (shuffle keyed by
  shingle — uniform, boilerplate hotness collapses in the partial
  aggregate);
- membership is a LEFT SEMI join on the shingle key — no counters, no
  arrays, the probe set never materializes per pair;
- per-eval-doc totals and hits are two keyed counts.
Nothing is ever quadratic; every shuffle key is a scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.functions.dedup import _exploded_shingles, _sql_shingles
from labelmain_spark.functions.sampling import _hash_bp_expr
from labelmain_spark.operators.parity import sql_stable_round, stable_round

CONTAM_EVAL_BP = 500  # lowest 5% of the doc_id hash keyspace = eval set
CONTAM_THRESHOLD = 0.5  # overlap ratio at/above which a doc is flagged


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per eval-document n-gram overlap against the train corpus:
    (doc_id, n_shingles, n_overlap, overlap_ratio, contaminated)."""
    e = _exploded_shingles(spark, sf_dir)
    is_eval = F.expr(_hash_bp_expr("doc_id", "spark")) < CONTAM_EVAL_BP
    ev = e.filter(is_eval)
    train_sh = e.filter(~is_eval).select("s").distinct()

    totals = ev.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        ev.join(train_sh, "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    n_ov = F.coalesce(F.col("n_overlap"), F.lit(0).cast("long"))
    ratio = stable_round(n_ov.cast("double") / F.col("n_shingles"), 4)
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            n_ov.alias("n_overlap"),
            ratio.alias("overlap_ratio"),
            (ratio >= CONTAM_THRESHOLD).cast("int").alias("contaminated"),
        )
    )


_RATIO_SQL = sql_stable_round(
    "CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / t.n_shingles", 4
)

QUERIES = {"contamination_check": contamination_check}

ORACLE = {
    "contamination_check": f"""
        WITH sh AS (
            SELECT doc_id, {_sql_shingles()} AS shingles FROM documents
        ), e AS (
            SELECT doc_id, unnest(shingles) AS s FROM sh
        ), ev AS (
            SELECT * FROM e WHERE {_hash_bp_expr("doc_id", "duck")} < {CONTAM_EVAL_BP}
        ), tr AS (
            SELECT DISTINCT s FROM e
            WHERE NOT ({_hash_bp_expr("doc_id", "duck")} < {CONTAM_EVAL_BP})
        ), tot AS (
            SELECT doc_id, COUNT(*) AS n_shingles FROM ev GROUP BY doc_id
        ), hit AS (
            SELECT doc_id, COUNT(*) AS n_overlap FROM ev
            WHERE s IN (SELECT s FROM tr) GROUP BY doc_id
        )
        SELECT t.doc_id, t.n_shingles,
               CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
               {_RATIO_SQL} AS overlap_ratio,
               CAST({_RATIO_SQL} >= {CONTAM_THRESHOLD} AS INTEGER) AS contaminated
        FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    """,
}
