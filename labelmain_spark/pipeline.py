"""The training-data pipeline as ONE composed plan — the integration
showpiece: every stage is an operator family from this repo, chained
declaratively so Catalyst plans the whole thing end-to-end (filter
pushdown through the dedup window, one scan, no materialization
between stages).

Stages (each individually oracle-checked elsewhere):
1. quality gate   — stopword-ratio/length scoring (functions/text.py)
2. exact dedup    — keep min-doc_id survivor per content hash
                    (functions/dedup.py semantics, window form so it
                    composes without a join back)
3. deterministic sample — hash-mod basis points (functions/sampling.py)
4. corpus stats   — per-language counts + exact mean token estimate

At 100 TB: one columnar scan, one window shuffle on the content hash,
one final small aggregation — the minimum possible for these
semantics. A pipeline built by materializing each stage to storage
would scan the corpus four times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from labelmain_spark.functions.sampling import _hash_bp_expr
from labelmain_spark.operators.parity import davg, sql_davg, sql_stable_round, stable_round
from labelmain_spark.sources.readers import load_table

MIN_QUALITY = 0.2
SAMPLE_BP = 5000  # keep 50% of surviving keyspace


def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    sw = F.array(*[F.lit(s) for s in ("the", "a", "of", "and", "to")])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    quality = F.least(F.lit(1.0), n_tok / F.lit(100.0)) * (
        F.lit(1.0) - n_sw.cast("double") / n_tok
    )

    staged = docs.select(
        "doc_id", "lang", "n_chars", "text", quality.alias("q")
    ).filter(F.col("q") >= MIN_QUALITY)

    h = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    w = W.partitionBy(h).orderBy("doc_id")
    survivors = (
        staged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "text")
    )

    sampled = survivors.filter(F.expr(_hash_bp_expr("doc_id", "spark")) < SAMPLE_BP)

    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        stable_round(davg(F.ceil(F.col("n_chars") / 4).cast("double")), 4).alias(
            "avg_est_tokens"
        ),
    )


QUERIES = {"pipeline_e2e": pipeline_e2e}

ORACLE = {
    "pipeline_e2e": f"""
        WITH scored AS (
            SELECT doc_id, lang, n_chars, text,
                   LEAST(1.0, len(string_split(text, ' ')) / 100.0)
                   * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                              t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
                          / len(string_split(text, ' '))) AS q
            FROM documents
        ), gated AS (
            SELECT * FROM scored WHERE q >= {MIN_QUALITY}
        ), survivors AS (
            SELECT doc_id, lang, n_chars FROM (
                SELECT doc_id, lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY sha256(lower(trim(text)))
                                          ORDER BY doc_id) AS rn
                FROM gated
            ) WHERE rn = 1
        ), sampled AS (
            SELECT * FROM survivors
            WHERE {_hash_bp_expr("doc_id", "duck")} < {SAMPLE_BP}
        )
        SELECT lang, COUNT(*) AS n_docs,
               {sql_stable_round(sql_davg("CAST(ceil(n_chars / 4.0) AS DOUBLE)"), 4)}
                   AS avg_est_tokens
        FROM sampled GROUP BY lang
    """,
}
