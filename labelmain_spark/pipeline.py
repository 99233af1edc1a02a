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


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LLM-corpus pipeline end-to-end, round-4 edition — every
    stage a §2.11 operator, composed as one lazy plan:

    1. boilerplate strip — delete high-df paragraphs, reassemble
       (functions/dedup.py:boilerplate_strip; docs stripped to nothing
       drop out)
    2. exact dedup on the CLEANED text — window form (partition by
       content hash, keep min doc_id) so it composes with no join back
    3. weighted source mixing — per-source hash rate
       (functions/sampling.py semantics, independent salt)
    4. token-budget shard packing — recursive exclusive cumsum
       (functions/packing.py), shard = offset div budget

    Output: one row per surviving doc with its source, token count and
    shard assignment — the manifest write_shards consumes.

    At 100 TB: the paragraph explode is the one corpus-sized
    materialization (shared, persisted); dedup adds one digest-keyed
    window shuffle; mixing is a map-side predicate; packing adds the
    part-keyed window + broadcast offsets. Stages 2-4 all operate on
    (doc_id, digest/«few longs») rows — after stage 1, document text
    appears only in the per-doc reassembled column, never in a join
    payload."""
    from labelmain_spark.functions.dedup import _exploded_paragraphs, boiler_cleaned
    from labelmain_spark.functions.packing import SHARD_TOKENS, exclusive_cumsum
    from labelmain_spark.functions.sampling import _mix_rate_bp

    cleaned = boiler_cleaned(_exploded_paragraphs(spark, sf_dir))
    w = W.partitionBy(F.md5("clean_text")).orderBy("doc_id")
    survivors = (
        cleaned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "clean_text")
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    mixed = (
        survivors.join(src, "doc_id")
        .filter(
            F.expr(_hash_bp_expr("doc_id", "spark", salt="mix:"))
            < F.expr(_mix_rate_bp("spark"))
        )
        .select(
            "doc_id",
            "source",
            F.size(F.split(F.col("clean_text"), " ")).cast("long").alias("n_tokens"),
        )
    )
    packed = exclusive_cumsum(mixed, "doc_id", "n_tokens", "start_offset")
    return packed.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"start_offset div {SHARD_TOKENS}").cast("long").alias("shard_id"),
    )


QUERIES = {"pipeline_e2e": pipeline_e2e, "corpus_pipeline": corpus_pipeline}

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


def _corpus_pipeline_sql() -> str:
    from labelmain_spark.functions.dedup import _SQL_PARAS, BOILER_DF
    from labelmain_spark.functions.packing import SHARD_TOKENS
    from labelmain_spark.functions.sampling import _mix_rate_bp

    return f"""
        {_SQL_PARAS}, hot AS (
            SELECT md5(para) AS h FROM p
            GROUP BY md5(para) HAVING COUNT(DISTINCT doc_id) > {BOILER_DF}
        ), kept AS (
            SELECT doc_id, pos, para FROM p
            WHERE md5(para) NOT IN (SELECT h FROM hot)
        ), cleaned AS (
            SELECT doc_id, string_agg(para, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY doc_id
        ), survivors AS (
            SELECT doc_id, clean_text FROM (
                SELECT doc_id, clean_text,
                       ROW_NUMBER() OVER (
                           PARTITION BY md5(clean_text) ORDER BY doc_id
                       ) AS rn
                FROM cleaned
            ) WHERE rn = 1
        ), mixed AS (
            SELECT s.doc_id, d2.source,
                   len(string_split(s.clean_text, ' ')) AS n_tokens
            FROM survivors s JOIN documents d2 ON d2.doc_id = s.doc_id
            WHERE {_hash_bp_expr("s.doc_id", "duck", salt="mix:")}
                  < {_mix_rate_bp("duck")}
        ), packed AS (
            SELECT doc_id, source, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS so
            FROM mixed
        )
        SELECT doc_id, source,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(so // {SHARD_TOKENS} AS BIGINT) AS shard_id
        FROM packed
    """


ORACLE["corpus_pipeline"] = _corpus_pipeline_sql()
