"""URL / domain extraction + per-domain corpus stats (SURVEY.md §2.11
north-star: the C4 / RefinedWeb-style per-domain accounting every web
corpus runs — which domains dominate the corpus, how long their docs
are — driving domain-level filtering and mixing weights).

Shape at 100 TB: URL extraction is a narrow JVM-side regexp map stage;
the per-domain rollup is one partial-agg shuffle keyed by domain.
Domain keys are Zipf-skewed on real crawls (a wikipedia.org key can be
1e9 rows), but both aggregates here (count, sum) are algebraic, so
map-side partial aggregation collapses each domain to one row per
upstream partition before the exchange — the hot key receives
O(partitions) partial rows, never the raw postings.

Fixture note: the synthetic corpus contains no URLs, so the query
INJECTS deterministic URLs keyed by ``doc_id`` with the identical
expression in Spark and DuckDB (same pattern as functions/pii.py),
yielding docs with 0, 1 or 2 URLs and a Zipf-ish domain histogram via
the mod-7 site index. Regexes restricted to the Java/RE2 common
dialect (no lookaround, no backreferences).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

URL_RE = r"https?://[A-Za-z0-9.-]+(/[A-Za-z0-9/._-]*)?"
DOMAIN_RE = r"https?://([A-Za-z0-9.-]+)"


def _augmented() -> Column:
    """text + deterministic URL spans keyed by doc_id (SQL twin below)."""
    sid = F.col("doc_id").cast("string")
    site = (F.col("doc_id") % 7).cast("string")
    mirror = (F.col("doc_id") % 3).cast("string")
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.lit(" see https://site"), site, F.lit(".example.com/p/"), sid
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" via http://m"), mirror, F.lit(".example.org/idx"),
            ),
        ).otherwise(F.lit("")),
    )


_SQL_AUG = """
    text
    || CASE WHEN doc_id % 2 = 0
            THEN ' see https://site' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.com/p/' || CAST(doc_id AS VARCHAR)
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' via http://m' || CAST(doc_id % 3 AS VARCHAR)
                 || '.example.org/idx'
            ELSE '' END
"""


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain rollup: URL mentions, distinct docs, total doc chars.

    explode(regexp_extract_all) → one row per URL mention → domain via
    a single capture group → algebraic rollup. ``n_docs`` is a distinct
    count, which Spark runs as the standard two-phase expand (partial
    per (domain, doc_id), then final per domain) — still skew-safe
    because a domain's distinct docs are bounded by its postings."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(
        "doc_id",
        "n_chars",
        F.explode(F.regexp_extract_all(_augmented(), F.lit(URL_RE), 0)).alias("url"),
    )
    return (
        urls.select(
            "doc_id",
            "n_chars",
            F.regexp_extract("url", DOMAIN_RE, 1).alias("domain"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


QUERIES = {"domain_stats": domain_stats}

ORACLE = {
    "domain_stats": f"""
        WITH urls AS (
            SELECT doc_id, n_chars,
                   unnest(regexp_extract_all({_SQL_AUG}, '{URL_RE}')) AS url
            FROM documents
        )
        SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM urls GROUP BY 1
    """,
}
