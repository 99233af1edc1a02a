"""PII detection / redaction for the training-data pipeline (SURVEY.md
§2.11 north-star: the scrub pass every public LLM corpus recipe — C4,
RefinedWeb, Dolma — runs before training).

The scrubber is pure JVM-side regexp_replace / regexp_extract_all
column expressions — narrow, no shuffle, linear in corpus bytes, inside
whole-stage codegen. At 100 TB this is a map-only stage that scales
with executors; the only cost is the regex automaton per row.

Fixture note: the synthetic `documents` corpus contains no PII, so the
query INJECTS deterministic spans (an email / IPv4 / phone derived from
``doc_id``) with the identical expression in Spark and the DuckDB
oracle, then scrubs them. The redaction path is thereby exercised on
real matches and on the no-match path (docs whose id selects no
injection) and the oracle hash checks the full redacted text.

Regex dialect parity: patterns restricted to the syntax Java
``java.util.regex`` and DuckDB (RE2) evaluate identically — character
classes, bounded quantifiers, and ``\\b`` word boundaries; no
backreferences or lookaround (RE2 has neither).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from labelmain_spark.sources.readers import load_table

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{4}\b"


def _augmented() -> Column:
    """text + deterministic PII spans keyed by doc_id (SQL twin below)."""
    sid = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" reach user"), sid, F.lit("@mail.example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )


_SQL_AUG = """
    text
    || CASE WHEN doc_id % 3 = 0
            THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
            ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
"""


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count and redact emails / IPv4 addresses / phone numbers.

    Counts are taken on the raw (augmented) text; redaction applies the
    three replacements in a fixed order (email → ip → phone) so the
    output is deterministic even if classes could ever overlap."""
    docs = load_table(spark, sf_dir, "documents")
    aug = _augmented()
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), IP_RE, "<IP>"
        ),
        PHONE_RE,
        "<PHONE>",
    )

    def _n(pat: str) -> Column:
        return F.size(F.regexp_extract_all(aug, F.lit(pat), 0))

    return docs.select(
        "doc_id",
        _n(EMAIL_RE).alias("n_emails"),
        _n(IP_RE).alias("n_ips"),
        _n(PHONE_RE).alias("n_phones"),
        (_n(EMAIL_RE) + _n(IP_RE) + _n(PHONE_RE)).alias("n_pii"),
        red.alias("redacted"),
    )


QUERIES = {"pii_scrub": pii_scrub}

ORACLE = {
    "pii_scrub": f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(aug, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
               CAST(len(regexp_extract_all(aug, '{IP_RE}')) AS INTEGER) AS n_ips,
               CAST(len(regexp_extract_all(aug, '{PHONE_RE}')) AS INTEGER) AS n_phones,
               CAST(len(regexp_extract_all(aug, '{EMAIL_RE}'))
                  + len(regexp_extract_all(aug, '{IP_RE}'))
                  + len(regexp_extract_all(aug, '{PHONE_RE}')) AS INTEGER) AS n_pii,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(aug, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{IP_RE}', '<IP>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM (SELECT doc_id, {_SQL_AUG} AS aug FROM documents)
    """,
}
